"""Coarsening at 10M scale: nlist=1024 vs the bench_10m point (2050/np20).

The round-4 coarsening law (pair-proportional bands dominate; sweep4/6)
was only applied at 1M. bench_10m serves nlist=2050/np20 @ 0.912 =
353.4k QPS; at ~equal scan fraction nlist=1024 needs np~10-11 and halves
every pair band. One build (the 10M build is ~17 min), recall curve,
two-pass timing at the >=0.90 gate. Cross-run comparison to bench_10m
carries tunnel variance — treat >20% deltas as signal.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/sweep_10m_coarse.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K, B = 10_000_000, 128, 10, 8192
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B, D, 4096, seed=7)
    qgt = queries[:1024]

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=1024, metric="l2", precision="bf16",
                               calibrate_aps=False, niter=15))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "nlist": idx.nlist(), "C": idx.store.C,
                      "kernel": idx._grouped_kernel()}), flush=True)

    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(qgt), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    # NB: GT from the bf16 store (the 10M f32 corpus doesn't fit HBM twice);
    # bench_10m judges the same way.

    chosen = None
    for npb in (8, 9, 10, 11, 12, 14, 16):
        r = idx.search(qgt, SearchParams(k=K, nprobe=npb,
                                         exact_distances=False))
        rec = compute_recall(r.ids, gt, K)
        print(json.dumps({"nprobe": npb, "recall": round(rec, 4)}),
              flush=True)
        if rec >= 0.90 and chosen is None:
            chosen = (npb, rec)
        if rec >= 0.93:
            break
    if chosen is None:
        chosen = (16, rec)

    q8 = jnp.asarray(queries[:B])
    npb, rec = chosen
    sp = SearchParams(k=K, nprobe=npb, exact_distances=False)

    def step_ms():
        last = idx._search_device_full(q8, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            last = idx._search_device_full(q8, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            last = idx._search_device_full(q8, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        return (time.perf_counter() - t0) / reps * 1e3

    for pass_no in (1, 2):
        ms = step_ms()
        print(json.dumps({"cfg": f"coarse10m_p{pass_no}", "nprobe": npb,
                          "recall": round(rec, 4), "ms": round(ms, 3),
                          "qps": round(B / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
