"""Batch-size re-sweep at the round-5 10M operating point (nlist=4096/np12,
496k QPS @ 0.9003 at B=8192). The B=8192 plateau verdict comes from the 1M
bench at round-4 operating points; at 10M the slab is C=3072-ish rows/probe
deeper and the per-batch bands amortize differently. One build, recall gate
confirmed once, same-run two-pass timing at B in {4096, 8192, 16384}.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/bsweep_10m.py
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    import os as _os
    N, D, K, NPB = 10_000_000, 128, 10, 12
    BS = tuple(int(s) for s in _os.environ.get(
        "BSWEEP_BS", "4096,8192,16384").split(","))
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(max(BS), D, 4096, seed=7)
    qgt = queries[:1024]

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=4096, metric="l2", precision="bf16",
                               calibrate_aps=False, niter=15))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "nlist": idx.nlist(), "C": idx.store.C}), flush=True)

    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(qgt), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    sp = SearchParams(k=K, nprobe=NPB, exact_distances=False)
    r = idx.search(qgt, sp)
    rec = compute_recall(r.ids, gt, K)
    print(json.dumps({"nprobe": NPB, "recall": round(rec, 4)}), flush=True)

    qdev = {b: jnp.asarray(queries[:b]) for b in BS}

    def step_ms(qb):
        last = idx._search_device_full(qb, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            last = idx._search_device_full(qb, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            last = idx._search_device_full(qb, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        return (time.perf_counter() - t0) / reps * 1e3

    for pass_no in (1, 2):
        for b in BS:
            ms = step_ms(qdev[b])
            print(json.dumps({"cfg": f"B{b}_p{pass_no}", "ms": round(ms, 3),
                              "qps": round(b / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
