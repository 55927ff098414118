"""Same-run A/B deciding the bench_10m_b24576 discrepancy: the bsweep_10m_b
sweep measured 715.3k QPS at (B=24576, np12) while the run_10m certification
measured 359.7k at (B=24576, np13) in a different run. Candidate causes:
(a) cross-run tunnel variance (documented ~40%), or (b) a real cost cliff
between np12 and np13 at B=24576 (the grouped path's pair count crosses a
bucket boundary: 294,912 -> 319,488 pairs).

One build, recall gated on 1024 GT queries, then two interleaved passes over
{(16384, np12), (24576, np12), (24576, np13)} — pass 2 decides.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/tenm_np_ab.py
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K = 10_000_000, 128, 10
    GRID = ((16384, 12), (24576, 12), (24576, 13))
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(24576, D, 4096, seed=7)

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=4096, metric="l2", precision="bf16",
                               calibrate_aps=False, niter=15))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "nlist": idx.nlist(), "C": idx.store.C}), flush=True)

    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(queries[:1024]),
                          K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    for nprobe in (12, 13):
        sp = SearchParams(k=K, nprobe=nprobe, exact_distances=False)
        r = idx.search(queries[:1024], sp)
        print(json.dumps({"nprobe": nprobe,
                          "recall": round(compute_recall(r.ids, gt, K), 4)}),
              flush=True)

    qdev = {b: jnp.asarray(queries[:b]) for b in {g[0] for g in GRID}}

    def step_ms(qb, sp):
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

    sps = {np_: SearchParams(k=K, nprobe=np_, exact_distances=False)
           for np_ in {g[1] for g in GRID}}
    for pass_no in (1, 2):
        for b, np_ in GRID:
            ms = step_ms(qdev[b], sps[np_])
            print(json.dumps({"cfg": f"B{b}_np{np_}_p{pass_no}",
                              "ms": round(ms, 3),
                              "qps": round(b / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
