"""Batch-size re-sweep at the round-5 operating point (nlist=160/np9).
The "B=8192 plateau / B=16384 regresses" verdict is round-4 vintage,
measured at nlist=256/np12 — the grouping/scatter/merge bands scale with
n = B*nprobe, and np dropped 12 -> 9 since, so the regression point may
have moved. One build, recall gate confirmed once (B-independent), then
same-run two-pass timing at B in {4096, 8192, 12288, 16384}; QPS = B/ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/bsweep_160.py
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
    from quake_tpu.ops.scan import flat_scan
    from quake_tpu.utils import compute_recall

    import os as _os
    N, D, K, NPB = 1_000_000, 128, 10, 9
    BS = tuple(int(s) for s in _os.environ.get(
        "BSWEEP_BS", "4096,8192,12288,16384").split(","))
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(max(BS), D, 4096, seed=7)
    qgt = queries[:1024]

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(metric="l2", precision="bf16", nlist=160,
                               calibrate_aps=False, niter=25))
    print(json.dumps({"built": "flat_160", "s": round(time.perf_counter() - t0),
                      "C": idx.store.C}), flush=True)

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
