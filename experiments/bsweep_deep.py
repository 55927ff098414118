"""Same-run batch sweep for the DEEP-like suite config under the v11
argsort-overflow default (10M x 96 unit-norm IP, bf16, nlist=2048).

The round-5 knee reading (B=24576, with 32768 regressing -21%,
deep_b32768.out) was measured while 10M shapes rode the v10 row-scatter
epilogue; tenm_cliff showed the regression is the scatter's, not the
batch's (B=32768 grouped 65.7 -> 33.5 ms under argsort placement on the
128-d store). One build, two interleaved passes over B in {24576, 32768}
for BOTH the APS-auto (recall_target=0.9, dense calibrated-prefix program)
and the fixed-nprobe equal-recall anchor. Pass 2 decides run_deep's B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/bsweep_deep.py
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench_suite import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K = 10_000_000, 96, 10
    BS = [int(b) for b in os.environ.get("BSWEEP_BS", "24576,32768").split(",")]
    Bmax = max(BS)
    x = make_manifold(N, D, 4096, seed=2)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    queries = make_manifold(Bmax, D, 4096, seed=3)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=2048, metric="ip", precision="bf16",
                               niter=15, calibrate_aps=True))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "nlist": idx.nlist(), "C": idx.store.C}), flush=True)

    state = idx.store.state
    q1k = jnp.asarray(queries[:1024])
    _, gt32 = flat_search(state.codes, state.ids, q1k, K, "ip")
    gt = np.asarray(gt32).astype(np.int64)

    sp_aps = SearchParams(k=K, recall_target=0.9, exact_distances=False)
    res = idx.search(queries[:1024], sp_aps)
    print(json.dumps({"aps_recall": round(compute_recall(res.ids, gt, K), 4),
                      "scanned": int(res.timing_info.partitions_scanned)}),
          flush=True)
    anchor_np, anchor_recall = idx.nlist(), 0.0
    for nprobe in (8, 10, 12, 16, 24, 32):
        r = idx.search(queries[:1024],
                       SearchParams(k=K, nprobe=nprobe, exact_distances=False))
        anchor_recall = compute_recall(r.ids, gt, K)
        if anchor_recall >= 0.9:
            anchor_np = nprobe
            break
    print(json.dumps({"anchor_np": anchor_np,
                      "anchor_recall": round(anchor_recall, 4)}), flush=True)
    sp_fix = SearchParams(k=K, nprobe=anchor_np, exact_distances=False)

    qdev = {b: jnp.asarray(queries[:b]) for b in BS}

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

    for pass_no in (1, 2):
        for b in BS:
            for mode, sp in (("aps", sp_aps), ("fixed", sp_fix)):
                ms = step_ms(qdev[b], sp)
                print(json.dumps({"cfg": f"{mode}_B{b}_p{pass_no}",
                                  "ms": round(ms, 3),
                                  "qps": round(b / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
