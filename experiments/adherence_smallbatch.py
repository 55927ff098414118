"""Small-batch recall-target adherence artifact (VERDICT r4 #1).

Round 4's driver-visible artifacts (r4_runs/latency256_b1.json) measured
auto-mode APS at 0.85 @ B=1 / 0.883 @ B=64 against target 0.9 — but on
4-64-query samples where binomial noise alone is ~±0.04.  Round 5 routes
auto mode to the dense calibrated-prefix program (index.py:794-809), whose
adherence is inherited from the calibration gate.  This script is the
driver-grade proof: >=2048 pinned-seed queries at the PRODUCTION operating
point (1M x 128, nlist=192 — bench.py's headline config), auto mode with no
explicit fraction, run at B=1 and B=64 exactly as a latency-regime client
would issue them.

Reference floor being matched: achieved >= target
(/root/reference/test/cpp/search_recall_tests.cpp:284-339 gates the same
way on its CPU corpora).

Usage: python experiments/adherence_smallbatch.py [--nq 2048] [--target 0.9]
Writes experiments/r5_runs/adherence_smallbatch.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=192)
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--target", type=float, default=0.9)
    ap.add_argument("--out",
                    default="experiments/r5_runs/adherence_smallbatch.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    K = 10
    x = make_manifold(args.n, args.d, 4096, seed=1)
    queries = make_manifold(args.nq, args.d, 4096, seed=7)

    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(args.n, dtype=np.int64),
              IndexBuildParams(nlist=args.nlist, metric="l2", niter=15,
                               calibrate_aps=True))
    if abs(args.target - 0.9) > 1e-9:
        idx.calibrate_aps(target=args.target)
    build_s = time.perf_counter() - t0
    print(json.dumps({"built_s": round(build_s),
                      "nlist": idx.nlist(),
                      "aps_dense_w": int(getattr(idx, "aps_dense_w", 0) or 0),
                      "aps_width_clip": int(getattr(idx, "aps_width_clip", 0) or 0),
                      "aps_calib_target": float(getattr(idx, "aps_calib_target", 0.0) or 0.0)}),
          flush=True)

    state = idx.store.state
    gt_parts = []
    for i in range(0, args.nq, 512):
        _, g = flat_search(state.codes, state.ids,
                           jnp.asarray(queries[i:i + 512]), K, "l2")
        gt_parts.append(np.asarray(g).astype(np.int64))
    gt = np.concatenate(gt_parts, axis=0)

    sp = SearchParams(k=K, recall_target=args.target, exact_distances=False)
    results = {"config": {"n": args.n, "d": args.d, "nlist": idx.nlist(),
                          "nq": args.nq, "target": args.target, "seed_q": 7,
                          "aps_mode": "auto",
                          "aps_dense_w": int(getattr(idx, "aps_dense_w", 0) or 0),
                          "aps_width_clip": int(getattr(idx, "aps_width_clip", 0) or 0)}}

    for B in (1, 64):
        ids_out = np.full((args.nq, K), -1, dtype=np.int64)
        lat = []
        idx.search(queries[:B], sp)  # warm/compile
        scanned = 0
        for i in range(0, args.nq, B):
            t0 = time.perf_counter()
            res = idx.search(queries[i:i + B], sp)
            lat.append(time.perf_counter() - t0)
            ids_out[i:i + B] = res.ids
            scanned = res.timing_info.partitions_scanned
        achieved = compute_recall(ids_out, gt, K)
        s = np.sort(np.asarray(lat)) * 1000
        results[f"B{B}"] = {
            "achieved_recall": float(achieved),
            "adherent": bool(achieved >= args.target),
            "nq": args.nq,
            "scanned": int(scanned),
            "p50_ms": float(np.percentile(s, 50)),
            "p99_ms": float(np.percentile(s, 99)),
        }
        print(json.dumps({f"B{B}": results[f"B{B}"]}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    ok = all(results[f"B{b}"]["adherent"] for b in (1, 64))
    print(json.dumps({"verdict": "ADHERENT" if ok else "MISS",
                      "out": args.out}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
