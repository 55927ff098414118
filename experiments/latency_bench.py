#!/usr/bin/env python
"""Latency benchmark: p50/p99 per-batch latency at a recall target.

BASELINE.json's primary metric includes "p99 query latency at 90% recall
target". Measures both modes at small batch (the latency regime):
  * APS (recall_target=0.9): per-query adaptive early termination
  * FixedNProbe at the smallest nprobe reaching 0.9

Usage: python experiments/latency_bench.py [--n 1000000] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def percentiles(samples):
    s = np.sort(np.asarray(samples))
    return {
        "p50_ms": float(np.percentile(s, 50) * 1000),
        "p99_ms": float(np.percentile(s, 99) * 1000),
        "mean_ms": float(s.mean() * 1000),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--target", type=float, default=0.9)
    ap.add_argument("--out", default="latency_results.json")
    ap.add_argument("--exact", action="store_true",
                    help="exact-rescored distances (default: dequantized "
                         "serving, the production bench config)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    x = make_manifold(args.n, args.d, 4096, seed=1)
    ids = np.arange(args.n, dtype=np.int64)
    queries = make_manifold(args.batch * args.reps, args.d, 4096, seed=7)

    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=args.nlist))
    state = idx.store.state
    # Recall sample floor: batch*4 is 4 queries at B=1 — pure noise
    # (latency256_b1 r4 reported 0.82-0.95 across modes on that sample).
    q_gt = queries[: max(args.batch * 4, min(64, len(queries)))]
    _, gt_ids = flat_search(state.codes, state.ids, jnp.asarray(q_gt), 10, "l2")
    gt_ids = np.asarray(gt_ids).astype(np.int64)

    results = {}

    # Fixed nprobe: find smallest reaching target, then time it.
    chosen = args.nlist
    for nprobe in (8, 16, 32, 64, 128):
        res = idx.search(q_gt, SearchParams(k=10, nprobe=nprobe))
        if compute_recall(res.ids, gt_ids, 10) >= args.target:
            chosen = nprobe
            break

    def time_mode(name, sp):
        lat = []
        recalls = []
        idx.search(queries[: args.batch], sp)  # warm/compile
        for r in range(args.reps):
            qb = queries[r * args.batch : (r + 1) * args.batch]
            t0 = time.perf_counter()
            res = idx.search(qb, sp)
            lat.append(time.perf_counter() - t0)
        res = idx.search(q_gt, sp)
        achieved = compute_recall(res.ids, gt_ids, 10)
        # Amortized per-batch DEVICE time: enqueue every batch, sync once —
        # excludes the per-call tunnel round trip that dominates wall p50
        # on remote-attached chips (the "excluding tunnel RTT" comparison).
        q_dev = [jnp.asarray(queries[r * args.batch:(r + 1) * args.batch])
                 for r in range(min(args.reps, 32))]
        last = idx._search_device_full(q_dev[0], sp)
        _ = np.asarray(last[1][:1])
        t0 = time.perf_counter()
        for qd in q_dev:
            last = idx._search_device_full(qd, sp)
        _ = np.asarray(last[1][:1])
        device_ms = (time.perf_counter() - t0) / len(q_dev) * 1000
        results[name] = percentiles(lat) | {
            "recall": achieved,
            "scanned": res.timing_info.partitions_scanned,
            "device_ms_per_batch": device_ms,
        }
        print(name, results[name])

    ex = bool(args.exact)
    time_mode("fixed_nprobe", SearchParams(k=10, nprobe=chosen,
                                           exact_distances=ex))
    time_mode(
        "aps",
        SearchParams(
            k=10,
            recall_target=args.target,
            initial_search_fraction=0.125,
            aps_chunk_size=4,
            exact_distances=ex,
        ),
    )
    time_mode(
        "aps_planned",
        SearchParams(k=10, recall_target=args.target,
                     initial_search_fraction=0.125, aps_mode="planned",
                     exact_distances=ex),
    )
    if idx.aps_radius_ab is not None:
        # Oneshot (predicted-radius plan, one scan): the latency-regime
        # candidate for APS — no prologue, no loop, parent ranking capped
        # at the calibrated width.
        time_mode(
            "aps_oneshot",
            SearchParams(k=10, recall_target=args.target,
                         initial_search_fraction=0.125, aps_mode="oneshot",
                         exact_distances=ex),
        )
    if getattr(idx, "aps_width_clip", 0):
        # Dense calibrated-prefix serving (round 4): auto with no explicit
        # fraction routes to the fixed-nprobe program at width_clip.
        time_mode(
            "aps_dense",
            SearchParams(k=10, recall_target=args.target,
                         exact_distances=ex),
        )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
