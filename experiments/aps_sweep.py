#!/usr/bin/env python
"""Adaptive partition scanning experiment: Oracle vs FixedNProbe vs APS
across recall targets (mirror of reference
test/experiments/adaptive_partition_scanning/aps.py).

For each recall target, measures:
  * APS: achieved recall + mean partitions scanned at that target
  * FixedNProbe: the smallest nprobe achieving the target (grid search) and
    its partition count
  * Oracle: per-query minimal partitions containing the true neighbors

Usage: python experiments/aps_sweep.py [--dataset clustered] [--nlist 1024]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="clustered")
    ap.add_argument("--nlist", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--targets", default="0.7,0.8,0.85,0.9,0.95,0.99")
    ap.add_argument("--initial-search-fraction", type=float, default=0.5)
    ap.add_argument("--out", default="aps_sweep_results.json")
    args = ap.parse_args()

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.datasets import load_dataset
    from quake_tpu.utils import compute_recall

    vectors, queries, gt = load_dataset(args.dataset)
    queries = queries[: args.nq]
    gt = gt[: args.nq, : args.k]
    ids = np.arange(len(vectors), dtype=np.int64)

    idx = QuakeIndex()
    idx.build(vectors, ids, IndexBuildParams(nlist=args.nlist, metric="l2"))
    nlist = idx.nlist()
    print(f"built nlist={nlist} ntotal={idx.ntotal()}")

    # Oracle: rank partitions per query by centroid distance; find the rank
    # needed to cover the true top-k (reference aps.py Oracle baseline).
    from quake_tpu.utils import knn

    cents = idx.centroids()
    rows = idx.store.active_rows()
    ranked, _ = knn(queries, cents, len(cents), "l2")
    id_rows = idx.store.id_map.get_batch(gt.reshape(-1)).reshape(gt.shape)
    oracle_ranks = []
    for qi in range(len(queries)):
        needed_rows = set(int(r) for r in id_rows[qi] if r >= 0)
        rank_of = {int(rows[j]): i for i, j in enumerate(ranked[qi])}
        oracle_ranks.append(max(rank_of.get(r, nlist) for r in needed_rows) + 1)
    oracle_mean = float(np.mean(oracle_ranks))

    results = {"nlist": nlist, "oracle_mean_partitions": oracle_mean, "targets": {}}
    targets = [float(t) for t in args.targets.split(",")]

    # FixedNProbe grid.
    fixed = {}
    for nprobe in (1, 2, 4, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256):
        if nprobe > nlist:
            break
        res = idx.search(queries, SearchParams(k=args.k, nprobe=nprobe))
        fixed[nprobe] = compute_recall(res.ids, gt, args.k)

    for target in targets:
        res = idx.search(
            queries,
            SearchParams(
                k=args.k,
                recall_target=target,
                initial_search_fraction=args.initial_search_fraction,
                recompute_threshold=0.0,
                aps_chunk_size=4,
            ),
        )
        aps_recall = compute_recall(res.ids, gt, args.k)
        aps_scanned = res.timing_info.partitions_scanned
        fixed_nprobe = next((np_ for np_, r in sorted(fixed.items()) if r >= target), None)
        results["targets"][target] = {
            "aps_recall": aps_recall,
            "aps_mean_partitions": aps_scanned,
            "fixed_nprobe_for_target": fixed_nprobe,
        }
        print(
            f"target={target}: APS recall={aps_recall:.3f} scanned={aps_scanned} "
            f"| FixedNProbe needs nprobe={fixed_nprobe}"
        )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
