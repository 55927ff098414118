#!/usr/bin/env python
"""
quake_tpu Basic Example
=======================

Demonstrates the basic functionality (the analog of the reference
examples/quickstart.py):
- Building an index from a sample dataset.
- Executing a search query (fixed nprobe and recall-target modes).
- Removing and adding vectors.
- Performing maintenance.

Usage:
    python examples/quickstart.py [--dataset clustered|random|sift1m]
"""

import argparse
import time

import numpy as np

from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
from quake_tpu.datasets import load_dataset
from quake_tpu.utils import compute_recall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="clustered")
    ap.add_argument("--nlist", type=int, default=1024)
    args = ap.parse_args()

    print("=== quake_tpu Basic Example ===")
    print(f"Loading {args.dataset} dataset...")
    vectors, queries, gt = load_dataset(args.dataset)

    ids = np.arange(len(vectors), dtype=np.int64)
    nq = 100
    queries = queries[:nq]
    gt = gt[:nq]

    # ---- Build ----
    build_params = IndexBuildParams(nlist=args.nlist, metric="l2")
    print(
        f"Building index with num_clusters={build_params.nlist} over "
        f"{vectors.shape[0]} vectors of dimension {vectors.shape[1]}..."
    )
    t0 = time.time()
    index = QuakeIndex()
    index.build(vectors, ids, build_params)
    print(f"Build time: {time.time() - t0:.3f} s\n")

    # ---- Search (fixed nprobe) ----
    sp = SearchParams(k=10, nprobe=10)
    t0 = time.time()
    result = index.search(queries, sp)
    print(f"Search (nprobe=10) time: {time.time() - t0:.4f} s")
    print(f"Recall@10: {compute_recall(result.ids, gt, 10):.3f}\n")

    # ---- Search (recall target / APS) ----
    sp = SearchParams(k=10, recall_target=0.9, initial_search_fraction=0.1)
    t0 = time.time()
    result = index.search(queries, sp)
    print(f"Search (recall_target=0.9) time: {time.time() - t0:.4f} s")
    print(f"Recall@10: {compute_recall(result.ids, gt, 10):.3f}")
    print(f"Partitions scanned (mean): {result.timing_info.partitions_scanned}\n")

    # ---- Remove and re-add ----
    n_mod = 1000
    t0 = time.time()
    index.remove(ids[:n_mod])
    print(f"Removed {n_mod} vectors in {time.time() - t0:.4f} s; ntotal={index.ntotal()}")
    t0 = time.time()
    index.add(vectors[:n_mod], ids[:n_mod])
    print(f"Added {n_mod} vectors in {time.time() - t0:.4f} s; ntotal={index.ntotal()}\n")

    # ---- Maintenance ----
    t0 = time.time()
    info = index.maintenance()
    print(
        f"Maintenance in {time.time() - t0:.4f} s: "
        f"{info.n_splits} splits, {info.n_deletes} deletes"
    )


if __name__ == "__main__":
    main()
