#!/usr/bin/env python
"""Maintenance parameter ablation on a write-heavy workload (mirror of
reference test/experiments/maintenance_ablation/maintenance_ablation.py):
replay the same skewed insert/delete/query workload with maintenance off and
with several threshold settings, and compare query latency/recall/partition
count trajectories.

Usage: python experiments/maintenance_ablation.py
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="maintenance_ablation_out")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--ops", type=int, default=60)
    args = ap.parse_args()

    from quake_tpu.datasets import ClusteredDataset
    from quake_tpu.params import MaintenancePolicyParams
    from quake_tpu.workload.generator import DynamicWorkloadGenerator
    from quake_tpu.workload.evaluator import WorkloadEvaluator
    from quake_tpu.wrappers.quake import QuakeWrapper

    workdir = Path(args.workdir)
    base, queries, _ = ClusteredDataset(n=args.n, d=args.d, nq=1000).load()

    gen = DynamicWorkloadGenerator(
        workload_dir=workdir / "workload",
        base_vectors=base,
        metric="l2",
        insert_ratio=0.5,
        delete_ratio=0.2,
        query_ratio=0.3,
        update_batch_size=1000,
        query_batch_size=100,
        number_of_operations=args.ops,
        initial_size=args.n // 2,
        cluster_size=100,
        cluster_sample_distribution="skewed",
        queries=queries,
        query_cluster_sample_distribution="skewed",
    )
    if not gen.workload_exists():
        gen.generate_workload()

    variants = {
        "no_maintenance": None,
        "default": MaintenancePolicyParams(window_size=200),
        "aggressive": MaintenancePolicyParams(
            window_size=200, delete_threshold_ns=0.0, split_threshold_ns=0.0
        ),
    }
    summary = {}
    for name, m_params in variants.items():
        ev = WorkloadEvaluator(workload_dir=workdir / "workload",
                               output_dir=workdir / name)
        results = ev.evaluate_workload(
            name=name,
            index=QuakeWrapper(),
            build_params={"nc": args.n // 200, "metric": "l2"},
            search_params={"k": 10, "nprobe": 32},
            do_maintenance=m_params is not None,
            m_params=m_params,
        )
        summary[name] = ev.summary | {
            "final_n_list": results[-1]["n_list"] if results else None
        }
        print(name, summary[name])

    with open(workdir / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {workdir}/summary.json")


if __name__ == "__main__":
    main()
