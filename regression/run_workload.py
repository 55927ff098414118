#!/usr/bin/env python
"""Config-driven workload regression run.

Mirrors reference test/python/regression/run_workload.py:33-142: build a
workload from the configured dataset, evaluate the configured index methods,
write per-operation results.csv.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from pathlib import Path

import numpy as np
import yaml

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # Honor an explicit CPU request even when a sitecustomize pins the TPU
    # backend at interpreter start (the env var alone is not enough there;
    # see CLAUDE.md "Environment gotchas").
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(config_path: str, output_root: str = "regression_results", name: str = "run"):
    with open(config_path) as f:
        cfg = yaml.safe_load(f)

    from quake_tpu.datasets import load_dataset
    from quake_tpu.params import MaintenancePolicyParams
    from quake_tpu.workload.generator import DynamicWorkloadGenerator
    from quake_tpu.workload.evaluator import WorkloadEvaluator
    from quake_tpu.wrappers.wrapper import get_index_class

    ds_cfg = dict(cfg["dataset"])
    ds_name = ds_cfg.pop("name")
    if cfg.get("skip_if_unavailable"):
        # Real-dataset configs (e.g. SIFT1M) activate only when the files
        # are already present (QUAKE_TPU_DATA_DIR offline drop) or the
        # environment has network access for the downloader.
        from quake_tpu.datasets import _REGISTRY

        ds = _REGISTRY[ds_name.lower()](ds_cfg.get("download_dir"))
        if not ds.is_downloaded() and not os.environ.get("QUAKE_TPU_ALLOW_DOWNLOAD"):
            print(f"SKIP {cfg['name']}: dataset {ds_name!r} not available "
                  "(set QUAKE_TPU_DATA_DIR or QUAKE_TPU_ALLOW_DOWNLOAD=1)")
            return []
    vectors, queries, _ = load_dataset(ds_name, **ds_cfg)

    out_dir = Path(output_root) / name / cfg["name"]
    workload_dir = out_dir / "workload"

    w = cfg["workload"]
    gen = DynamicWorkloadGenerator(
        workload_dir=workload_dir,
        base_vectors=vectors,
        metric=w.get("metric", "l2"),
        insert_ratio=w["insert_ratio"],
        delete_ratio=w["delete_ratio"],
        query_ratio=w["query_ratio"],
        update_batch_size=w["update_batch_size"],
        query_batch_size=w["query_batch_size"],
        number_of_operations=w["number_of_operations"],
        initial_size=w["initial_size"],
        cluster_size=w["cluster_size"],
        cluster_sample_distribution=w.get("cluster_sample_distribution", "uniform"),
        queries=queries,
        query_cluster_sample_distribution=w.get(
            "query_cluster_sample_distribution", "uniform"
        ),
        seed=w.get("seed", 1738),
    )
    if not gen.workload_exists():
        gen.generate_workload()

    all_rows = []
    for method in cfg["methods"]:
        cls = get_index_class(method["index"])
        index = cls()
        m_params = None
        if method.get("maintenance_params"):
            m_params = MaintenancePolicyParams(**method["maintenance_params"])
        evaluator = WorkloadEvaluator(
            workload_dir=workload_dir, output_dir=out_dir / method["name"]
        )
        results = evaluator.evaluate_workload(
            name=method["name"],
            index=index,
            build_params=method.get("build_params", {}),
            search_params=method.get("search_params", {"k": 10}),
            do_maintenance=method.get("do_maintenance", False),
            m_params=m_params,
        )
        for r in results:
            r["method"] = method["name"]
        all_rows.extend(results)

    csv_path = out_dir / "results.csv"
    if all_rows:
        keys = sorted({k for r in all_rows for k in r})
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=keys)
            writer.writeheader()
            writer.writerows(all_rows)
    print(f"Wrote {len(all_rows)} rows to {csv_path}")
    return csv_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--output-root", default="regression_results")
    ap.add_argument("--name", default="run")
    args = ap.parse_args()
    run(args.config, args.output_root, args.name)
