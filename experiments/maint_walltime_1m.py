"""Maintenance wall-time at 1M under a skewed workload (VERDICT r4 #5).

Round 5 replaced per-partition host k-means splits (a get_partition
round-trip per partition — 30-100 ms each through the tunnel — plus numpy
Lloyd) and the Python refinement cluster-walk with ONE batched device
2-means over all split slabs + ONE constrained-Lloyd program over the
refine neighborhood (kmeans.batched_two_means / batched_refine,
index.py split_partitions, policy.py refine_partitions). Reference
semantics matched: maintenance_policies.cpp:142-202, clustering.cpp:99-182.

This artifact measures the A/B at bench scale: build 1M x 128, drive a
SKEWED query replay (hot cluster subset) plus hot-cluster inserts so the
cost model queues dozens of splits, snapshot the index, then run
maintenance() from the same snapshot with the device path and with
QUAKE_TPU_MAINT_HOST=1. Done-gate: device path >= 10x less wall time.

Writes experiments/r5_runs/maint_walltime_1m.json
"""

import json
import os
import sys
import time

import numpy as np


def build_workload(tmpdir, N, NLIST, NHOT):
    import jax.numpy as jnp

    from bench import make_manifold
    from quake_tpu import (IndexBuildParams, MaintenancePolicyParams,
                           QuakeIndex, SearchParams)

    D = 128
    x = make_manifold(N, D, 4096, seed=1)
    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=NLIST, niter=10, calibrate_aps=False))
    build_s = time.perf_counter() - t0

    # Skew: all replay queries come from a 4% slice of the manifold's
    # cluster support, and 100k inserts land in the same hot region —
    # oversizing the hot partitions while their hit counts spike.
    hot = make_manifold(NHOT + 4000, D, 160, seed=11)  # 160 of 4096 centers
    idx.add(hot[:NHOT], np.arange(N, N + NHOT, dtype=np.int64))
    idx.initialize_maintenance_policy(
        MaintenancePolicyParams(window_size=1000, split_threshold_ns=0.0, alpha=0.5))
    sp = SearchParams(k=10, nprobe=16)
    for i in range(4):
        idx.search(hot[NHOT + i * 1000 : NHOT + 1000 + i * 1000], sp)
    idx.save(tmpdir)
    return build_s


def run_arm(tmpdir, host: bool, NHOT: int):
    from quake_tpu import MaintenancePolicyParams, QuakeIndex

    os.environ["QUAKE_TPU_MAINT_HOST"] = "1" if host else "0"
    idx = QuakeIndex().load(tmpdir)
    idx.initialize_maintenance_policy(
        MaintenancePolicyParams(window_size=1000, split_threshold_ns=0.0, alpha=0.5))
    # The hit window is not persisted (reference behavior) — replay the
    # same skewed queries from the snapshot so both arms queue the same
    # split set.
    from bench import make_manifold
    from quake_tpu import SearchParams

    hot = make_manifold(NHOT + 4000, idx.d(), 160, seed=11)
    sp = SearchParams(k=10, nprobe=16)
    for i in range(4):
        idx.search(hot[NHOT + i * 1000 : NHOT + 1000 + i * 1000], sp)
    t0 = time.perf_counter()
    info = idx.maintenance()
    wall_s = time.perf_counter() - t0
    return {"wall_s": round(wall_s, 3), "n_splits": info.n_splits,
            "n_deletes": info.n_deletes,
            "split_time_us": info.split_time_us,
            "split_refine_time_us": info.split_refine_time_us,
            "total_time_us": info.total_time_us,
            "nlist_after": idx.nlist()}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nhot", type=int, default=100_000)
    ap.add_argument("--out",
                    default="experiments/r5_runs/maint_walltime_1m.json")
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import tempfile

    out_path = args.out
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        snap = os.path.join(tmp, "snap")
        build_s = build_workload(snap, args.n, args.nlist, args.nhot)
        results["build_s"] = round(build_s, 1)
        print(json.dumps({"built_s": round(build_s)}), flush=True)
        # Host arm first (its cost is host-dominated and insensitive to
        # TPU warm-up); device arm second pays any residual compile cost,
        # biasing AGAINST the claim — a conservative ordering.
        results["host"] = run_arm(snap, host=True, NHOT=args.nhot)
        print(json.dumps({"host": results["host"]}), flush=True)
        results["device"] = run_arm(snap, host=False, NHOT=args.nhot)
        print(json.dumps({"device": results["device"]}), flush=True)
    ratio = results["host"]["wall_s"] / max(results["device"]["wall_s"], 1e-9)
    results["host_over_device_wall"] = round(ratio, 2)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"verdict": f"device {ratio:.1f}x faster",
                      "gate_10x": bool(ratio >= 10.0), "out": out_path}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
