"""Validate the analytic maintenance latency grid against the profiled
production kernel on real TPU (round-3 VERDICT #7).

Profiles the production grouped kernel over the (n, k) grid, compares every
cell to the analytic fallback, writes the CSV artifact + a JSON summary with
the per-cell ratio. If the analytic error exceeds 2x anywhere in the
operating region, TPU builds should flip profile_maintenance_latency on
(reference always profiles: quake_index.cpp:81-82).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/maintenance_grid_validation.py
"""

import json

import numpy as np


def main():
    from quake_tpu.maintenance.latency_estimator import ListScanLatencyEstimator

    d = 128
    # Subset of the default grid (remote compiles cost ~30-60 s per (n, k)
    # cell): covers the operating region the split/delete deltas compare.
    n_vals = [256, 1024, 4096, 16384, 65536]
    k_vals = [1, 16, 64]
    analytic = ListScanLatencyEstimator(d, n_values=n_vals, k_values=k_vals)
    profiled = ListScanLatencyEstimator(d, n_values=n_vals, k_values=k_vals)
    profiled.profile_grouped_latency()  # production kernel on this backend

    ratios = profiled.latency_grid / np.maximum(analytic.latency_grid, 1e-9)
    summary = {
        "d": d,
        "n_values": analytic.n_values,
        "k_values": analytic.k_values,
        "ratio_min": float(ratios.min()),
        "ratio_max": float(ratios.max()),
        "ratio_mean": float(ratios.mean()),
        "per_cell": {
            f"n={n}": {
                f"k={k}": round(float(ratios[i, j]), 3)
                for j, k in enumerate(analytic.k_values)
            }
            for i, n in enumerate(analytic.n_values)
        },
    }
    profiled.save("experiments/maintenance_grid_tpu.csv")
    with open("experiments/maintenance_grid_validation.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("ratio_min", "ratio_max", "ratio_mean")}))
    # Decision signal: the cost deltas compare L(n,k) vs 2*L(n/2,k) — what
    # matters is the RATIO ACROSS n, not the absolute scale. Report the
    # worst-case relative shape error over adjacent n pairs too.
    shape_err = []
    for j in range(len(analytic.k_values)):
        for i in range(1, len(analytic.n_values)):
            a = analytic.latency_grid[i, j] / analytic.latency_grid[i - 1, j]
            p = profiled.latency_grid[i, j] / profiled.latency_grid[i - 1, j]
            shape_err.append(p / a)
    print(json.dumps({"shape_ratio_min": round(min(shape_err), 3),
                      "shape_ratio_max": round(max(shape_err), 3)}))


if __name__ == "__main__":
    main()
