#!/usr/bin/env python
"""Regression comparison with relative thresholds.

Mirrors reference test/python/regression/compare_results.py:43-181: flag a
regression when query latency worsens by >5% or recall drops by >1% versus
the stored baseline results.
"""

from __future__ import annotations

import argparse
import csv
import sys
from collections import defaultdict


LATENCY_THRESHOLD = 0.05  # +5% (compare_results.py:178-181)
RECALL_THRESHOLD = 0.01  # -1%


def summarize(csv_path: str):
    per_method = defaultdict(lambda: {"query_lat": [], "recall": [], "insert_lat": [], "delete_lat": [], "maintenance": []})
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            m = per_method[row.get("method", "default")]
            op = row["operation_type"]
            lat = float(row["latency_ms"]) if row.get("latency_ms") else None
            if row.get("maintenance_ms"):
                m["maintenance"].append(float(row["maintenance_ms"]))
            if op == "query" and lat is not None:
                m["query_lat"].append(lat)
                if row.get("recall"):
                    m["recall"].append(float(row["recall"]))
            elif op == "insert" and lat is not None:
                m["insert_lat"].append(lat)
            elif op == "delete" and lat is not None:
                m["delete_lat"].append(lat)

    out = {}
    for name, m in per_method.items():
        out[name] = {
            "mean_query_latency_ms": _mean(m["query_lat"]),
            "mean_recall": _mean(m["recall"]),
            "mean_insert_latency_ms": _mean(m["insert_lat"]),
            "mean_delete_latency_ms": _mean(m["delete_lat"]),
            "mean_maintenance_ms": _mean(m["maintenance"]),
        }
    return out


def _mean(vals):
    return sum(vals) / len(vals) if vals else None


def compare(baseline_csv: str, current_csv: str,
            latency_threshold: float = LATENCY_THRESHOLD,
            recall_threshold: float = RECALL_THRESHOLD) -> list[str]:
    base = summarize(baseline_csv)
    curr = summarize(current_csv)
    failures = []
    for method, b in base.items():
        c = curr.get(method)
        if c is None:
            failures.append(f"{method}: missing from current results")
            continue
        bl, cl = b["mean_query_latency_ms"], c["mean_query_latency_ms"]
        if bl and cl and cl > bl * (1 + latency_threshold):
            failures.append(
                f"{method}: query latency regressed {bl:.2f} -> {cl:.2f} ms (> +{latency_threshold:.0%})"
            )
        br, cr = b["mean_recall"], c["mean_recall"]
        if br is not None and cr is not None and cr < br - recall_threshold:
            failures.append(
                f"{method}: recall regressed {br:.3f} -> {cr:.3f} (> -{recall_threshold:.0%})"
            )
        # Maintenance cost is gated with the same relative threshold as query
        # latency (the reference returns MaintenanceTimingInfo per op,
        # src/cpp/include/common.h:233-241; round-4 CSVs could not catch a
        # maintenance-cost regression because the evaluator ran it untimed).
        bm, cm = b.get("mean_maintenance_ms"), c.get("mean_maintenance_ms")
        if bm and cm and cm > bm * (1 + latency_threshold):
            failures.append(
                f"{method}: maintenance regressed {bm:.2f} -> {cm:.2f} ms (> +{latency_threshold:.0%})"
            )
    return failures


def render_plot(baseline_csv: str, current_csv: str, out_path: str):
    """Comparison dashboard (reference compare_results.py:78-146): grouped
    bars of baseline vs current per method for the four summary metrics."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    base = summarize(baseline_csv)
    curr = summarize(current_csv)
    methods = sorted(set(base) | set(curr))
    metrics = [
        ("mean_query_latency_ms", "query latency (ms)"),
        ("mean_recall", "recall"),
        ("mean_insert_latency_ms", "insert latency (ms)"),
        ("mean_delete_latency_ms", "delete latency (ms)"),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    xs = range(len(methods))
    for ax, (key, title) in zip(axes.ravel(), metrics):
        bvals = [(base.get(m) or {}).get(key) or 0.0 for m in methods]
        cvals = [(curr.get(m) or {}).get(key) or 0.0 for m in methods]
        ax.bar([x - 0.2 for x in xs], bvals, width=0.4, label="baseline")
        ax.bar([x + 0.2 for x in xs], cvals, width=0.4, label="current")
        ax.set_xticks(list(xs))
        ax.set_xticklabels(methods, rotation=20, ha="right", fontsize=8)
        ax.set_title(title, fontsize=10)
        ax.legend(fontsize=8)
    fig.suptitle("regression comparison")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--current", required=True)
    ap.add_argument("--latency-threshold", type=float, default=LATENCY_THRESHOLD)
    ap.add_argument("--recall-threshold", type=float, default=RECALL_THRESHOLD)
    ap.add_argument("--plot", help="write a baseline-vs-current dashboard PNG")
    args = ap.parse_args()
    if args.plot:
        render_plot(args.baseline, args.current, args.plot)
    failures = compare(
        args.baseline, args.current, args.latency_threshold, args.recall_threshold
    )
    if failures:
        print("REGRESSIONS DETECTED:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("No regressions.")
