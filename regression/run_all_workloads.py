#!/usr/bin/env python
"""Run every workload config (reference run_all_workloads.py analog)."""

import argparse
from pathlib import Path

from run_workload import run

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="baseline")
    ap.add_argument("--configs", default=str(Path(__file__).parent / "configs"))
    ap.add_argument("--output-root", default="regression_results")
    args = ap.parse_args()
    for cfg in sorted(Path(args.configs).glob("*.yaml")):
        print(f"=== {cfg.name} ===")
        run(str(cfg), args.output_root, args.name)
