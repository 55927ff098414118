"""Gate a bench.py result against the last committed round benchmark.

Usage: python scripts/check_bench_gate.py bench_tpu.json [--threshold 0.9]

Fails (exit 1) if the measured vs_baseline falls below threshold * the best
committed BENCH_r*.json — the TPU-runner analog of the regression harness's
5% latency gate (compare_results.py).
"""

import argparse
import glob
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("result")
    ap.add_argument("--threshold", type=float, default=0.9)
    args = ap.parse_args()

    with open(args.result) as f:
        text = f.read()
    try:
        # bench.py stdout: one JSON object per line, take the last.
        line = [ln for ln in text.splitlines() if ln.strip().startswith("{")][-1]
        got = json.loads(line)["vs_baseline"]
    except (json.JSONDecodeError, KeyError):
        # Driver-format record (BENCH_rNN.json): whole-file JSON.
        rec = json.loads(text)
        got = float(rec["parsed"]["vs_baseline"])

    best = 0.0
    for path in glob.glob("BENCH_r*.json"):
        try:
            with open(path) as f:
                rec = json.load(f)
            best = max(best, float(rec["parsed"]["vs_baseline"]))
        except Exception:
            continue
    if best == 0.0:
        print(f"no committed baseline found; measured vs_baseline={got}")
        return 0
    floor = best * args.threshold
    print(f"measured vs_baseline={got:.4f}, committed best={best:.4f}, "
          f"floor={floor:.4f}")
    if got < floor:
        print("FAIL: benchmark regression beyond threshold")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
