"""Round-4 TPU work queue: run every tunnel-blocked measurement in priority
order the moment the TPU is reachable, persisting each result as it lands.

The axon tunnel dies for hours at a time (burned round 3's headline), so
this runner (a) waits for the tunnel with bounded probes, (b) runs each job
in a watchdog-wrapped subprocess, (c) re-probes between jobs and pauses when
the tunnel drops instead of cascading failures, (d) writes incremental
results to experiments/r4_runs/ so a partial sweep still counts.

Priority order (VERDICT r3):
  1. bench.py                    — headline certification (#1)
  2. tpu_sharded_parity          — sharded v11 on-chip correctness (#3)
  3. aps_oneshot_ab              — APS tax re-measure w/ dequant wiring (#4)
  4. latency_bench B=64 / B=1    — p99 @ 0.9 recall artifact (#5, #8)
  5. tpu_donation_check          — donation verdict on TPU (#6)
  6. kernel_ab31                 — parent backend + B=16384 (#8)
  7. bench_suite 10m             — 10M-scale refresh (#8)

Run (background, survives tunnel outages):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_round4_queue.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "experiments", "r4_runs")
PROBE_SNIPPET = "import jax, sys; sys.exit(0 if len(jax.devices()) else 1)"

JOBS = [
    # (name, argv, watchdog_s)
    ("bench", [sys.executable, "bench.py"], 4200),
    ("sharded_parity", [sys.executable, "scripts/tpu_sharded_parity.py"], 3600),
    ("aps_oneshot_ab", [sys.executable, "experiments/aps_oneshot_ab.py"], 3600),
    ("latency_b64", [sys.executable, "experiments/latency_bench.py",
                     "--nlist", "512", "--batch", "64",
                     "--out", "experiments/r4_runs/latency_b64.json"], 3600),
    ("latency_b1", [sys.executable, "experiments/latency_bench.py",
                    "--nlist", "512", "--batch", "1", "--reps", "200",
                    "--out", "experiments/r4_runs/latency_b1.json"], 3600),
    ("donation_check", [sys.executable, "scripts/tpu_donation_check.py"], 1800),
    ("kernel_ab31", [sys.executable, "experiments/kernel_ab31.py"], 3600),
    ("nlist_sweep4", [sys.executable, "experiments/nlist_sweep4.py"], 5400),
    # Second wave (added mid-round after nlist_sweep4 picked nlist=256 and
    # the v11b sorted-budget epilogue landed). Ordered above the 10M
    # refresh: the headline re-cert and the APS tax A/B are worth more,
    # and the first 10M attempt ran right up against its watchdog.
    ("bench_256", [sys.executable, "bench.py"], 4200),
    ("aps_v11b_ab", [sys.executable, "experiments/aps_v11b_ab.py"], 4800),
    ("nlist_sweep5", [sys.executable, "experiments/nlist_sweep5.py"], 5400),
    # Third wave (session 2): the Pallas-parent A/B at the production
    # operating point (kernel_ab31 reversed the round-3 verdict at
    # nlist=512 — confirm at 256 before flipping the default), and the
    # coarse-nlist APS adherence re-check after the auto-candidate-width
    # fix. Both ordered above the long 10M refresh.
    ("kernel_ab32", [sys.executable, "experiments/kernel_ab32.py"], 3600),
    ("aps_width_check", [sys.executable, "experiments/aps_width_check.py"],
     3600),
    ("bench_10m", [sys.executable, "bench_suite.py", "--configs", "10m"], 7200),
    # Fourth wave (session 3): aps_width_check ran against mid-edit
    # calibration code (it started at 01:09, the perturbed-calibration
    # commit landed 01:16) AND exposed the unbudgeted planned tail
    # (70-74 ms); re-run on the final code with the budgeted planned path.
    # nlist_sweep6 times the actual >=0.90-gate points (192/np10 vs
    # 256/np11, niter=25) that sweep5's 0.905 gate skipped. bench_final is
    # a belt-and-suspenders fresh headline capture on the final code.
    ("aps_width_check2", [sys.executable, "experiments/aps_width_check.py"],
     3600),
    ("nlist_sweep6", [sys.executable, "experiments/nlist_sweep6.py"], 5400),
    ("aps_b64_decomp", [sys.executable, "experiments/aps_b64_decomp.py"],
     3600),
    ("bench_final", [sys.executable, "bench.py"], 4200),
    # Fifth wave (run only if round time remains; bench_final stays the
    # last headline capture above): SOAR at the nlist=256 point — spill
    # halves the equal-recall nprobe while doubling slab lanes; the trade
    # flipped twice across kernel generations, re-decide at v11/256.
    ("soar256_ab", [sys.executable, "experiments/soar256_ab.py"], 5400),
    ("latency256_b64", [sys.executable, "experiments/latency_bench.py",
                        "--nlist", "256", "--batch", "64",
                        "--out", "experiments/r4_runs/latency256_b64.json"],
     3600),
    ("latency256_b1", [sys.executable, "experiments/latency_bench.py",
                       "--nlist", "256", "--batch", "1", "--reps", "200",
                       "--out", "experiments/r4_runs/latency256_b1.json"],
     3600),
    # Sixth wave: the dense-prefix serving A/B (auto_dense vs the pinned
    # masked modes vs fixed anchors) after aps_b64_decomp localized the
    # masked band; the decomp retry runs automatically (rc != 0 above).
    ("aps_width_check3", [sys.executable, "experiments/aps_width_check.py"],
     3600),
]


def probe(timeout_s: float = 90) -> bool:
    try:
        return subprocess.run(
            [sys.executable, "-c", PROBE_SNIPPET], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def wait_for_tpu() -> None:
    delay = 60.0
    while not probe():
        print(f"[queue] tunnel down; sleeping {delay:.0f}s", flush=True)
        time.sleep(delay)
        delay = min(delay * 1.5, 600.0)


def main() -> int:
    os.makedirs(OUTDIR, exist_ok=True)
    status_path = os.path.join(OUTDIR, "queue_status.json")
    status = {}
    if os.path.exists(status_path):
        with open(status_path) as f:
            status = json.load(f)

    for name, argv, watchdog in JOBS:
        if status.get(name, {}).get("rc") == 0:
            print(f"[queue] {name}: already done, skipping", flush=True)
            continue
        wait_for_tpu()
        print(f"[queue] {name}: starting (watchdog {watchdog}s)", flush=True)
        out_path = os.path.join(OUTDIR, f"{name}.out")
        t0 = time.time()
        try:
            with open(out_path, "w") as out:
                rc = subprocess.run(
                    argv, cwd=REPO, timeout=watchdog,
                    stdout=out, stderr=subprocess.STDOUT,
                ).returncode
        except subprocess.TimeoutExpired:
            rc = -9
        status[name] = {"rc": rc, "elapsed_s": round(time.time() - t0, 1),
                        "out": out_path,
                        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())}
        with open(status_path, "w") as f:
            json.dump(status, f, indent=2)
        print(f"[queue] {name}: rc={rc} ({status[name]['elapsed_s']}s)",
              flush=True)
    print("[queue] all jobs attempted", flush=True)
    print(json.dumps(status, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
