"""Round-5 TPU work queue: like round 4's runner, but DYNAMIC — jobs live
in experiments/r5_queue.json and the runner re-reads the file between jobs,
so new measurements can be appended while early ones run (code fixes land
mid-round; their artifacts queue behind the fix commit instead of blocking
the long builds that don't depend on them).

Job file format: [{"name": ..., "argv": [...], "watchdog": seconds}, ...]
Results: experiments/r5_runs/<name>.out + queue_status.json (rc per job).
A job named in queue_status with rc==0 is never re-run; to re-run, append
the job again under a new name.

Run (background, survives tunnel outages):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_round5_queue.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "experiments", "r5_runs")
QUEUE_PATH = os.path.join(REPO, "experiments", "r5_queue.json")
PROBE_SNIPPET = "import jax, sys; sys.exit(0 if len(jax.devices()) else 1)"
IDLE_EXIT_S = 3600  # exit after an hour with nothing new to run


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


def load_jobs():
    try:
        with open(QUEUE_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"[queue] bad queue file: {e}", flush=True)
        return []


def main() -> int:
    os.makedirs(OUTDIR, exist_ok=True)
    status_path = os.path.join(OUTDIR, "queue_status.json")
    status = {}
    if os.path.exists(status_path):
        with open(status_path) as f:
            status = json.load(f)

    idle_since = None
    while True:
        pending = [j for j in load_jobs()
                   if status.get(j["name"], {}).get("rc") != 0]
        if not pending:
            if idle_since is None:
                idle_since = time.time()
                print("[queue] queue drained; waiting for new jobs",
                      flush=True)
            if time.time() - idle_since > IDLE_EXIT_S:
                break
            time.sleep(30)
            continue
        idle_since = None
        job = pending[0]
        name, argv = job["name"], job["argv"]
        watchdog = int(job.get("watchdog", 3600))
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
    print("[queue] idle timeout; exiting", flush=True)
    print(json.dumps(status, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
