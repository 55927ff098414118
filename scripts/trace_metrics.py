#!/usr/bin/env python
"""System-metrics tracer: sample CPU/memory/disk (and TPU memory when a jax
device is live) to a CSV while a workload runs.

Analog of the reference's glances-based scripts/trace_metrics.py (:25-31
panels), built on psutil so it works in minimal containers.

Usage:
    python scripts/trace_metrics.py --out metrics.csv --interval 1 &
    <run workload>
    kill %1
"""

from __future__ import annotations

import argparse
import csv
import signal
import sys
import time

import psutil


def tpu_memory_stats():
    """Best-effort TPU HBM stats via jax (returns {} off-TPU)."""
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        return {
            "tpu_bytes_in_use": stats.get("bytes_in_use", ""),
            "tpu_bytes_limit": stats.get("bytes_limit", ""),
        }
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="metrics.csv")
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--duration", type=float, default=0.0, help="0 = until killed")
    ap.add_argument("--tpu", action="store_true", help="also sample TPU memory")
    args = ap.parse_args()

    stop = {"flag": False}
    signal.signal(signal.SIGTERM, lambda *a: stop.update(flag=True))
    signal.signal(signal.SIGINT, lambda *a: stop.update(flag=True))

    fields = [
        "timestamp", "cpu_percent", "mem_used_gb", "mem_percent",
        "disk_read_mb", "disk_write_mb", "net_sent_mb", "net_recv_mb",
    ]
    if args.tpu:
        fields += ["tpu_bytes_in_use", "tpu_bytes_limit"]

    t_start = time.time()
    disk0 = psutil.disk_io_counters()
    net0 = psutil.net_io_counters()
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        while not stop["flag"]:
            if args.duration and time.time() - t_start > args.duration:
                break
            disk = psutil.disk_io_counters()
            net = psutil.net_io_counters()
            row = {
                "timestamp": round(time.time(), 3),
                "cpu_percent": psutil.cpu_percent(interval=None),
                "mem_used_gb": round(psutil.virtual_memory().used / 2**30, 3),
                "mem_percent": psutil.virtual_memory().percent,
                "disk_read_mb": round((disk.read_bytes - disk0.read_bytes) / 2**20, 2),
                "disk_write_mb": round((disk.write_bytes - disk0.write_bytes) / 2**20, 2),
                "net_sent_mb": round((net.bytes_sent - net0.bytes_sent) / 2**20, 2),
                "net_recv_mb": round((net.bytes_recv - net0.bytes_recv) / 2**20, 2),
            }
            if args.tpu:
                row.update(tpu_memory_stats())
            w.writerow(row)
            f.flush()
            time.sleep(args.interval)


if __name__ == "__main__":
    main()
