#!/usr/bin/env python
"""Shard-count scaling experiment (the analog of reference
test/experiments/query_processing_perf/vary_workers.py: worker-count scaling
becomes mesh shard-count scaling).

Measures batched search throughput at 1..N shards on the available devices
(virtual CPU mesh or a real multi-chip TPU slice).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python experiments/shard_scaling.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--out", default="shard_scaling_results.json")
    args = ap.parse_args()

    import os

    import jax

    # Honor an explicit CPU request even when the sitecustomize pins the
    # TPU plugin (see CLAUDE.md "Environment gotchas").
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.datasets import ClusteredDataset

    base, queries, _ = ClusteredDataset(n=args.n, d=args.d, nq=args.batch).load()
    ids = np.arange(len(base), dtype=np.int64)
    sp = SearchParams(k=10, nprobe=args.nprobe)

    n_dev = len(jax.devices())
    shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]
    results = {}
    for s in shard_counts:
        idx = QuakeIndex()
        idx.build(base, ids, IndexBuildParams(nlist=args.nlist))
        if s > 1:
            idx.shard(s)
        q_dev = jnp.asarray(queries)
        jax.block_until_ready(idx._search_device_full(q_dev, sp)[1])
        t0 = time.perf_counter()
        reps = 10
        last = None
        for _ in range(reps):
            last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1])
        dt = (time.perf_counter() - t0) / reps
        results[s] = {"ms_per_batch": dt * 1000, "qps": args.batch / dt}
        print(f"shards={s}: {dt*1000:.2f} ms/batch, {args.batch/dt:.0f} qps")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
