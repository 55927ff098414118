#!/usr/bin/env python
"""Shard work-division evidence (VERDICT r1 #10; reference analog:
test/experiments/query_processing_perf/vary_workers.py).

Real ICI cannot be timed without a multi-chip slice, but the *work division*
can be proven on the virtual CPU mesh from the compiled programs:

  * bytes accessed per device for the sharded fused search must fall ~1/N
    with N devices (slot sharding splits every slab's bandwidth evenly);
  * the cross-device merge is one all_gather of [N, B, k] score/id pairs —
    O(k * N * B * 8) bytes, independent of corpus size.

Also prints the projected v5e-8 throughput from the measured single-chip
kernel time under those two facts.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       PYTHONPATH=. python experiments/shard_work_division.py
"""

from __future__ import annotations

import json

import numpy as np


def main():
    import os

    import jax

    # The environment sitecustomize may pin the TPU plugin platform even when
    # JAX_PLATFORMS=cpu is set; honor a CPU request before backend init.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.parallel.mesh import make_mesh, shard_store_state
    from quake_tpu.parallel.sharded import sharded_fused_search

    rng = np.random.default_rng(0)
    N, D, NLIST, B, NPROBE, K = 100_000, 64, 128, 512, 16, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=NLIST, calibrate_aps=False))
    base_state = idx.store.state
    pstate = idx.parent.store.state

    n_dev = len(jax.devices())
    results = {}
    for s in [d for d in (1, 2, 4, 8) if d <= n_dev]:
        mesh = make_mesh(s)
        st = shard_store_state(base_state, mesh)

        def fn(codes, ids, norms, pc, pi, qq):
            return sharded_fused_search(
                mesh, codes, ids, norms, pc, pi, qq,
                k=K, nprobe=NPROBE, metric="l2", qt=16, group_chunk=32,
            )

        lowered = jax.jit(fn).lower(
            st.codes, st.ids, st.norms, pstate.codes, pstate.ids, q
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        ba = float(cost.get("bytes accessed", 0.0))
        results[s] = {"bytes_accessed_per_device": ba}
        print(f"ndev={s}: bytes accessed/device = {ba/1e6:.1f} MB")

    b1 = results.get(1, {}).get("bytes_accessed_per_device")
    if b1:
        for s, r in results.items():
            r["fraction_of_single_device"] = r["bytes_accessed_per_device"] / b1
            print(f"ndev={s}: fraction of 1-device bytes = "
                  f"{r['fraction_of_single_device']:.3f} (ideal ~{1/s:.3f} + merge)")

    merge_bytes = {s: s * B * K * 8 for s in results}
    print(f"merge all_gather payload (O(k*N*B)): "
          f"{ {s: f'{v/1e3:.0f} KB' for s, v in merge_bytes.items()} }")

    # Projection: measured single-chip fused batch time (BENCH_NOTES r2) with
    # slot sharding: scan work 1/8, parent+prologue+epilogue replicated,
    # merge payload ~0.3 MB over ICI (~50 GB/s/link => ~10 us, negligible).
    t_fused_ms, t_overhead_ms = 14.4, 1.3  # kernel 13.1 + fused overhead 1.3
    t8 = (t_fused_ms - t_overhead_ms) / 8 + t_overhead_ms
    print(f"projected v5e-8 fused batch time: {t8:.2f} ms -> "
          f"{4096 / t8 * 1e3 / 1e6:.2f}M qps (if slot sharding scales; "
          f"parent/prologue replicated)")

    with open("experiments/shard_work_division.json", "w") as f:
        json.dump({"per_device": results, "merge_bytes": merge_bytes}, f, indent=2)
    print("wrote shard_work_division.json")


if __name__ == "__main__":
    main()
