"""Kernel A/B on real TPU: v2 (id-tie-break selection) vs v3 (slot selection
+ cached norms + size masking) vs v3p (float-packed selection + exact
rescore), across qt and storage precision.

Timing methodology (see CLAUDE.md): amortized >=1s enqueued window + one
final device->host transfer; per-call numbers include nothing but the kernel
program (prologue build_groups + epilogue merge are part of each call, as in
production).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_v3_ab.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas,
        grouped_scan_pallas_v3,
        grouped_scan_pallas_v3p,
    )

    P, C, D = 1024, 1536, 128
    B, nprobe, k = 4096, 16, 10
    rng = np.random.default_rng(0)
    codes_np = rng.standard_normal((P, C, D)).astype(np.float32)
    sizes_np = rng.integers(int(0.55 * C), C + 1, P).astype(np.int32)
    ids_np = np.arange(P * C, dtype=np.int32).reshape(P, C)
    for p in range(P):
        ids_np[p, sizes_np[p]:] = -1
        codes_np[p, sizes_np[p]:] = 0.0
    q_np = rng.standard_normal((B, D)).astype(np.float32)
    pids_np = rng.integers(0, P, (B, nprobe)).astype(np.int32)

    codes = jnp.asarray(codes_np)
    ids = jnp.asarray(ids_np)
    sizes = jnp.asarray(sizes_np)
    norms = jnp.sum(codes.astype(jnp.float32) ** 2, axis=2)
    q = jnp.asarray(q_np)
    pids = jnp.asarray(pids_np)

    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)
    jax.block_until_ready((codes, norms, codes_bf, norms_bf))

    ref_ids = None

    def bench(name, fn, args, kw):
        nonlocal ref_ids
        t_c0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t_c0
        # rough per-call estimate (3 synced calls)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args, **kw)
        _ = np.asarray(out[0][:1, :1])
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        _ = np.asarray(out[0][:1, :1])
        ms = (time.perf_counter() - t0) / reps * 1e3
        # recall sanity vs the first (exact v2) variant
        ids_out = np.asarray(out[1])
        if ref_ids is None:
            ref_ids = ids_out
            overlap = 1.0
        else:
            overlap = float(
                np.mean([
                    len(set(ids_out[b]) & set(ref_ids[b])) / k
                    for b in range(0, B, 64)
                ])
            )
        print(json.dumps({
            "name": name, "ms_per_call": round(ms, 2),
            "qps": round(B / ms * 1e3, 0), "overlap_vs_v2": round(overlap, 4),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        return ms

    L = "l2"
    bench("v2_qt32_f32", grouped_scan_pallas, (codes, ids, q, pids), dict(k=k, metric=L, qt=32))
    bench("v3_qt32_f32", grouped_scan_pallas_v3, (codes, ids, sizes, norms, q, pids), dict(k=k, metric=L, qt=32))
    bench("v3p_qt32_f32", grouped_scan_pallas_v3p, (codes, ids, sizes, norms, q, pids), dict(k=k, metric=L, qt=32))
    bench("v3p_qt64_f32", grouped_scan_pallas_v3p, (codes, ids, sizes, norms, q, pids), dict(k=k, metric=L, qt=64))
    bench("v3_qt64_f32", grouped_scan_pallas_v3, (codes, ids, sizes, norms, q, pids), dict(k=k, metric=L, qt=64))
    # k=1 breakdown (selection share)
    bench("v3_qt32_f32_k1", grouped_scan_pallas_v3, (codes, ids, sizes, norms, q, pids), dict(k=1, metric=L, qt=32))
    bench("v3p_qt32_f32_k1", grouped_scan_pallas_v3p, (codes, ids, sizes, norms, q, pids), dict(k=1, metric=L, qt=32))
    # bf16 storage
    bench("v3_qt32_bf16", grouped_scan_pallas_v3, (codes_bf, ids, sizes, norms_bf, q, pids), dict(k=k, metric=L, qt=32))
    bench("v3p_qt32_bf16", grouped_scan_pallas_v3p, (codes_bf, ids, sizes, norms_bf, q, pids), dict(k=k, metric=L, qt=32))
    bench("v3p_qt64_bf16", grouped_scan_pallas_v3p, (codes_bf, ids, sizes, norms_bf, q, pids), dict(k=k, metric=L, qt=64))
    print("done", flush=True)


if __name__ == "__main__":
    main()
