"""A/B round 24 (round 3, session B): v10 scatter epilogue vs v9.

v10 replaces the pair-major epilogue pathway (inverse-permutation scatter in
build_groups + 2 pair gathers + full-size [Gn, qt, kk] keys/refs derivation)
with ONE [n, kk] row scatter of kernel output rows into pair-major order
(tgt = order[pos], already materialized for qlist) and pool-side ref
reconstruction from (pids, packed % slot_mult).

Also probes qt=128 (halves groups again now that selection is joint) and an
elementwise-vs-einsum rescore spelling.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab24.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v9,
        grouped_scan_pallas_v10,
    )

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)
    pc = cents.reshape(1, P, D)
    pid_arr = jnp.arange(P, dtype=jnp.int32).reshape(1, P)

    def bench(name, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3),
                          "qps": round(B / ms * 1e3)}), flush=True)
        return out, ms

    ref = None

    def check(name, out):
        same = np.mean([
            len(set(np.asarray(ref[1])[b]) & set(np.asarray(out[1])[b])) / k
            for b in range(0, B, 97)
        ])
        print(json.dumps({"name": name, "id_overlap_vs_v9bf16": round(same, 4)}),
              flush=True)

    variants = [
        ("v9_qt64_bf16", lambda: grouped_scan_pallas_v9(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4)),
        ("v10_qt64_bf16", lambda: grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4)),
        ("v10_qt64_f32", lambda: grouped_scan_pallas_v10(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)),
        ("v10_qt128_bf16", lambda: grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=128, gpb=4)),
        ("fused_v9_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
        ("fused_v10_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v10")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            out, _ = bench(f"{name}_p{pass_no}", fn)
            if name == "v9_qt64_bf16":
                ref = out
            else:
                check(name, out)
    # correctness vs exact XLA backend (f32)
    from quake_tpu.ops.grouped import grouped_scan_xla

    s1, i1, _ = grouped_scan_xla(codes, ids, q, pids, k, "l2", qt=16,
                                 group_chunk=32, norms=norms)
    out10 = grouped_scan_pallas_v10(codes, ids, sizes, norms, q, pids, k,
                                    "l2", qt=64, gpb=4)
    ov = np.mean([
        len(set(np.asarray(i1)[b]) & set(np.asarray(out10[1])[b])) / k
        for b in range(0, B, 53)
    ])
    print(json.dumps({"v10_vs_exact_overlap": round(float(ov), 4)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
