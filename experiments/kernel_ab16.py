"""A/B round 16 (round 3): v9 joint rounds vs v8; qt64/bf16/fold combos;
build_groups sub-stage decomposition; fused best-combo.

ab15: v8 9.97 ms standalone / fused 11.51 ms (356k). k=1 floor 8.4 incl.
grouping 2.2 — rounds+epilogue-of-kernel ~1.5 ms is the remaining
k-dependent cost, on [32, 128] tiles (op-overhead-bound hypothesis -> v9
processes all gpb groups' rounds jointly on [gpb*32, 128]).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab16.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.grouped import group_layout
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v8,
        grouped_scan_pallas_v9,
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
        if same < 0.99:
            print(json.dumps({"name": name, "WARN_id_overlap": round(same, 4)}),
                  flush=True)

    # --- build_groups sub-stage decomposition (what eats the 2.2 ms) ---
    n = B * 16
    iota_n = jnp.arange(n, dtype=jnp.int32)
    flat_pid = pids.reshape(-1)

    @jax.jit
    def bg_sort_only():
        return jnp.sum(jnp.sort((flat_pid + 1) * n + iota_n))

    @jax.jit
    def bg_sort_offs():
        key_sorted = jnp.sort((flat_pid + 1) * n + iota_n)
        offs = jnp.searchsorted(
            key_sorted, (jnp.arange(P + 1, dtype=jnp.int32) + 1) * n
        ).astype(jnp.int32)
        return jnp.sum(key_sorted) + jnp.sum(offs)

    @jax.jit
    def bg_inv_only():
        key_sorted = jnp.sort((flat_pid + 1) * n + iota_n)
        p_sorted = key_sorted // n - 1
        order = key_sorted - (p_sorted + 1) * n
        inv = jnp.zeros((n,), jnp.int32).at[order].set(iota_n)
        return jnp.sum(inv)

    @jax.jit
    def bg_qlist_only():
        from quake_tpu.ops.grouped import _build_groups_sort
        gp, ql, pgrp, pslot = _build_groups_sort(pids, P, 32)
        return jnp.sum(gp) + jnp.sum(ql)

    variants = [
        ("v8_g4", lambda: grouped_scan_pallas_v8(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v9_g4", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v9_g8", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=8)),
        ("v9_g4_qt64", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)),
        ("v9_g8_qt64", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=8)),
        ("v9_g4_f256", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4,
            fold=256)),
        ("v9_g4_qt64_bf16", lambda: grouped_scan_pallas_v9(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4)),
        ("v9_g4_k1", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, gpb=4)),
        ("v9_g4_qt64_k1", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, 1, "l2", qt=64, gpb=4)),
        ("v9_g4_qt64_k1_bf16", lambda: grouped_scan_pallas_v9(
            codes_bf, ids, sizes, norms_bf, q, pids, 1, "l2", qt=64, gpb=4)),
        ("bg_sort_only", bg_sort_only),
        ("bg_sort_offs", bg_sort_offs),
        ("bg_inv_only", bg_inv_only),
        ("bg_full", bg_qlist_only),
        ("fused_v9_qt64", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
        ("fused_v8_qt32", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=32, group_chunk=64, kernel="v8")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            out, _ = bench(f"{name}_p{pass_no}", fn)
            if name == "v8_g4":
                ref = out
            elif name.startswith("v9") and "k1" not in name:
                check(name, out)
    print("done", flush=True)


if __name__ == "__main__":
    main()
