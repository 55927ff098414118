"""A/B round 18 (round 3): epilogue gather rewrite (flattened single-axis
takes) — re-measure v9 full/raw/fused after replacing every 2-index
advanced-indexing gather in the merge/rescore epilogue.

ab17 isolated the epilogue at ~5.7 ms of the 9.7 ms grouped scan (kernel +
grouping raw = 3.9); hypothesis: the multi-dim-index XLA gathers
(approx[pg, pair_slot], codes[w_pid, w_slot]) lower to the slow gather
path on TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab18.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v9

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

    # micro-probes: the two gather spellings on the rescore-sized problem
    refs = jnp.asarray(
        (rng.integers(0, P, (B, k)) << 16 | rng.integers(0, C, (B, k)))
        .astype(np.int32))

    @jax.jit
    def gather_2index():
        w_pid = refs >> 16
        w_slot = refs & 0xFFFF
        vecs = codes[w_pid, w_slot]
        return jnp.sum(vecs)

    @jax.jit
    def gather_flat():
        w_pid = refs >> 16
        w_slot = refs & 0xFFFF
        vecs = jnp.take(codes.reshape(P * C, D), w_pid * C + w_slot, axis=0)
        return jnp.sum(vecs)

    @jax.jit
    def topk_160():
        m = jax.random.uniform(jax.random.PRNGKey(0), (B, 160))
        s, i = lax.top_k(m, k)
        return jnp.sum(s) + jnp.sum(i)

    variants = [
        ("v9_full_qt64", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)),
        ("v9_full_qt64_bf16", lambda: grouped_scan_pallas_v9(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4)),
        ("gather_2index", gather_2index),
        ("gather_flat", gather_flat),
        ("topk_160", topk_160),
        ("fused_v9_qt64_f32", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
        ("fused_v9_qt64_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
        ("fused_v9_qt32_f32", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=32, group_chunk=64, kernel="v9")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
