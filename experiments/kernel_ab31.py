"""A/B round 31: parent-ranking backend at the nlist=512 bench shape, and
B=16384 amortization.

The fused-minus-standalone delta at B=8192 is ~1.5 ms (ab30: 8.85 fused vs
7.35 standalone) — mostly the XLA matmul + approx_max_k parent. The Pallas
parent (ops/pallas_flat.py) lost at B=4096/nlist=1024 (0.70 vs 0.53 ms,
kernel_ab14); at B=8192/nlist=512 the reducer shape changed enough to
retry. Also anchors fused v11 at B=16384 (does batch amortization keep
paying past 8192?).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab31.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search, rank_parents

    D, k = 128, 10
    P, C = 512, 2816
    nprobe = 13
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D, fill=0.72)
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)
    pc = cents.reshape(1, P, D)
    pid_arr = jnp.arange(P, dtype=jnp.int32).reshape(1, P)
    pnorms = jnp.sum(jnp.asarray(cents) ** 2, axis=1).reshape(1, P)

    qs = {}
    for B in (8192, 16384):
        qs[B] = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

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
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    @jax.jit
    def parent_approx(q_in):
        return jnp.sum(rank_parents(pc, pid_arr, None, q_in, nprobe,
                                    "l2", "approx")[:, :1])

    @jax.jit
    def parent_pallas(q_in):
        return jnp.sum(rank_parents(pc, pid_arr, pnorms, q_in, nprobe,
                                    "l2", "pallas")[:, :1])

    def fused(B, pk):
        def run():
            out = fused_ivf_search(
                codes_bf, ids, sizes, norms_bf, pc, pid_arr, qs[B], k=k,
                nprobe=nprobe, metric="l2", qt=64, group_chunk=64,
                kernel="v11", exact=False,
                parent_norms=(pnorms if pk == "pallas" else None),
                parent_kernel=pk)
            return jnp.sum(out[0][:, :1])
        return run

    variants = [
        ("parent_approx_B8192", lambda: parent_approx(qs[8192])),
        ("parent_pallas_B8192", lambda: parent_pallas(qs[8192])),
        ("fused_approx_B8192", fused(8192, "approx")),
        ("fused_pallas_B8192", fused(8192, "pallas")),
        ("fused_approx_B16384", fused(16384, "approx")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
