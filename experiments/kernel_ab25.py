"""A/B round 25: decompose the v10 pipeline and probe micro-opts.

Stages probed (all same-run, two passes, in-jit output reduction so the
sync transfers one scalar, not a result tensor):
  1. build_groups_scatter alone
  2. kernel+grouping with the epilogue DCE'd (sum of g_packed)
  3. epilogue-only proxy: full v10 minus (2)
  4. full v10 / fused v10
  5. rescore spelling: einsum vs elementwise multiply-sum
  6. merge backend under v10: pallas vs xla

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab25.py
"""

import functools
import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.grouped import build_groups_scatter
    from quake_tpu.ops import pallas_grouped as pg

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
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)
        return out, ms

    # --- probes ---
    @jax.jit
    def groups_only(pids):
        gp, ql, tgt = build_groups_scatter(pids, P, 64)
        return (jnp.sum(gp) + jnp.sum(ql) + jnp.sum(tgt)).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=("qt", "gpb"))
    def kernel_no_epilogue(codes_in, norms_in, q_in, pids_in, qt=64, gpb=4):
        """v10 with the epilogue DCE'd: returns sum(g_packed)."""
        kk = min(k, C)
        slot_mult = max(1 << (int(C - 1).bit_length()), 2)
        levels = (1 << 24) // slot_mult - 2
        qf = q_in.astype(jnp.float32)
        gmin, grange = pg._global_bounds(qf, codes_in, norms_in, sizes, "l2",
                                         "analytic")
        ginv = float(levels) / grange
        normsT = (norms_in + gmin) * ginv
        gp, ql, tgt = build_groups_scatter(pids_in, P, qt)
        G = gp.shape[0]
        Gn = -(-G // gpb) * gpb
        gp2 = jnp.pad(gp, (0, Gn - G), constant_values=-1)
        ql2 = jnp.pad(ql, ((0, Gn - G), (0, 0)), constant_values=-1)
        gsz = jnp.where(gp2 >= 0, sizes[jnp.maximum(gp2, 0)], 0).astype(jnp.int32)
        safe_q = jnp.where(ql2 >= 0, ql2, 0)
        qg = (qf * (2.0 * ginv)).astype(codes_in.dtype)[safe_q]
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def slab_spec(j):
            return pl.BlockSpec((1, C, D),
                                lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0))

        def norms_spec(j):
            return pl.BlockSpec((1, 1, C),
                                lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0))

        kern = pg._v9_kernel(kk, slot_mult, levels, gpb, 128)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Gn // gpb,),
            in_specs=([pl.BlockSpec((gpb, 64, D), lambda g, gp_, gs: (g, 0, 0))]
                      + [slab_spec(j) for j in range(gpb)]
                      + [norms_spec(j) for j in range(gpb)]),
            out_specs=[pl.BlockSpec((gpb, 64, kk), lambda g, gp_, gs: (g, 0, 0))],
            scratch_shapes=[pltpu.VMEM((gpb * 64, 128), jnp.float32),
                            pltpu.VMEM((gpb * 64, 128), jnp.float32)],
        )
        (g_packed,) = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Gn, 64, kk), jnp.float32)],
        )(gp2, gsz, qg, *([codes_in] * gpb), *([normsT.reshape(P, 1, C)] * gpb))
        return jnp.sum(g_packed)

    # rescore spellings on a winner-shaped input
    refs = jnp.asarray(
        (rng.integers(0, P, (B, k)) << 16 | rng.integers(0, C, (B, k))
         ).astype(np.int32))

    @jax.jit
    def rescore_einsum(refs, q_in):
        w_pid = refs >> 16
        w_slot = refs & 0xFFFF
        vecs = pg._flat_row_take(codes, w_pid, w_slot).astype(jnp.float32)
        qf = q_in.astype(jnp.float32)
        prod = jnp.einsum("bkd,bd->bk", vecs, qf)
        return jnp.sum(prod)

    @jax.jit
    def rescore_vpu(refs, q_in):
        w_pid = refs >> 16
        w_slot = refs & 0xFFFF
        vecs = pg._flat_row_take(codes, w_pid, w_slot).astype(jnp.float32)
        qf = q_in.astype(jnp.float32)
        prod = jnp.sum(vecs * qf[:, None, :], axis=2)
        return jnp.sum(prod)

    variants = [
        ("groups_only", lambda: groups_only(pids)),
        ("kernel_no_epilogue_bf16", lambda: kernel_no_epilogue(
            codes_bf, norms_bf, q, pids)),
        ("v10_full_bf16", lambda: pg.grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4)),
        ("v10_full_bf16_xlamerge", lambda: pg.grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4,
            merge="xla")),
        ("fused_v10_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v10")),
        ("rescore_einsum", lambda: rescore_einsum(refs, q)),
        ("rescore_vpu", lambda: rescore_vpu(refs, q)),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
