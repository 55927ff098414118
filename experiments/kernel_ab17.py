"""A/B round 17 (round 3): decompose the fused band around the v9 kernel.

ab16: v9 qt64 standalone 9.45 ms (bf16 9.09) but fused 10.91 — a 1.46 ms
fused gap where the parent approx scan alone is 0.53. Also bg_full is 1.36
of which sort+offs+inv explain only ~0.45 — the qlist/p_of_g stage holds
~0.9 ms. This run isolates: kernel+grouping without epilogue (raw), the
epilogue (full - raw), parent+dists in isolation, a p_of_g variant that
replaces searchsorted with scatter+cumsum, and the best fused combo with
bf16 codes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab17.py
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
    from quake_tpu.ops.grouped import _build_groups_sort, group_layout
    from quake_tpu.ops.pallas_grouped import (
        _v9_kernel,
        build_groups,
        grouped_scan_pallas_v9,
    )
    from quake_tpu.ops.scan import flat_scan, scores_to_distances
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

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

    # --- raw kernel+grouping (v9 without the merge/rescore epilogue) ---
    @functools.partial(jax.jit, static_argnames=("qt", "gpb"))
    def v9_raw(codes_in, norms_in, qt=64, gpb=4):
        kk = k
        slot_mult = 2048
        levels = (1 << 24) // slot_mult - 2
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=1)
        maxq2 = jnp.max(q_sq)
        maxx2 = jnp.maximum(jnp.max(norms_in), 1e-12)
        maxqx = jnp.sqrt(maxq2) * jnp.sqrt(maxx2)
        gmin = -(maxx2 + 2.0 * maxqx)
        grange = jnp.maximum(maxq2 - gmin, 1e-20)
        ginv = float(levels) / grange
        normsT = (norms_in + gmin) * ginv
        group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
        G = group_pid.shape[0]
        Gn = -(-G // gpb) * gpb
        gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
        ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
        group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
        safe_q = jnp.where(ql >= 0, ql, 0)
        qg = (qf * ginv).astype(codes_in.dtype)[safe_q]

        def slab_spec(j):
            return pl.BlockSpec(
                (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0))

        def norms_spec(j):
            return pl.BlockSpec(
                (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0))

        kernel = _v9_kernel(kk, slot_mult, levels, gpb, 128)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Gn // gpb,),
            in_specs=([pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
                      + [slab_spec(j) for j in range(gpb)]
                      + [norms_spec(j) for j in range(gpb)]),
            out_specs=[pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0))],
            scratch_shapes=[pltpu.VMEM((gpb * qt, 128), jnp.float32),
                            pltpu.VMEM((gpb * qt, 128), jnp.float32)],
        )
        (g_packed,) = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32)],
        )(gp, group_size, qg, *([codes_in] * gpb),
          *([normsT.reshape(P, 1, C)] * gpb))
        return jnp.sum(g_packed)

    @jax.jit
    def parent_dists():
        _, cand = flat_scan(q, cents, jnp.arange(P, dtype=jnp.int32), 16,
                            "l2", approx=True)
        d_ = scores_to_distances(jnp.zeros((B, k)) - 1.0,
                                 jnp.zeros((B, k), jnp.int32), "l2")
        return jnp.sum(cand) + jnp.sum(d_)

    # --- bg variant: p_of_g via scatter+cumsum instead of searchsorted ---
    @jax.jit
    def bg_scatter_pog():
        qt = 64
        n = B * 16
        flat_pid = pids.reshape(-1)
        iota_n = jnp.arange(n, dtype=jnp.int32)
        G = group_layout(B, 16, P, qt)
        key_sorted = jnp.sort((flat_pid + 1) * n + iota_n)
        p_sorted = key_sorted // n - 1
        order = key_sorted - (p_sorted + 1) * n
        offs = jnp.searchsorted(
            key_sorted, (jnp.arange(P + 1, dtype=jnp.int32) + 1) * n
        ).astype(jnp.int32)
        counts = offs[1:] - offs[:-1]
        groups_of = (counts + qt - 1) // qt
        gbase = jnp.cumsum(groups_of) - groups_of
        total_groups = gbase[-1] + groups_of[-1]
        # p_of_g by scatter-max + cummax: each populated partition stamps
        # p+1 at its first group slot; the running max fills its run.
        p_iota = jnp.arange(P, dtype=jnp.int32)
        marks = jnp.zeros((G + 1,), jnp.int32).at[
            jnp.where(groups_of > 0, gbase, G)].max(p_iota + 1, mode="drop")
        p_of_g = lax.cummax(marks[:G]) - 1
        p_of_g = jnp.clip(p_of_g, 0, P - 1)
        g_iota = jnp.arange(G, dtype=jnp.int32)
        g_valid = g_iota < total_groups
        group_pid = jnp.where(g_valid, p_of_g, -1)
        tile = g_iota - gbase[p_of_g]
        start = offs[p_of_g] + tile * qt
        lane = jnp.arange(qt, dtype=jnp.int32)
        pos = start[:, None] + lane[None, :]
        in_run = pos < (offs[p_of_g] + counts[p_of_g])[:, None]
        qs = order[jnp.clip(pos, 0, n - 1)] // 16
        qlist = jnp.where(g_valid[:, None] & in_run, qs, -1)
        inv = jnp.zeros((n,), jnp.int32).at[order].set(iota_n)
        rank = inv.reshape(B, 16) - offs[jnp.clip(pids, 0, P - 1)]
        ok = pids >= 0
        pair_group = jnp.where(
            ok, gbase[jnp.clip(pids, 0, P - 1)] + rank // qt, -1).astype(jnp.int32)
        pair_slot = jnp.where(ok, rank % qt, 0).astype(jnp.int32)
        return (jnp.sum(group_pid) + jnp.sum(qlist) + jnp.sum(pair_group)
                + jnp.sum(pair_slot))

    @jax.jit
    def bg_current():
        out = _build_groups_sort(pids, P, 64)
        return sum(jnp.sum(o) for o in out)

    variants = [
        ("v9_full_qt64", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)),
        ("v9_raw_qt64", lambda: v9_raw(codes, norms)),
        ("v9_raw_qt64_bf16", lambda: v9_raw(codes_bf, norms_bf)),
        ("parent_dists", parent_dists),
        ("bg_current_qt64", bg_current),
        ("bg_scatter_pog_qt64", bg_scatter_pog),
        ("fused_v9_qt64_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
        ("fused_v9_qt64_f32", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    # correctness: scatter-pog sum must equal current grouping's sum
    sa = float(np.asarray(bg_current()))
    sb = float(np.asarray(bg_scatter_pog()))
    print(json.dumps({"bg_sums_equal": sa == sb, "a": sa, "b": sb}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
