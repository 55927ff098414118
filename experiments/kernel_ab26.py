"""A/B round 26: decompose the v10 epilogue (~3.3 ms of 6.5 standalone,
ab25) and probe row-placement alternatives.

Probes (same-run, two passes, in-jit output reduction):
  1. groups_scatter_only      build_groups_scatter alone (pass-2 number;
                              ab25's 7.4 ms pass-1 read was the first-
                              variant warmup artifact)
  2. place_scatter            [rows -> pair-major] via one row .at[].set
                              (the v10 epilogue's placement)
  3. place_gather             same placement via one flattened row take
                              through the inverse permutation
                              (build_groups' pair_group/pair_slot)
  4. rescore_only             _exact_rescore on winner-shaped refs
  5. pool_merge_only          pool-side packed merge ([B, poolp] max2) +
                              position extraction
  6. v10_full / fused_v10     anchors

All data tensors are jit ARGUMENTS (ab25's rescore probe embedded the
800 MB codes tensor as a compile-time constant and blew the remote-compile
request limit).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab26.py
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
    from quake_tpu.ops.grouped import build_groups, build_groups_scatter
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
    nprobe = 16
    n = B * nprobe
    qt = 64

    # Shared precomputed shapes for the placement probes: kernel-output-
    # shaped rows and both placement indexings from the same pids.
    gp, ql, tgt = build_groups_scatter(pids, P, qt)
    G = gp.shape[0]
    Gn = -(-G // 4) * 4
    tgt_p = jnp.pad(tgt, ((0, Gn - G), (0, 0)), constant_values=n)
    _, _, pair_group, pair_slot = build_groups(pids, P, qt)
    rows = jnp.asarray(rng.standard_normal((Gn * qt, k)).astype(np.float32))
    kk = k

    def bench(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    @jax.jit
    def groups_scatter_only(pids_in):
        gp_, ql_, tgt_ = build_groups_scatter(pids_in, P, qt)
        return (jnp.sum(gp_) + jnp.sum(ql_) + jnp.sum(tgt_)).astype(jnp.int32)

    @jax.jit
    def place_scatter(rows_in, tgt_in):
        mp = jnp.full((n + 1, kk), -1.0, jnp.float32).at[
            tgt_in.reshape(-1)].set(rows_in, mode="drop")
        return jnp.sum(mp[:n])

    @jax.jit
    def place_gather(rows_in, pg_in, ps_in):
        flat_idx = (pg_in * qt + ps_in).reshape(-1)  # [n] kernel-row index
        ok = (pg_in >= 0).reshape(-1)
        m = rows_in[jnp.clip(flat_idx, 0, rows_in.shape[0] - 1)]
        m = jnp.where(ok[:, None], m, -1.0)
        return jnp.sum(m)

    refs = jnp.asarray(
        ((rng.integers(0, P, (B, k)) << 16) | rng.integers(0, C, (B, k))
         ).astype(np.int32))

    @jax.jit
    def rescore_only(refs_in, codes_in, ids_in, norms_in, q_in):
        s, i, _ = pg._exact_rescore(refs_in, codes_in, ids_in, norms_in, q_in,
                                    k, k, "l2", pids)
        return jnp.sum(s) + jnp.sum(i)

    pool = nprobe * kk
    poolp = -(-pool // 128) * 128
    mk = jnp.asarray(rng.standard_normal((B, poolp)).astype(np.float32))

    @jax.jit
    def pool_merge_only(mk_in):
        pos = pg._merge_positions_pallas(mk_in, k, max(poolp, 2), 128)
        return jnp.sum(pos)

    variants = [
        ("groups_scatter_only", groups_scatter_only, pids),
        ("place_scatter", place_scatter, rows, tgt_p),
        ("place_gather", place_gather, rows, pair_group, pair_slot),
        ("rescore_only", rescore_only, refs, codes_bf, ids, norms_bf, q),
        ("pool_merge_only", pool_merge_only, mk),
        ("v10_full_bf16", lambda: pg.grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=qt, gpb=4)),
        ("fused_v10_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k,
            nprobe=nprobe, metric="l2", qt=qt, group_chunk=64,
            kernel="v10")),
    ]
    for pass_no in (1, 2):
        for entry in variants:
            name, fn, *args = entry
            bench(f"{name}_p{pass_no}", fn, *args)
    print("done", flush=True)


if __name__ == "__main__":
    main()
