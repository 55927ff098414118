"""A/B round 28: decompose the parent+glue band (~1.3 ms of the 6.75 ms
fused v10 step, ab26/ab27) and cost the sort-based placement alternative.

Probes (same-run, two passes, in-jit output reduction):
  1. bounds_only     _global_bounds analytic (max reductions over q, norms)
  2. normsT_only     (norms + gmin) * ginv materialization [P, C]
  3. prescale_only   (qf * q_coef).astype(bf16) [B, D]
  4. qg_gather_only  q_scaled[safe_q] row gather -> [Gn, qt, D] bf16
  5. parent_only     rank_parents approx (matmul + approx_max_k)
  6. dists_only      scores_to_distances on [B, k]
  7. sort2_only      single-key int32 sort of [Gn*qt] (the v11 second sort:
                     key = qs * 2^17 + row; qs<=2^13, row<2^17 -> 30 bits)
  8. rowtake_only    one [n]-row take from [Gn*qt, kk] (v11 placement gather)
  9. pidsort_only    per-query ascending sort of pids [B, nprobe] (v11 winner
                     pid recovery)
 10. place_scatter   the v10 row scatter (ab26 re-anchor)
 11. v10_full / fused_v10 anchors

If (7)+(8)+(9) < (10), a v11 "sorted placement" epilogue is worth building:
sort kernel rows by owning query, take rows into [B, nprobe, kk] (dense
fixed-nprobe case: run starts are static), recover winner pids from the
per-query ascending pid sort (rows within a query sort in partition-major
order, so pool position j//kk indexes the query's pids ascending).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab28.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from quake_tpu.coordinator import fused_ivf_search, rank_parents
    from quake_tpu.ops.grouped import build_groups_scatter
    from quake_tpu.ops import pallas_grouped as pg
    from quake_tpu.ops.scan import scores_to_distances

    # Round-3 session-D bench shape (nlist=512 operating point, B=8192).
    D, k, B = 128, 10, 8192
    P, C = 512, 2816
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D, fill=0.72)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    nprobe = 14
    pids = jnp.asarray(rng.integers(0, P, (B, nprobe)).astype(np.int32))
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)
    pc = cents.reshape(1, P, D)
    pid_arr = jnp.arange(P, dtype=jnp.int32).reshape(1, P)
    n = B * nprobe
    qt = 64
    kk = k

    gp, ql, tgt = build_groups_scatter(pids, P, qt)
    G = gp.shape[0]
    Gn = -(-G // 4) * 4
    R = Gn * qt
    tgt_p = jnp.pad(tgt, ((0, Gn - G), (0, 0)), constant_values=n)
    ql_p = jnp.pad(ql, ((0, Gn - G), (0, 0)), constant_values=-1)
    safe_q = jnp.where(ql_p >= 0, ql_p, 0)
    rows = jnp.asarray(rng.standard_normal((R, kk)).astype(np.float32))
    qs_flat = jnp.where(tgt_p.reshape(-1) < n,
                        tgt_p.reshape(-1) // nprobe, B).astype(jnp.int32)
    take_idx = jnp.asarray(rng.permutation(R)[:n].astype(np.int32))
    topk_scores = jnp.asarray(-np.abs(rng.standard_normal((B, k))).astype(np.float32))
    topk_ids = jnp.asarray(rng.integers(0, P * C, (B, k)).astype(np.int32))

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
    def bounds_only(q_in, norms_in):
        gmin, grange = pg._global_bounds(q_in, codes_bf, norms_in, sizes,
                                         "l2", "analytic")
        return gmin + grange

    @jax.jit
    def normsT_only(norms_in, q_in):
        gmin, grange = pg._global_bounds(q_in, codes_bf, norms_in, sizes,
                                         "l2", "analytic")
        ginv = 8190.0 / grange
        normsT = (norms_in + gmin) * ginv
        return jnp.sum(normsT.reshape(P, 1, C)[:, 0, :1])

    @jax.jit
    def prescale_only(q_in):
        return jnp.sum((q_in * 2.0).astype(jnp.bfloat16).astype(jnp.float32)[:, :1])

    @jax.jit
    def qg_gather_only(q_in, sq_in):
        q_scaled = (q_in * 2.0).astype(jnp.bfloat16)
        qg = q_scaled[sq_in]  # [Gn, qt, D]
        return jnp.sum(qg.astype(jnp.float32)[:, :, :1])

    @jax.jit
    def parent_only(q_in):
        pids_out = rank_parents(pc, pid_arr, None, q_in, nprobe, "l2")
        return jnp.sum(pids_out[:, :1])

    @jax.jit
    def dists_only(s_in, i_in):
        return jnp.sum(scores_to_distances(s_in, i_in, "l2")[:, :1])

    @jax.jit
    def sort2_only(qs_in):
        # uint32 packing: qs <= B (14 bits) + row (18 bits at this shape).
        r_iota = jnp.arange(R, dtype=jnp.uint32)
        key2 = qs_in.astype(jnp.uint32) * jnp.uint32(1 << 18) + r_iota
        ks = jnp.sort(key2)
        return jnp.sum(ks[:1].astype(jnp.int32))

    @jax.jit
    def rowtake_only(rows_in, idx_in):
        m = jnp.take(rows_in, idx_in, axis=0)
        return jnp.sum(m[:, :1])

    @jax.jit
    def pidsort_only(pids_in):
        sp = jnp.sort(jnp.where(pids_in >= 0, pids_in, jnp.int32(2**30)), axis=1)
        return jnp.sum(sp[:, :1])

    @jax.jit
    def place_scatter(rows_in, tgt_in):
        mp = jnp.full((n + 1, kk), -1.0, jnp.float32).at[
            tgt_in.reshape(-1)].set(rows_in, mode="drop")
        return jnp.sum(mp[:n, :1])

    @jax.jit
    def sort2_take(rows_in, qs_in):
        # The full v11 placement: second sort + row take + reshape.
        r_iota = jnp.arange(R, dtype=jnp.uint32)
        key2 = qs_in.astype(jnp.uint32) * jnp.uint32(1 << 18) + r_iota
        ks = jnp.sort(key2)
        r_sorted = (ks & jnp.uint32((1 << 18) - 1)).astype(jnp.int32)[:n]
        m = jnp.take(rows_in, r_sorted, axis=0)
        return jnp.sum(m[:, :1])

    variants = [
        ("bounds_only", bounds_only, q, norms_bf),
        ("normsT_only", normsT_only, norms_bf, q),
        ("prescale_only", prescale_only, q),
        ("qg_gather_only", qg_gather_only, q, safe_q),
        ("parent_only", parent_only, q),
        ("dists_only", dists_only, topk_scores, topk_ids),
        ("sort2_only", sort2_only, qs_flat),
        ("rowtake_only", rowtake_only, rows, take_idx),
        ("pidsort_only", pidsort_only, pids),
        ("place_scatter", place_scatter, rows, tgt_p),
        ("sort2_take", sort2_take, rows, qs_flat),
        ("v10_full_bf16", lambda: pg.grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=qt, gpb=4,
            exact=False)),
        ("fused_v10_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k,
            nprobe=nprobe, metric="l2", qt=qt, group_chunk=64,
            kernel="v10", exact=False)),
    ]
    for pass_no in (1, 2):
        for entry in variants:
            name, fn, *args = entry
            bench(f"{name}_p{pass_no}", fn, *args)
    print("done", flush=True)


if __name__ == "__main__":
    main()
