"""Pallas TPU kernel for the partition-major grouped scan.

One grid step per group: the group's partition slab is DMA'd HBM->VMEM by the
pipeline (BlockSpec indexed by the scalar-prefetched group->partition array —
so only probed partitions are ever read), the [QT, D] x [D, C] distance
matmul runs on the MXU, and a fused top-k selects per-query results in VMEM.

This is the TPU replacement for the reference's hot loop
(scan_list/batched_scan_list, list_scanning.h:241-366): instead of a SIMD
loop per vector feeding a TopkBuffer, one MXU matmul per (partition,
query-tile) group with on-chip selection. Zero intermediate HBM traffic:
each probed partition is read exactly once per batch.

Top-k is k rounds of (max, one-hot select, mask) — avoids dynamic gathers,
which Mosaic does not lower efficiently; k is small (<=128) so the VPU cost
is negligible next to the matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quake_tpu.ops.grouped import _merge_groups, build_groups
NEG_INF = float("-inf")


def _pair_take(arr3, pg, pair_slot):
    """Row-gather arr3[pg, pair_slot] -> [B, nprobe, k] via a FLATTENED
    single-axis take. The natural advanced-indexing spelling (two index
    dims) lowers to a slow XLA gather path on TPU — the flattened row
    gather is the fast one (kernel_ab18: the epilogue's pair gathers were
    the dominant share of a 5.7 ms epilogue at bench shape)."""
    G, qt, kk = arr3.shape
    return jnp.take(arr3.reshape(G * qt, kk), pg * qt + pair_slot, axis=0)


def _flat_row_take(arr2d_as_PC, idx_pid, idx_slot):
    """codes/ids/norms[pid, slot] via flattened single-axis take (see
    _pair_take)."""
    C = arr2d_as_PC.shape[1]
    flat = arr2d_as_PC.reshape((-1,) + arr2d_as_PC.shape[2:])
    return jnp.take(flat, idx_pid * C + idx_slot, axis=0)


def _grouped_kernel(metric: str, k: int):
    def kernel(group_pid_ref, qg_ref, slab_ref, sids_ref, out_s_ref, out_i_ref):
        g = pl.program_id(0)
        pid = group_pid_ref[g]
        qg = qg_ref[0]  # [QT, D]
        slab = slab_ref[0]  # [C, D]
        sids = sids_ref[0, 0]  # [C] int32 (block [1, 1, C])

        prod = jax.lax.dot_general(
            qg,
            slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QT, C]
        if metric == "l2":
            qf = qg.astype(jnp.float32)
            sf = slab.astype(jnp.float32)
            q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)  # [QT, 1]
            s_sq = jnp.sum(sf * sf, axis=1)  # [C]
            scores = 2.0 * prod - q_sq - s_sq[None, :]
        else:
            scores = prod

        valid = (sids >= 0)[None, :] & (pid >= 0)
        scores = jnp.where(valid, scores, NEG_INF)

        QT, C = scores.shape
        sids_b = jnp.broadcast_to(sids[None, :], (QT, C))
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)

        def select_round(i, carry):
            # Masked-lane accumulation: Mosaic cannot store to a dynamic
            # minor-dim column, so build [QT, k] outputs in the carry with
            # (lane == i) selects and write once after the loop.
            # Tie-break by max id (ties = duplicate vectors); the mask
            # clears exactly the (score, id) winner, so duplicates surface
            # on subsequent rounds — exact semantics, fewer VPU passes than
            # a leftmost-column tie-break.
            scores_c, outv, outi = carry
            best = jnp.max(scores_c, axis=1, keepdims=True)  # [QT, 1]
            is_best = scores_c == best
            best_id = jnp.max(jnp.where(is_best, sids_b, -1), axis=1, keepdims=True)
            winner = is_best & (sids_b == best_id)
            best_id = jnp.where(best == NEG_INF, -1, best_id)
            lane = out_lane == i
            outv = jnp.where(lane, best, outv)
            outi = jnp.where(lane, best_id, outi)
            return jnp.where(winner, NEG_INF, scores_c), outv, outi

        init = (
            scores,
            jnp.full((QT, k), NEG_INF, jnp.float32),
            jnp.full((QT, k), -1, jnp.int32),
        )
        _, outv, outi = lax.fori_loop(0, k, select_round, init)
        out_s_ref[0] = outv
        out_i_ref[0] = outi

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "metric", "qt", "interpret"))
def grouped_scan_pallas(codes, ids, q, pids, k: int, metric: str, qt: int = 64,
                        interpret: bool = False):
    """Drop-in replacement for grouped_scan_xla on TPU.

    codes [P, C, D], ids [P, C], q [B, D], pids [B, nprobe] int32.
    Returns (scores [B, k], ids [B, k], partitions_scanned [B]).
    """
    B, D = q.shape
    P, C, _ = codes.shape
    kk = min(k, C)
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]

    # Pre-gather the query tiles (small: G*QT*D).
    safe_q = jnp.where(qlist >= 0, qlist, 0)
    qg = q.astype(codes.dtype)[safe_q]  # [G, QT, D]
    # Mask padded query slots by zeroing — their results are dropped by the
    # epilogue (pair_group == -1 never points at them), but keep scores
    # finite to avoid NaNs.
    kernel = _grouped_kernel(metric, kk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, qt, D), lambda g, gp: (g, 0, 0)),
            pl.BlockSpec((1, C, D), lambda g, gp: (jnp.maximum(gp[g], 0), 0, 0)),
            pl.BlockSpec((1, 1, C), lambda g, gp: (jnp.maximum(gp[g], 0), 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qt, kk), lambda g, gp: (g, 0, 0)),
            pl.BlockSpec((1, qt, kk), lambda g, gp: (g, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((G, qt, kk), jnp.int32),
    ]
    g_scores, g_ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(group_pid, qg, codes, ids.reshape(P, 1, C))

    return _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k, kk)


def _v3_kernel(metric: str, k: int):
    """v3 slot-selection kernel body: ~3 VPU passes per top-k round vs ~6
    for v2's id-disambiguating rounds.

    Three changes vs v2 (list_scanning.h:241-366 is the reference hot loop):
      * selection emits (score, slot) with max-slot tie-break — slots are
        unique per lane so no id-disambiguation passes; slot -> vector id is
        one small epilogue gather, and the ids array never enters the kernel.
      * validity comes from the compact-prefix invariant (lane < size via
        scalar-prefetched sizes) instead of an id compare.
      * the l2 ||x||^2 term reads the store's cached norms (StoreState.norms)
        instead of a full [C, D] in-kernel reduction, and the rank-invariant
        per-query ||q||^2 shift moves to the epilogue.
    """

    def kernel(group_pid_ref, group_size_ref, qg_ref, slab_ref, norms_ref,
               out_s_ref, out_i_ref):
        g = pl.program_id(0)
        size = group_size_ref[g]  # 0 when the group slot is unused
        qg = qg_ref[0]  # [QT, D]
        slab = slab_ref[0]  # [C, D]
        prod = jax.lax.dot_general(
            qg,
            slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QT, C]
        if metric == "l2":
            s_sq = norms_ref[0, 0]  # [C]
            scores = 2.0 * prod - s_sq[None, :]
        else:
            scores = prod

        QT, C = scores.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
        scores = jnp.where(lane < size, scores, NEG_INF)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)

        def select_round(i, carry):
            scores_c, outv, outi = carry
            best = jnp.max(scores_c, axis=1, keepdims=True)  # [QT, 1]
            best_slot = jnp.max(
                jnp.where(scores_c == best, lane, -1), axis=1, keepdims=True
            )
            sel = out_lane == i
            outv = jnp.where(sel, best, outv)
            outi = jnp.where(
                sel, jnp.where(best == NEG_INF, -1, best_slot), outi
            )
            return (
                jnp.where(lane == best_slot, NEG_INF, scores_c),
                outv,
                outi,
            )

        init = (
            scores,
            jnp.full((QT, k), NEG_INF, jnp.float32),
            jnp.full((QT, k), -1, jnp.int32),
        )
        _, outv, outi = lax.fori_loop(0, k, select_round, init)
        out_s_ref[0] = outv
        out_i_ref[0] = outi

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "metric", "qt", "interpret"))
def grouped_scan_pallas_v3(codes, ids, sizes, norms, q, pids, k: int,
                           metric: str, qt: int = 32, interpret: bool = False):
    """v3 grouped scan: slot selection + cached norms + size masking.

    Additional inputs vs grouped_scan_pallas: sizes [P] int32 (compact-prefix
    lengths) and norms [P, C] f32 (cached squared norms). Exact semantics
    (ties among equal scores break by max slot instead of v2's max id).
    Returns (scores [B, k], ids [B, k], partitions_scanned [B]).
    """
    B, D = q.shape
    P, C, _ = codes.shape
    kk = min(k, C)
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    group_size = jnp.where(
        group_pid >= 0, sizes[jnp.maximum(group_pid, 0)], 0
    ).astype(jnp.int32)
    safe_q = jnp.where(qlist >= 0, qlist, 0)
    q_cast = q.astype(codes.dtype)
    qg = q_cast[safe_q]  # [G, QT, D]

    kernel = _v3_kernel(metric, kk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, qt, D), lambda g, gp, gs: (g, 0, 0)),
            pl.BlockSpec((1, C, D), lambda g, gp, gs: (jnp.maximum(gp[g], 0), 0, 0)),
            pl.BlockSpec((1, 1, C), lambda g, gp, gs: (jnp.maximum(gp[g], 0), 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qt, kk), lambda g, gp, gs: (g, 0, 0)),
            pl.BlockSpec((1, qt, kk), lambda g, gp, gs: (g, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((G, qt, kk), jnp.int32),
    ]
    g_scores, g_slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(group_pid, group_size, qg, codes, norms.reshape(P, 1, C))

    # Epilogue: slot -> vector id (small gather), add the per-query ||q||^2
    # shift back for l2 (-inf rows stay -inf).
    if metric == "l2":
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=1)  # [B]
        g_scores = g_scores - q_sq[safe_q][:, :, None]
    gpid_b = jnp.broadcast_to(
        jnp.maximum(group_pid, 0)[:, None, None], g_slots.shape
    )
    g_ids = ids[gpid_b, jnp.maximum(g_slots, 0)]
    g_ids = jnp.where(g_slots >= 0, g_ids, -1)
    return _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k, kk)


def _v3p_kernel(metric: str, k: int, slot_mult: int, levels: int):
    """v3p float-packed selection kernel body: 2 VPU passes per round.

    Packs a per-row range-quantized score key with the lane (slot) index as
    key * slot_mult + lane — all float arithmetic on exactly-representable
    integers < 2^24, so the int-bitwise lowering that sank the int32 packed
    variant never appears. Packed values are unique per lane: each round is
    max -> write -> compare-clear. Score quantization (range/levels) only
    affects near-tie selection at the k boundary; the wrapper rescores the
    winners exactly, and per-row (rowmin, range) stats are emitted so the
    epilogue can dequantize for the cross-group merge.
    """

    def kernel(group_pid_ref, group_size_ref, qg_ref, slab_ref, norms_ref,
               out_ref, stats_ref):
        g = pl.program_id(0)
        out, stats = _v3p_group_body(
            qg_ref[0], slab_ref[0], norms_ref[0, 0], group_size_ref[g],
            metric, k, slot_mult, levels,
        )
        out_ref[0] = out
        stats_ref[0] = stats

    return kernel


def _v3p_group_body(qg, slab, s_sq, size, metric: str, k: int,
                    slot_mult: int, levels: int):
    """One group's v3p work: matmul -> quantize-pack -> k packed rounds.
    Returns (out [QT, k] packed f32, stats [QT, 2] = (rowmin, range))."""
    prod = jax.lax.dot_general(
        qg,
        slab,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = 2.0 * prod - s_sq[None, :] if metric == "l2" else prod
    return _v3p_select(scores, size, k, slot_mult, levels)


def _v3p_select(scores, size, k: int, slot_mult: int, levels: int):
    """Packed selection over a precomputed [QT, C] score matrix (lanes >=
    size invalid). Returns (packed [QT, k], stats [QT, 2])."""
    QT, C = scores.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
    valid = lane < size
    rowmax = jnp.max(jnp.where(valid, scores, NEG_INF), axis=1, keepdims=True)
    rowmin = jnp.min(jnp.where(valid, scores, jnp.inf), axis=1, keepdims=True)
    rng = jnp.maximum(rowmax - rowmin, 1e-20)  # all-invalid rows -> 1e-20
    qk = jnp.floor((scores - rowmin) * (float(levels) / rng))
    lane_f = lane.astype(jnp.float32)
    packed = qk * float(slot_mult) + lane_f
    packed = jnp.where(valid, packed, -1.0)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)

    def select_round(i, carry):
        packed_c, out = carry
        best = jnp.max(packed_c, axis=1, keepdims=True)
        out = jnp.where(out_lane == i, best, out)
        return jnp.where(packed_c == best, -1.0, packed_c), out

    init = (packed, jnp.full((QT, k), -1.0, jnp.float32))
    _, out = lax.fori_loop(0, k, select_round, init)
    # [QT, 2] stats via lane select (Mosaic-safe; no concatenate).
    stat_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, 2), 1)
    rm = jnp.where(jnp.isfinite(rowmin), rowmin, 0.0)
    stats = jnp.where(stat_lane == 0, rm, rng)
    return out, stats


@functools.partial(jax.jit, static_argnames=("k", "metric", "qt", "interpret"))
def grouped_scan_pallas_v3p(codes, ids, sizes, norms, q, pids, k: int,
                            metric: str, qt: int = 32,
                            interpret: bool = False):
    """v3p float-packed grouped scan with exact final rescoring.

    Same inputs/returns as grouped_scan_pallas_v3. Selection within a group
    is quantized to range/levels resolution (levels = 2^24 / next_pow2(C));
    the k winners per query are rescored exactly, so reported distances are
    exact — only membership at quantization-tied boundaries can differ.
    Requires P < 32768 and C <= 65536 (packed (pid, slot) refs).
    """
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v3p packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    group_size = jnp.where(
        group_pid >= 0, sizes[jnp.maximum(group_pid, 0)], 0
    ).astype(jnp.int32)
    safe_q = jnp.where(qlist >= 0, qlist, 0)
    qg = q.astype(codes.dtype)[safe_q]

    kernel = _v3p_kernel(metric, kk, slot_mult, levels)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, qt, D), lambda g, gp, gs: (g, 0, 0)),
            pl.BlockSpec((1, C, D), lambda g, gp, gs: (jnp.maximum(gp[g], 0), 0, 0)),
            pl.BlockSpec((1, 1, C), lambda g, gp, gs: (jnp.maximum(gp[g], 0), 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qt, kk), lambda g, gp, gs: (g, 0, 0)),
            pl.BlockSpec((1, qt, 2), lambda g, gp, gs: (g, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((G, qt, 2), jnp.float32),
    ]
    g_packed, g_stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(group_pid, group_size, qg, codes, norms.reshape(P, 1, C))
    return _v3p_epilogue(
        g_packed, g_stats, group_pid, pair_group, pair_slot, pids, safe_q,
        codes, ids, norms, q, k, kk, metric, slot_mult, levels,
    )


def _rescore_topk(m_scores, m_refs, codes, ids, norms, q, k: int, kk: int,
                  metric: str, pids, dedup: bool = False, exact: bool = True,
                  gmin=None, ginv=None):
    """Merge tail shared by the packed kernels: top-k by dequantized score,
    exact rescore of the winners (restores exact distances/order), reference
    -1/-inf padding (query_coordinator.cpp:447-456).

    dedup: for spilled stores (one vector resident in two partitions) the
    merged candidates can contain the same id twice. Take a 2k pool by
    approximate score, keep each id's first occurrence (copies are the SAME
    vector, so which copy survives is irrelevant), then rescore only the k
    survivors exactly — the dedup stage touches a [B, pool] id gather, not
    the [B, pool, D] vector gather."""
    B = q.shape[0]
    pool = min(2 * k if dedup else k, m_scores.shape[1])
    _, idx = lax.top_k(m_scores, pool)
    top_refs = jnp.take_along_axis(m_refs, idx, axis=1)

    if dedup:
        c_pid = jnp.maximum(top_refs >> 16, 0)
        c_ids = _flat_row_take(ids, c_pid, top_refs & 0xFFFF)
        c_ids = jnp.where(top_refs >= 0, c_ids, -1)
        earlier = (
            jax.lax.broadcasted_iota(jnp.int32, (pool, pool), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (pool, pool), 0)
        )
        same = c_ids[:, :, None] == c_ids[:, None, :]  # [B, i, j]
        is_dup = jnp.any(same & earlier[None] & (c_ids >= 0)[:, :, None],
                         axis=2)
        # Compact survivors to the front in approx order, keep k.
        keep_rank = jnp.cumsum((~is_dup).astype(jnp.int32), axis=1) - 1
        kfin = min(k, pool)
        lanek = jax.lax.broadcasted_iota(jnp.int32, (B, kfin), 1)
        sel = jnp.where(is_dup, pool, keep_rank)  # dups -> out of range
        # survivor j lands at keep_rank[j]: invert with argsort-free select
        refs_kept = jnp.full((B, kfin), -1, jnp.int32)
        match = (sel[:, None, :] == lanek[:, :, None])  # [B, kfin, pool]
        refs_kept = jnp.max(
            jnp.where(match, top_refs[:, None, :], -1), axis=2
        )
        if not exact:
            s_pool = jnp.take_along_axis(m_scores, idx, axis=1)
            keys_kept = jnp.max(
                jnp.where(match, s_pool[:, None, :], NEG_INF), axis=2
            )
        top_refs = refs_kept
    else:
        kfin = min(k, pool)
        if not exact:
            keys_kept = jnp.take_along_axis(m_scores, idx, axis=1)[:, :kfin]

    if exact:
        return _exact_rescore(top_refs, codes, ids, norms, q, k, kfin, metric,
                              pids)
    # Dequantized tail (see _scatter_epilogue exact=False): membership is
    # already fixed (kfin = k survivors); reconstruct scores from the
    # quantized key and gather only the id winners — the dedup path's
    # [B, kfin, D] vector gather disappears (the SOAR serving cost).
    score = (keys_kept + 0.5) / ginv + gmin
    if metric == "l2":
        score = score - jnp.sum(
            q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    w_safe = jnp.maximum(top_refs >> 16, 0)
    top_ids = _flat_row_take(ids, w_safe, top_refs & 0xFFFF)
    top_ids = jnp.where(top_refs >= 0, top_ids, -1)
    score = jnp.where(top_ids >= 0, score, NEG_INF)
    scores = score[:, :k]
    out_ids = top_ids[:, :k]
    if scores.shape[1] < k:
        padn = k - scores.shape[1]
        scores = jnp.pad(scores, ((0, 0), (0, padn)), constant_values=NEG_INF)
        out_ids = jnp.pad(out_ids, ((0, 0), (0, padn)), constant_values=-1)
    scanned = jnp.sum((pids >= 0).astype(jnp.int32), axis=1)
    return scores, out_ids, scanned


def _exact_rescore(top_refs, codes, ids, norms, q, k: int, kfin: int,
                   metric: str, pids):
    """Exact rescore of (pid, slot)-ref winners + reference padding."""
    w_pid = jnp.maximum(top_refs >> 16, 0)
    w_slot = top_refs & 0xFFFF
    vecs = _flat_row_take(codes, w_pid, w_slot).astype(jnp.float32)  # [B, kfin, D]
    qf = q.astype(jnp.float32)
    prod = jnp.einsum("bkd,bd->bk", vecs, qf)
    if metric == "l2":
        exact = (
            2.0 * prod
            - jnp.sum(qf * qf, axis=1, keepdims=True)
            - _flat_row_take(norms, w_pid, w_slot)
        )
    else:
        exact = prod
    top_ids = _flat_row_take(ids, w_pid, w_slot)
    top_ids = jnp.where(top_refs >= 0, top_ids, -1)
    exact = jnp.where(top_ids >= 0, exact, -jnp.inf)
    scores, order = lax.top_k(exact, min(kfin, max(k, 1)))
    out_ids = jnp.take_along_axis(top_ids, order, axis=1)
    scores = scores[:, :k]
    out_ids = out_ids[:, :k]
    out_ids = jnp.where(jnp.isfinite(scores), out_ids, -1)
    scores = jnp.where(out_ids >= 0, scores, -jnp.inf)
    if scores.shape[1] < k:
        padn = k - scores.shape[1]
        scores = jnp.pad(scores, ((0, 0), (0, padn)), constant_values=NEG_INF)
        out_ids = jnp.pad(out_ids, ((0, 0), (0, padn)), constant_values=-1)
    scanned = jnp.sum((pids >= 0).astype(jnp.int32), axis=1)
    return scores, out_ids, scanned


def _global_epilogue(g_packed, gp, group_size, pair_group, pair_slot, pids,
                     codes, ids, norms, q, k: int, kk: int, metric: str,
                     slot_mult: int, levels: int, dedup: bool,
                     pool_factor: int = 1, merge: str = "xla",
                     interpret: bool = False):
    """Shared v8/v9 epilogue. Because the quantized keys use ONE global
    scale, they are comparable across groups — the per-query merge runs
    directly in key domain (no dequantize, no per-row stats), and the
    [B, pool] merge uses a folded packed-round selection instead of
    lax.top_k (a [4096, 160] top_k alone measured 1.5 ms — kernel_ab18).
    The k winners are exact-rescored as always."""
    B = q.shape[0]
    alive = group_size > 0
    valid = (g_packed >= 0.0) & alive[:, None, None]
    slots = jnp.mod(g_packed, float(slot_mult)).astype(jnp.int32)
    keys = jnp.where(valid, jnp.floor(g_packed / float(slot_mult)), -1.0)
    gpid_b = jnp.broadcast_to(jnp.maximum(gp, 0)[:, None, None], slots.shape)
    refs = jnp.where(valid, (gpid_b << 16) | slots, -1)

    ok = pair_group >= 0
    pg = jnp.where(ok, pair_group, 0)
    m_keys = jnp.where(
        ok[:, :, None], _pair_take(keys, pg, pair_slot), -1.0
    ).reshape(B, -1)
    m_refs = jnp.where(
        ok[:, :, None], _pair_take(refs, pg, pair_slot), -1
    ).reshape(B, -1)

    pool = m_keys.shape[1]
    poolp = -(-pool // 128) * 128
    lane_mult = max(poolp, 2)
    if dedup or keys.shape[-1] < k or (levels * lane_mult + lane_mult
                                       ) >= (1 << 24):
        # Dedup pools (2k survivors of duplicate elimination) and oversized
        # pools keep the general top_k path; keys are per-row monotone so
        # they serve directly as merge scores.
        return _rescore_topk(m_keys, m_refs, codes, ids, norms, q, k, kk,
                             metric, pids, dedup=dedup)

    # pool_factor > 1 rescores a wider approx pool. Measured NEGATIVE as a
    # default (ab20: +1.4 ms for +0.0016 recall at bench shape — the
    # recall loss lives in the per-group selection, not the merge pool);
    # kept as a knob.
    kfin = min(pool_factor * k, pool)
    pad = poolp - pool
    mk = jnp.pad(m_keys, ((0, 0), (0, pad)), constant_values=-1.0)
    if merge == "pallas":
        pos = _merge_positions_pallas(mk, kfin, lane_mult, 128,
                                      interpret=interpret)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, poolp), 1)
        packed2 = jnp.where(mk >= 0.0,
                            mk * float(lane_mult) + lane.astype(jnp.float32),
                            -1.0)
        # Fold to 128 columns (S = poolp/128 <= 2 at nprobe 16 — lossless;
        # wider pools share the kernel's max2 approximation class).
        S = poolp // 128
        m1 = packed2[:, 0:128]
        m2 = jnp.full((B, 128), -1.0, jnp.float32)
        for j in range(1, S):
            seg = packed2[:, j * 128:(j + 1) * 128]
            m2 = jnp.maximum(m2, jnp.minimum(m1, seg))
            m1 = jnp.maximum(m1, seg)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, kfin), 1)

        def select_round(i, carry):
            m1c, m2c, out = carry
            best = jnp.max(m1c, axis=1, keepdims=True)
            out = jnp.where(out_lane == i, best, out)
            hit = m1c == best
            m1c = jnp.where(hit, m2c, m1c)
            m2c = jnp.where(hit, -1.0, m2c)
            return m1c, m2c, out

        init = (m1, m2, jnp.full((B, kfin), -1.0, jnp.float32))
        _, _, out = lax.fori_loop(0, kfin, select_round, init)
        pos = jnp.mod(out, float(lane_mult)).astype(jnp.int32)
        pos = jnp.where(out >= 0.0, pos, -1)
    top_refs = jnp.take_along_axis(m_refs, jnp.clip(pos, 0, pool - 1), axis=1)
    top_refs = jnp.where(pos >= 0, top_refs, -1)
    return _exact_rescore(top_refs, codes, ids, norms, q, k, kfin, metric,
                          pids)


def _v3p_epilogue(g_packed, g_stats, group_pid, pair_group, pair_slot, pids,
                  safe_q, codes, ids, norms, q, k: int, kk: int, metric: str,
                  slot_mult: int, levels: int, alive=None,
                  dedup: bool = False):
    """Shared v3p/v3p2 epilogue: decode packed winners, dequantize for the
    cross-group merge, exact-rescore the per-query top k.

    alive: optional [G] bool — groups whose kernel body ran (ghost-skipped
    groups hold stale VMEM and must be masked here)."""
    B = q.shape[0]
    # Decode: slot + dequantized approximate score (per-row scale).
    valid = g_packed >= 0.0
    if alive is not None:
        valid = valid & alive[:, None, None]
    slots = jnp.mod(g_packed, float(slot_mult)).astype(jnp.int32)
    keys = jnp.floor(g_packed / float(slot_mult))
    rowmin = g_stats[:, :, 0:1]
    rng = g_stats[:, :, 1:2]
    approx = rowmin + keys * (rng / float(levels))
    if metric == "l2":
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=1)
        approx = approx - q_sq[safe_q][:, :, None]
    approx = jnp.where(valid, approx, NEG_INF)
    gpid_b = jnp.broadcast_to(
        jnp.maximum(group_pid, 0)[:, None, None], slots.shape
    )
    refs = jnp.where(valid, (gpid_b << 16) | slots, -1)

    # Per-query merge by dequantized score, carrying (pid, slot) refs.
    ok = pair_group >= 0
    pg = jnp.where(ok, pair_group, 0)
    m_scores = jnp.where(
        ok[:, :, None], _pair_take(approx, pg, pair_slot), NEG_INF
    ).reshape(B, -1)
    m_refs = jnp.where(
        ok[:, :, None], _pair_take(refs, pg, pair_slot), -1
    ).reshape(B, -1)
    return _rescore_topk(m_scores, m_refs, codes, ids, norms, q, k, kk,
                         metric, pids, dedup=dedup)


def _v3pn_kernel(metric: str, k: int, slot_mult: int, levels: int, gpb: int,
                 skip: bool = False):
    """v3p body over GPB groups per grid step: divides the grid-step count
    (measured ~4us/step fixed cost on v5e against a ~1us DMA floor —
    per-step pipeline overhead, not bandwidth, is the dominant non-VPU
    cost). Each group's slab arrives as its own BlockSpec input over the
    same codes array, so Mosaic's automatic pipeline still prefetches all of
    them — no manual DMA (the manual double-buffer variant measured slower
    in round 1).

    skip: guard each group's body with pl.when(size > 0) — build_groups
    emits a compact prefix of live groups, so the worst-case ghost tail
    (~25-33% of the layout at bench shapes) costs only its grid steps; the
    epilogue masks the stale outputs via the alive vector."""

    def kernel(group_pid_ref, group_size_ref, qg_ref, *refs):
        slab_refs = refs[:gpb]
        norms_refs = refs[gpb:2 * gpb]
        out_ref = refs[2 * gpb]
        stats_ref = refs[2 * gpb + 1]
        g = pl.program_id(0)
        for j in range(gpb):
            size = group_size_ref[gpb * g + j]

            def body(j=j, size=size):
                out, stats = _v3p_group_body(
                    qg_ref[j], slab_refs[j][0], norms_refs[j][0, 0],
                    size, metric, k, slot_mult, levels,
                )
                out_ref[j] = out
                stats_ref[j] = stats

            if skip:
                pl.when(size > 0)(body)
            else:
                body()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "gpb", "skip", "dedup", "interpret"),
)
def grouped_scan_pallas_v3pn(codes, ids, sizes, norms, q, pids, k: int,
                             metric: str, qt: int = 32, gpb: int = 2,
                             skip: bool = True, dedup: bool = False,
                             interpret: bool = False):
    """Multi-group-per-step variant of grouped_scan_pallas_v3p. Same
    inputs/returns/semantics; only the grid pipelining differs. gpb slabs are
    double-buffered in VMEM (~16 MB/core budget: gpb=4 at C=1536, D=128 f32
    uses ~6.3 MB of slab + working set)."""
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v3p packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = q.astype(codes.dtype)[safe_q]  # [Gn, QT, D]

    def slab_spec(j):
        return pl.BlockSpec(
            (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    def norms_spec(j):
        return pl.BlockSpec(
            (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    kernel = _v3pn_kernel(metric, kk, slot_mult, levels, gpb, skip=skip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0)),
            pl.BlockSpec((gpb, qt, 2), lambda g, gp_, gs: (g, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((Gn, qt, 2), jnp.float32),
    ]
    norms3 = norms.reshape(P, 1, C)
    g_packed, g_stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * gpb), *([norms3] * gpb))
    return _v3p_epilogue(
        g_packed, g_stats, gp, pair_group, pair_slot, pids, safe_q,
        codes, ids, norms, q, k, kk, metric, slot_mult, levels,
        alive=(group_size > 0) if skip else None, dedup=dedup,
    )


def grouped_scan_pallas_v3p2(codes, ids, sizes, norms, q, pids, k: int,
                             metric: str, qt: int = 32,
                             interpret: bool = False):
    """Two-groups-per-step v3p (see grouped_scan_pallas_v3pn)."""
    return grouped_scan_pallas_v3pn(codes, ids, sizes, norms, q, pids, k,
                                    metric, qt=qt, gpb=2, interpret=interpret)


def _v7_select(scores, valid, k: int, slot_mult: int, levels: int, fold: int):
    """Column-folded max2 packed selection: top-k rounds over a [QT, fold]
    reduced row instead of the full [QT, C] row. valid: [QT, C] bool mask.

    Fold pass: the C lanes are viewed as S = C/fold segments; a streaming
    top-2 keeps the largest (m1) and second-largest (m2) packed value per
    fold-column (3 VPU ops per segment over [QT, fold]). Each selection
    round then reduces only [QT, fold]: emit max(m1), demote that column
    (m1 <- m2, m2 <- -1). Round cost drops from 2 full-row passes (v3p) to
    ~3*(fold/C) — ~8x at C=1536/fold=128. Differs from the rejected v5/v6
    chunked selections (BENCH_NOTES): the reduction lives in registers, so
    there is no per-chunk merge (v5's round multiplication) and no scratch
    assembly (v6's epilogue cost).

    APPROXIMATE at the column level: a fold-column yields at most two
    winners, so if >= 3 of a row's true top-k collide in one column
    (P ~ C(k,3)/fold^2 ~ 0.7% of rows at k=10, fold=128 — and then only one
    candidate drops, usually beyond the final merged top-k), the third is
    replaced by the next-ranked lane. The exact top-k guarantee the
    reference's heap gives (list_scanning.h:39-207) is preserved in
    expectation by the cross-group merge pool; parity tests assert row
    overlap, not equality.

    Returns (packed out [QT, k] descending, stats [QT, 2]) — epilogue-
    compatible with _v3p_select.
    """
    QT, C = scores.shape
    S = C // fold
    lane = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
    rowmax = jnp.max(jnp.where(valid, scores, NEG_INF), axis=1, keepdims=True)
    rowmin = jnp.min(jnp.where(valid, scores, jnp.inf), axis=1, keepdims=True)
    rng = jnp.maximum(rowmax - rowmin, 1e-20)
    qk = jnp.floor((scores - rowmin) * (float(levels) / rng))
    packed = qk * float(slot_mult) + lane.astype(jnp.float32)
    packed = jnp.where(valid, packed, -1.0)

    out = _v7_fold_rounds(packed, k, fold)
    stat_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, 2), 1)
    rm = jnp.where(jnp.isfinite(rowmin), rowmin, 0.0)
    stats = jnp.where(stat_lane == 0, rm, rng)
    return out, stats


def _v7_kernel(metric: str, k: int, slot_mult: int, levels: int, gpb: int,
               fold: int, skip: bool = True):
    """v3pn multi-group kernel body with _v7_select in place of _v3p_select."""

    def kernel(group_pid_ref, group_size_ref, qg_ref, *refs):
        slab_refs = refs[:gpb]
        norms_refs = refs[gpb:2 * gpb]
        out_ref = refs[2 * gpb]
        stats_ref = refs[2 * gpb + 1]
        g = pl.program_id(0)
        for j in range(gpb):
            size = group_size_ref[gpb * g + j]

            def body(j=j, size=size):
                qg = qg_ref[j]
                slab = slab_refs[j][0]
                prod = jax.lax.dot_general(
                    qg, slab,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                scores = (2.0 * prod - norms_refs[j][0, 0][None, :]
                          if metric == "l2" else prod)
                lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                out, stats = _v7_select(scores, lane < size, k, slot_mult,
                                        levels, fold)
                out_ref[j] = out
                stats_ref[j] = stats

            if skip:
                pl.when(size > 0)(body)
            else:
                body()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "gpb", "fold", "skip", "dedup",
                     "interpret"),
)
def grouped_scan_pallas_v7(codes, ids, sizes, norms, q, pids, k: int,
                           metric: str, qt: int = 32, gpb: int = 4,
                           fold: int = 128, skip: bool = True,
                           dedup: bool = False, interpret: bool = False):
    """Column-folded-selection grouped scan (see _v7_select). Same inputs/
    returns as grouped_scan_pallas_v3pn; selection is approximate at the
    fold-column level (exact rescore of winners still applies). Requires
    C % fold == 0 — callers fall back to v3pn otherwise."""
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v7 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % fold:
        raise ValueError(f"v7 needs C % fold == 0 (C={C}, fold={fold})")
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = q.astype(codes.dtype)[safe_q]  # [Gn, QT, D]

    def slab_spec(j):
        return pl.BlockSpec(
            (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    def norms_spec(j):
        return pl.BlockSpec(
            (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    kernel = _v7_kernel(metric, kk, slot_mult, levels, gpb, fold, skip=skip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0)),
            pl.BlockSpec((gpb, qt, 2), lambda g, gp_, gs: (g, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((Gn, qt, 2), jnp.float32),
    ]
    norms3 = norms.reshape(P, 1, C)
    g_packed, g_stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * gpb), *([norms3] * gpb))
    return _v3p_epilogue(
        g_packed, g_stats, gp, pair_group, pair_slot, pids, safe_q,
        codes, ids, norms, q, k, kk, metric, slot_mult, levels,
        alive=(group_size > 0) if skip else None, dedup=dedup,
    )


def _v7_fold_rounds(packed, k: int, fold: int):
    """Shared fold + max2 top-k rounds over a packed [QT, C] matrix.
    Returns out [QT, k] packed (descending)."""
    QT, C = packed.shape
    S = C // fold
    m1 = packed[:, 0:fold]
    m2 = jnp.full((QT, fold), -1.0, jnp.float32)
    for j in range(1, S):
        seg = packed[:, j * fold:(j + 1) * fold]
        m2 = jnp.maximum(m2, jnp.minimum(m1, seg))
        m1 = jnp.maximum(m1, seg)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)

    def select_round(i, carry):
        m1c, m2c, out = carry
        best = jnp.max(m1c, axis=1, keepdims=True)
        out = jnp.where(out_lane == i, best, out)
        hit = m1c == best
        m1c = jnp.where(hit, m2c, m1c)
        m2c = jnp.where(hit, -1.0, m2c)
        return m1c, m2c, out

    init = (m1, m2, jnp.full((QT, k), -1.0, jnp.float32))
    _, _, out = lax.fori_loop(0, k, select_round, init)
    return out


def _global_bounds(qf, codes, norms, sizes, metric: str, bounds: str):
    """(gmin, grange) for the global quantization scale.

    "analytic": worst-case bounds from the batch max query norm and store
    max vector norm — safe but loose (the realized score spread is a
    fraction of it, costing effective quantization levels).
    "sampled": gmin from actual scores of a stratified query sample against
    a few partitions, minus a 25% margin; gmax stays at the analytic upper
    bound (clamping at the TOP would corrupt winners; clamping at the
    bottom only flattens hopeless candidates). ~2-4x more effective levels
    per row on manifold data.
    """
    q_sq = jnp.sum(qf * qf, axis=1)
    maxq2 = jnp.max(q_sq)
    maxx2 = jnp.maximum(jnp.max(norms), 1e-12)
    maxqx = jnp.sqrt(maxq2) * jnp.sqrt(maxx2)
    if metric == "l2":
        gmax = maxq2
        gmin = -(maxx2 + 2.0 * maxqx)
    else:
        gmax = maxqx
        gmin = -maxqx
    if bounds == "sampled":
        B = qf.shape[0]
        P, C, D = codes.shape
        step = max(B // 64, 1)
        sq = qf[::step][:64]
        np_s = min(P, 4)
        slab = codes[:np_s].reshape(np_s * C, D).astype(jnp.float32)
        prod = jax.lax.dot_general(
            sq, slab, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if metric == "l2":
            scores = 2.0 * prod - norms[:np_s].reshape(1, np_s * C)
        else:
            scores = prod
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, np_s * C), 1)
        valid = (lane % C) < jnp.repeat(sizes[:np_s], C).reshape(1, np_s * C)
        smin = jnp.min(jnp.where(valid, scores, jnp.inf))
        smin = jnp.where(jnp.isfinite(smin), smin, gmin)
        gmin = smin - 0.25 * jnp.maximum(gmax - smin, 1e-20)
    return gmin, jnp.maximum(gmax - gmin, 1e-20)


def _merge_positions_kernel(kfin: int, lane_mult: int, fold: int):
    """Pallas per-query merge: fold + kfin packed rounds over a [T, poolp]
    key tile, emitting winner POSITIONS (lane indices into the pool). One
    kernel replaces the ~40 small XLA ops of the unfused merge (fold chain
    + round loop), whose per-op overhead dominates at [B, 256] shapes."""

    def kernel(keys_ref, out_ref):
        keys = keys_ref[...]
        T, poolp = keys.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, poolp), 1)
        packed = jnp.where(keys >= 0.0,
                           keys * float(lane_mult) + lane.astype(jnp.float32),
                           -1.0)
        S = poolp // fold
        m1 = packed[:, 0:fold]
        m2 = jnp.full((T, fold), -1.0, jnp.float32)
        for j in range(1, S):
            seg = packed[:, j * fold:(j + 1) * fold]
            m2 = jnp.maximum(m2, jnp.minimum(m1, seg))
            m1 = jnp.maximum(m1, seg)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (T, kfin), 1)

        def select_round(i, carry):
            m1c, m2c, out = carry
            best = jnp.max(m1c, axis=1, keepdims=True)
            out = jnp.where(out_lane == i, best, out)
            hit = m1c == best
            m1c = jnp.where(hit, m2c, m1c)
            m2c = jnp.where(hit, -1.0, m2c)
            return m1c, m2c, out

        init = (m1, m2, jnp.full((T, kfin), -1.0, jnp.float32))
        _, _, out = lax.fori_loop(0, kfin, select_round, init)
        pos = jnp.mod(out, float(lane_mult)).astype(jnp.int32)
        out_ref[...] = jnp.where(out >= 0.0, pos, -1)

    return kernel


def _merge_positions_pallas(m_keys_padded, kfin: int, lane_mult: int,
                            fold: int, tile: int = 256,
                            interpret: bool = False):
    """[B, poolp] keys -> [B, kfin] winner positions via the Pallas merge."""
    B, poolp = m_keys_padded.shape
    Bp = -(-B // tile) * tile
    mk = jnp.pad(m_keys_padded, ((0, Bp - B), (0, 0)), constant_values=-1.0)
    out = pl.pallas_call(
        _merge_positions_kernel(kfin, lane_mult, fold),
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((tile, poolp), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((tile, kfin), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, kfin), jnp.int32),
        interpret=interpret,
    )(mk)
    return out[:B]


def _v8_kernel(k: int, slot_mult: int, levels: int, gpb: int, fold: int):
    """v8 (global-scale v7) kernel body: the quantize prologue is ONE fused
    elementwise chain — no per-row reduces, no stats output.

    The wrapper pre-scales queries (q' = q * levels/grange) and pre-shifts
    the cached norms (norms' = (||x||^2 + gmin) * levels/grange), so the
    in-kernel quantized key is just floor(2*prod - norms') clipped to
    [0, levels]: the per-row rowmax/rowmin reduction passes of v3p/v7
    (2 full [QT, C] reduces per group) disappear, and the dequantize uses
    two scalars instead of a [G, QT, 2] stats array."""

    def kernel(group_pid_ref, group_size_ref, qg_ref, *refs):
        slab_refs = refs[:gpb]
        norms_refs = refs[gpb:2 * gpb]
        out_ref = refs[2 * gpb]
        g = pl.program_id(0)
        for j in range(gpb):
            size = group_size_ref[gpb * g + j]

            def body(j=j, size=size):
                qg = qg_ref[j]
                slab = slab_refs[j][0]
                prod = jax.lax.dot_general(
                    qg, slab,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                qk = jnp.clip(jnp.floor(prod - norms_refs[j][0, 0][None, :]),
                              0.0, float(levels))
                QT, C = qk.shape
                lane = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
                packed = qk * float(slot_mult) + lane.astype(jnp.float32)
                packed = jnp.where(lane < size, packed, -1.0)
                out_ref[j] = _v7_fold_rounds(packed, k, fold)

            pl.when(size > 0)(body)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "gpb", "fold", "dedup",
                     "pool_factor", "bounds", "merge", "interpret"),
)
def grouped_scan_pallas_v8(codes, ids, sizes, norms, q, pids, k: int,
                            metric: str, qt: int = 32, gpb: int = 4,
                            fold: int = 128, dedup: bool = False,
                            pool_factor: int = 1, bounds: str = "analytic",
                            merge: str = "pallas", interpret: bool = False):
    """v8: global-scale column-folded grouped scan (see _v8_kernel).

    Same inputs/returns as grouped_scan_pallas_v3pn. Selection order is by a
    globally-quantized 13-bit key (score bounds estimated from the batch's
    max query norm and the store's max vector norm), so per-row resolution
    is coarser than v7's per-row scale — winners are exact-rescored as
    always, and membership differs only at global-quantization ties.
    """
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v8 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % fold:
        raise ValueError(f"v8 needs C % fold == 0 (C={C}, fold={fold})")
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2

    # Global score bounds (l2 internal score s = 2<q,x> - ||x||^2 lies in
    # [-(maxx^2 + 2 maxq maxx), maxq^2]; ip score in +-maxq*maxx).
    qf = q.astype(jnp.float32)
    gmin, grange = _global_bounds(qf, codes, norms, sizes, metric, bounds)
    ginv = float(levels) / grange
    # Key = (score - gmin) * ginv with score = 2<q,x> - ||x||^2 (l2) or
    # <q,x> (ip). The metric's structure moves ENTIRELY into the two
    # pre-transforms so the kernel's quantize is metric-agnostic
    # (floor(prod - normsT)): queries carry the score's <q,x> coefficient
    # times ginv, norms carry the (||x||^2 +) gmin shift times ginv.
    q_coef = 2.0 * ginv if metric == "l2" else ginv
    normsT = ((norms if metric == "l2" else jnp.zeros_like(norms)) + gmin) * ginv

    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    safe_q = jnp.where(ql >= 0, ql, 0)
    q_scaled = (qf * q_coef).astype(codes.dtype)
    qg = q_scaled[safe_q]  # [Gn, QT, D]

    def slab_spec(j):
        return pl.BlockSpec(
            (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    def norms_spec(j):
        return pl.BlockSpec(
            (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    kernel = _v8_kernel(kk, slot_mult, levels, gpb, fold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32)]
    (g_packed,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * gpb), *([normsT.reshape(P, 1, C)] * gpb))

    return _global_epilogue(g_packed, gp, group_size, pair_group, pair_slot,
                            pids, codes, ids, norms, q, k, kk, metric,
                            slot_mult, levels, dedup,
                            pool_factor=pool_factor, merge=merge,
                            interpret=interpret)


def _v9_kernel(k: int, slot_mult: int, levels: int, gpb: int, fold: int):
    """v9: v8's global-scale quantize + JOINT top-k rounds.

    ab14/ab15 decomposition: the fold/round ops run on [qt, fold] = [32, 128]
    tiles — small enough that per-op overhead, not VPU bytes, dominates the
    selection stage. v9 writes each group's folded (m1, m2) pair into a
    [gpb*qt, fold] VMEM scratch and runs ONE k-round loop over all gpb
    groups per grid step: 4x fewer round ops at 4x the tile height (same
    bytes). Rounds are per-ROW selections, so joint processing changes
    nothing semantically — each row still emits its own top-k."""

    def kernel(group_pid_ref, group_size_ref, qg_ref, *refs):
        slab_refs = refs[:gpb]
        norms_refs = refs[gpb:2 * gpb]
        out_ref = refs[2 * gpb]
        m1_ref = refs[2 * gpb + 1]  # scratch [gpb*qt, fold]
        m2_ref = refs[2 * gpb + 2]
        g = pl.program_id(0)
        qt = qg_ref.shape[1]
        for j in range(gpb):
            size = group_size_ref[gpb * g + j]

            def body(j=j, size=size):
                qg = qg_ref[j]
                slab = slab_refs[j][0]
                prod = jax.lax.dot_general(
                    qg, slab,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                qk = jnp.clip(
                    jnp.floor(prod - norms_refs[j][0, 0][None, :]),
                    0.0, float(levels))
                QT, C = qk.shape
                lane = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
                packed = qk * float(slot_mult) + lane.astype(jnp.float32)
                packed = jnp.where(lane < size, packed, -1.0)
                S = C // fold
                m1 = packed[:, 0:fold]
                m2 = jnp.full((QT, fold), -1.0, jnp.float32)
                for s in range(1, S):
                    seg = packed[:, s * fold:(s + 1) * fold]
                    m2 = jnp.maximum(m2, jnp.minimum(m1, seg))
                    m1 = jnp.maximum(m1, seg)
                m1_ref[j * qt:(j + 1) * qt] = m1
                m2_ref[j * qt:(j + 1) * qt] = m2

            def ghost(j=j):
                m1_ref[j * qt:(j + 1) * qt] = jnp.full(
                    (qt, fold), -1.0, jnp.float32)

            pl.when(size > 0)(body)
            pl.when(size <= 0)(ghost)

        rows = gpb * qt
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
        m1 = m1_ref[...]
        m2 = m2_ref[...]

        def select_round(i, carry):
            m1c, m2c, out = carry
            best = jnp.max(m1c, axis=1, keepdims=True)
            out = jnp.where(out_lane == i, best, out)
            hit = m1c == best
            m1c = jnp.where(hit, m2c, m1c)
            m2c = jnp.where(hit, -1.0, m2c)
            return m1c, m2c, out

        init = (m1, m2, jnp.full((rows, k), -1.0, jnp.float32))
        _, _, out = lax.fori_loop(0, k, select_round, init)
        for j in range(gpb):
            out_ref[j] = out[j * qt:(j + 1) * qt]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "gpb", "fold", "dedup",
                     "pool_factor", "bounds", "merge", "interpret"),
)
def grouped_scan_pallas_v9(codes, ids, sizes, norms, q, pids, k: int,
                           metric: str, qt: int = 32, gpb: int = 4,
                           fold: int = 128, dedup: bool = False,
                           pool_factor: int = 1, bounds: str = "analytic",
                           merge: str = "pallas", interpret: bool = False):
    """v9: global-scale quantize + joint rounds (see _v9_kernel). Same
    inputs/returns/semantics as grouped_scan_pallas_v8."""
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v9 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % fold:
        raise ValueError(f"v9 needs C % fold == 0 (C={C}, fold={fold})")
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2

    qf = q.astype(jnp.float32)
    gmin, grange = _global_bounds(qf, codes, norms, sizes, metric, bounds)
    ginv = float(levels) / grange
    # Key = (score - gmin) * ginv with score = 2<q,x> - ||x||^2 (l2) or
    # <q,x> (ip). The metric's structure moves ENTIRELY into the two
    # pre-transforms so the kernel's quantize is metric-agnostic
    # (floor(prod - normsT)): queries carry the score's <q,x> coefficient
    # times ginv, norms carry the (||x||^2 +) gmin shift times ginv.
    q_coef = 2.0 * ginv if metric == "l2" else ginv
    normsT = ((norms if metric == "l2" else jnp.zeros_like(norms)) + gmin) * ginv

    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = (qf * q_coef).astype(codes.dtype)[safe_q]

    def slab_spec(j):
        return pl.BlockSpec(
            (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    def norms_spec(j):
        return pl.BlockSpec(
            (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    kernel = _v9_kernel(kk, slot_mult, levels, gpb, fold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32)]
    (g_packed,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * gpb), *([normsT.reshape(P, 1, C)] * gpb))

    return _global_epilogue(g_packed, gp, group_size, pair_group, pair_slot,
                            pids, codes, ids, norms, q, k, kk, metric,
                            slot_mult, levels, dedup,
                            pool_factor=pool_factor, merge=merge,
                            interpret=interpret)


def _scatter_epilogue(g_packed, tgt, pids, codes, ids, norms, q, k: int,
                      kk: int, metric: str, slot_mult: int, levels: int,
                      dedup: bool, pool_factor: int = 1, merge: str = "pallas",
                      interpret: bool = False, exact: bool = True,
                      gmin=None, ginv=None):
    """v10 epilogue: ONE row scatter replaces the whole pair-major pathway.

    The v8/v9 epilogue derives (keys, refs) over the full [Gn, qt, kk]
    kernel output (1.3M elements at bench shape), then pair-gathers both
    through the (pair_group, pair_slot) inverse permutation. Here the
    kernel rows are scattered straight into pair-major order via tgt (the
    flat pair index each row belongs to, from build_groups_scatter):

      m_packed[b*nprobe + j] = g_packed_row  — one [n, kk] scatter

    and everything downstream works at pool size [B, nprobe*kk]:
      * merge keys  = floor(m_packed / slot_mult)  (pool-side, not 1.3M)
      * winner refs = (pids[b, pos//kk] << 16) | (m_packed[pos] % slot_mult)
        computed ONLY for the kfin winners (or the pool, on the dedup path)

    so the [n] inverse-permutation scatter, both [n, kk] pair gathers, and
    the full-size refs tensor disappear. Invalid rows target the discard
    slot n. Ghost-group rows carry packed = -1 (the kernel's ghost branch)
    and stay invalid.
    """
    B, nprobe = pids.shape
    n = B * nprobe
    rows = g_packed.reshape(-1, g_packed.shape[-1])  # [Gn*qt, kk]
    mp = jnp.full((n + 1, kk), -1.0, jnp.float32).at[tgt.reshape(-1)].set(
        rows, mode="drop")
    m_packed = mp[:n].reshape(B, nprobe * kk)
    return _pool_tail(m_packed, pids, pids, codes, ids, norms, q, k, kk,
                      metric, slot_mult, levels, dedup,
                      pool_factor=pool_factor, merge=merge,
                      interpret=interpret, exact=exact, gmin=gmin, ginv=ginv)


def _sorted_epilogue(g_packed, tgt, group_size, pids, codes, ids, norms, q,
                     k: int, kk: int, metric: str, slot_mult: int,
                     levels: int, dedup: bool, pool_factor: int = 1,
                     merge: str = "pallas", interpret: bool = False,
                     exact: bool = True, gmin=None, ginv=None):
    """v11 epilogue: SORTED placement replaces the v10 row scatter.

    The v10 [n, kk] row scatter costs 1.83 ms at the nlist=512/B=8192 bench
    shape while a packed single-key sort + one row take costs 0.79
    (kernel_ab28). Every kernel row's owning query is known (qs =
    tgt // nprobe), so sorting row indices by the uint32 key
    (qs << r_bits) | row and taking the first n rows lands each query's
    nprobe rows CONTIGUOUSLY at [b*nprobe, (b+1)*nprobe) — no inverse
    permutation, no scatter. DENSE-ONLY: requires every pair valid
    (fixed-nprobe semantics); within a query the pool columns come out in
    ascending-partition order (rows sort by row index = partition-major),
    so the winner pid lookup uses the per-query ASCENDING pid sort instead
    of the probe-rank order.

    Rows of ghost (size-0) groups keep their pair slot for alignment; their
    stale kernel values are masked to -1 via group_size before the take.
    """
    B, nprobe = pids.shape
    n = B * nprobe
    rows = g_packed.reshape(-1, g_packed.shape[-1])  # [R, kk]
    R = rows.shape[0]
    qt = R // group_size.shape[0]
    r_bits = max((R - 1).bit_length(), 1)
    alive = jnp.repeat(group_size > 0, qt)  # [R]
    rows = jnp.where(alive[:, None], rows, -1.0)
    tgt_flat = tgt.reshape(-1)
    iota = jnp.arange(R, dtype=jnp.uint32)
    qsf = (tgt_flat // nprobe).astype(jnp.uint32)
    key2 = jnp.where(tgt_flat < n,
                     (qsf << r_bits) | iota, jnp.uint32(0xFFFFFFFF))
    ks = jnp.sort(key2)
    r_sorted = (ks & jnp.uint32((1 << r_bits) - 1)).astype(jnp.int32)[:n]
    m_packed = jnp.take(rows, r_sorted, axis=0).reshape(B, nprobe * kk)
    sorted_pids = jnp.sort(pids, axis=1)
    return _pool_tail(m_packed, sorted_pids, pids, codes, ids, norms, q, k,
                      kk, metric, slot_mult, levels, dedup,
                      pool_factor=pool_factor, merge=merge,
                      interpret=interpret, exact=exact, gmin=gmin, ginv=ginv)


def _argsort_epilogue(g_packed, tgt, group_size, pids, codes, ids, norms, q,
                      k: int, kk: int, metric: str, slot_mult: int,
                      levels: int, dedup: bool, pool_factor: int = 1,
                      merge: str = "pallas", interpret: bool = False,
                      exact: bool = True, gmin=None, ginv=None):
    """v11 epilogue variant with NO sort-key bit budget: argsort placement.

    The packed uint32 key (qs << r_bits) | row needs r_bits + qs_bits < 32,
    which fails at 10M-scale shapes (P~4096, qt=64: R~5-6e5 rows needs 20
    bits, B >= 8192 needs 13+) — those shapes have been riding the v10
    [n, kk] row scatter. But under DENSE fixed-nprobe semantics tgt (the
    flat pair index of every kernel row, from build_groups_scatter) covers
    [0, n) exactly once, with pad rows parked at n — so a plain argsort of
    tgt IS the row -> pair placement, at any shape:

      order[p] = the kernel row whose pair position is p   (p < n)

    and one [n, kk] row take lands the pool in PROBE order (v10 placement:
    pool column j of query b is probe rank j), so pid_cols = pids directly,
    no ascending-pid sort. Ghost (size-0) rows keep their pair slot for
    alignment, values masked to -1 via group_size (exactly like v11 dense).
    """
    B, nprobe = pids.shape
    n = B * nprobe
    rows = g_packed.reshape(-1, g_packed.shape[-1])  # [R, kk]
    R = rows.shape[0]
    qt = R // group_size.shape[0]
    alive = jnp.repeat(group_size > 0, qt)  # [R]
    rows = jnp.where(alive[:, None], rows, -1.0)
    order = jnp.argsort(tgt.reshape(-1)).astype(jnp.int32)[:n]
    m_packed = jnp.take(rows, order, axis=0).reshape(B, nprobe * kk)
    return _pool_tail(m_packed, pids, pids, codes, ids, norms, q, k, kk,
                      metric, slot_mult, levels, dedup,
                      pool_factor=pool_factor, merge=merge,
                      interpret=interpret, exact=exact, gmin=gmin, ginv=ginv)


def _sorted_budget_epilogue(g_packed, tgt, group_size, pids, codes, ids,
                            norms, q, k: int, kk: int, metric: str,
                            slot_mult: int, levels: int, dedup: bool,
                            pool_factor: int = 1, merge: str = "pallas",
                            interpret: bool = False, exact: bool = True,
                            gmin=None, ginv=None):
    """v11b epilogue: SORTED placement for BUDGETED masked scans.

    _sorted_epilogue's take trick needs every query to own exactly nprobe
    rows (dense), so masked APS plans have been stuck with the v10 row
    scatter into a [B*M+1, kk] destination. Here the per-query row counts
    are VARIABLE but known (c_b = valid pids per plan row), so the same
    one-sort-one-take structure works with an offset table instead of a
    fixed stride:

      * sort rows by uint32 key (query << r_bits) | row — query-major,
        and within a query by row index, which is the pid-ascending group
        order of build_groups_budget;
      * query b's c_b rows land contiguously at [cum_b, cum_b + c_b);
      * take position cum_b + j for pool column j (gated by j < c_b) —
        one [B*W, kk] row take from the [R, kk] kernel output, no scatter,
        no B*M-sized destination.

    Pool column j of query b holds its j-th SMALLEST planned pid (ghost
    pids keep their rows, values masked to -1 via group_size, exactly like
    v11 dense), so pid_cols is the ascending sort of the planned pids."""
    B, W = pids.shape
    n = B * W
    rows = g_packed.reshape(-1, g_packed.shape[-1])  # [R, kk]
    R = rows.shape[0]
    qt = R // group_size.shape[0]
    r_bits = max((R - 1).bit_length(), 1)
    alive = jnp.repeat(group_size > 0, qt)  # ghost values -> -1, rows kept
    rows = jnp.where(alive[:, None], rows, -1.0)
    tgt_flat = tgt.reshape(-1)
    iota = jnp.arange(R, dtype=jnp.uint32)
    qsf = (tgt_flat // W).astype(jnp.uint32)
    key2 = jnp.where(tgt_flat < n, (qsf << r_bits) | iota,
                     jnp.uint32(0xFFFFFFFF))
    ks = jnp.sort(key2)
    r_sorted = (ks & jnp.uint32((1 << r_bits) - 1)).astype(jnp.int32)  # [R]
    c_b = jnp.sum((pids >= 0).astype(jnp.int32), axis=1)  # [B]
    cum = jnp.cumsum(c_b) - c_b  # exclusive prefix: query b's first row
    j_lane = jnp.arange(W, dtype=jnp.int32)[None, :]
    gate = j_lane < c_b[:, None]  # [B, W]
    pos = jnp.clip(cum[:, None] + j_lane, 0, R - 1)
    r_final = jnp.where(gate, r_sorted[pos], 0).reshape(-1)
    m_rows = jnp.take(rows, r_final, axis=0)  # [B*W, kk]
    m_packed = jnp.where(gate.reshape(-1)[:, None], m_rows, -1.0)
    m_packed = m_packed.reshape(B, W * kk)
    sorted_pids = jnp.sort(jnp.where(pids >= 0, pids, jnp.int32(2**30)),
                           axis=1)
    pid_cols = jnp.where(gate, sorted_pids, -1)
    return _pool_tail(m_packed, pid_cols, pids, codes, ids, norms, q, k,
                      kk, metric, slot_mult, levels, dedup,
                      pool_factor=pool_factor, merge=merge,
                      interpret=interpret, exact=exact, gmin=gmin, ginv=ginv)


def _pool_tail(m_packed, pid_cols, pids, codes, ids, norms, q, k: int,
               kk: int, metric: str, slot_mult: int, levels: int,
               dedup: bool, pool_factor: int = 1, merge: str = "pallas",
               interpret: bool = False, exact: bool = True,
               gmin=None, ginv=None):
    """Shared pool-side tail of the v10/v11 epilogues: key merge, winner
    ref derivation, exact rescore or dequantized scoring. pid_cols [B,
    nprobe] maps pool column j -> j // kk -> that query's partition (probe
    order for the scatter placement, ascending-pid order for the sorted
    placement); pids is only used for the scanned count."""
    B, nprobe = pids.shape
    pool = nprobe * kk
    m_keys = jnp.where(m_packed >= 0.0,
                       jnp.floor(m_packed / float(slot_mult)), -1.0)

    poolp = -(-pool // 128) * 128
    lane_mult = max(poolp, 2)
    if dedup or (levels * lane_mult + lane_mult) >= (1 << 24):
        # General/dedup path: build pool-side refs and reuse the shared
        # top-k + dedup + exact-rescore tail.
        slot = jnp.mod(m_packed, float(slot_mult)).astype(jnp.int32)
        pid_b = jnp.broadcast_to(
            pid_cols[:, :, None], (B, nprobe, kk)).reshape(B, pool)
        ok = (m_packed >= 0.0) & (pid_b >= 0)
        m_refs = jnp.where(ok, (jnp.maximum(pid_b, 0) << 16) | slot, -1)
        m_scores = jnp.where(ok, m_keys, NEG_INF)
        return _rescore_topk(m_scores, m_refs, codes, ids, norms, q, k, kk,
                             metric, pids, dedup=dedup, exact=exact,
                             gmin=gmin, ginv=ginv)

    kfin = min(pool_factor * k, pool)
    mk = jnp.pad(m_keys, ((0, 0), (0, poolp - pool)), constant_values=-1.0)
    if merge == "pallas":
        pos = _merge_positions_pallas(mk, kfin, lane_mult, 128,
                                      interpret=interpret)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, poolp), 1)
        packed2 = jnp.where(mk >= 0.0,
                            mk * float(lane_mult) + lane.astype(jnp.float32),
                            -1.0)
        S = poolp // 128
        m1 = packed2[:, 0:128]
        m2 = jnp.full((B, 128), -1.0, jnp.float32)
        for j in range(1, S):
            seg = packed2[:, j * 128:(j + 1) * 128]
            m2 = jnp.maximum(m2, jnp.minimum(m1, seg))
            m1 = jnp.maximum(m1, seg)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, kfin), 1)

        def select_round(i, carry):
            m1c, m2c, out = carry
            best = jnp.max(m1c, axis=1, keepdims=True)
            out = jnp.where(out_lane == i, best, out)
            hit = m1c == best
            m1c = jnp.where(hit, m2c, m1c)
            m2c = jnp.where(hit, -1.0, m2c)
            return m1c, m2c, out

        init = (m1, m2, jnp.full((B, kfin), -1.0, jnp.float32))
        _, _, out = lax.fori_loop(0, kfin, select_round, init)
        pos = jnp.mod(out, float(lane_mult)).astype(jnp.int32)
        pos = jnp.where(out >= 0.0, pos, -1)

    posc = jnp.clip(pos, 0, pool - 1)
    pk = jnp.take_along_axis(m_packed, posc, axis=1)  # [B, kfin]
    slot = jnp.mod(pk, float(slot_mult)).astype(jnp.int32)
    wpid = jnp.take_along_axis(pid_cols, posc // kk, axis=1)
    valid = (pos >= 0) & (pk >= 0.0) & (wpid >= 0)
    top_refs = jnp.where(valid, (jnp.maximum(wpid, 0) << 16) | slot, -1)
    if exact:
        return _exact_rescore(top_refs, codes, ids, norms, q, k, kfin, metric,
                              pids)
    # Dequantized-score mode: with pool_factor=1 the rescore cannot change
    # MEMBERSHIP (top-k of a k-sized pool) — it only reorders and restores
    # exact distances. The [B, kfin, D] winner-vector gather is the single
    # most expensive epilogue op (1.82 ms of a 7.81 ms fused step at bench
    # shape, kernel_ab26), so this mode reconstructs scores from the
    # kernel's quantized key instead:
    #   key = floor((score_nq - gmin) * ginv)  with  score_nq = 2<q,x>-|x|^2
    #   (l2; the per-query |q|^2 is constant within a row and re-added
    #   here) or <q,x> (ip)  =>  score ~= (key + 0.5)/ginv + gmin [- |q|^2]
    # Resolution is grange/levels; ids ordering can swap only where the
    # true gap is below one quantization step. Ids remain exact.
    key = jnp.floor(pk / float(slot_mult))
    score = (key + 0.5) / ginv + gmin
    if metric == "l2":
        score = score - jnp.sum(
            q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    w_safe = jnp.maximum(top_refs >> 16, 0)
    top_ids = _flat_row_take(ids, w_safe, slot)
    top_ids = jnp.where(valid & (top_refs >= 0), top_ids, -1)
    score = jnp.where(top_ids >= 0, score, NEG_INF)
    scores = score[:, :k]
    out_ids = top_ids[:, :k]
    if scores.shape[1] < k:
        padn = k - scores.shape[1]
        scores = jnp.pad(scores, ((0, 0), (0, padn)), constant_values=NEG_INF)
        out_ids = jnp.pad(out_ids, ((0, 0), (0, padn)), constant_values=-1)
    scanned = jnp.sum((pids >= 0).astype(jnp.int32), axis=1)
    return scores, out_ids, scanned


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "gpb", "fold", "dedup",
                     "pool_factor", "bounds", "merge", "interpret", "exact"),
)
def grouped_scan_pallas_v10(codes, ids, sizes, norms, q, pids, k: int,
                            metric: str, qt: int = 64, gpb: int = 4,
                            fold: int = 128, dedup: bool = False,
                            pool_factor: int = 1, bounds: str = "analytic",
                            merge: str = "pallas", interpret: bool = False,
                            exact: bool = True):
    """v10: the v9 kernel (global-scale quantize + joint rounds) with the
    scatter epilogue (see _scatter_epilogue) over build_groups_scatter.
    Same inputs/returns/semantics as grouped_scan_pallas_v9 — membership
    can differ from v9 only at quantization ties (the merge pools the same
    candidates in a different lane order)."""
    from quake_tpu.ops.grouped import build_groups_scatter

    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v10 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % fold:
        raise ValueError(f"v10 needs C % fold == 0 (C={C}, fold={fold})")
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2

    qf = q.astype(jnp.float32)
    gmin, grange = _global_bounds(qf, codes, norms, sizes, metric, bounds)
    ginv = float(levels) / grange
    q_coef = 2.0 * ginv if metric == "l2" else ginv
    normsT = ((norms if metric == "l2" else jnp.zeros_like(norms)) + gmin) * ginv

    group_pid, qlist, tgt = build_groups_scatter(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    tgt = jnp.pad(tgt, ((0, Gn - G), (0, 0)),
                  constant_values=B * pids.shape[1])
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    # Ghost-skipped groups (size 0) leave stale VMEM in the joint-select
    # scratch (the ghost branch only clears m1) — route their rows to the
    # discard slot instead of masking a full-size alive tensor like v9.
    tgt = jnp.where((group_size > 0)[:, None], tgt, B * pids.shape[1])
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = (qf * q_coef).astype(codes.dtype)[safe_q]

    def slab_spec(j):
        return pl.BlockSpec(
            (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    def norms_spec(j):
        return pl.BlockSpec(
            (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    kernel = _v9_kernel(kk, slot_mult, levels, gpb, fold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32)]
    (g_packed,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * gpb), *([normsT.reshape(P, 1, C)] * gpb))

    return _scatter_epilogue(g_packed, tgt, pids, codes, ids, norms, q, k,
                             kk, metric, slot_mult, levels, dedup,
                             pool_factor=pool_factor, merge=merge,
                             interpret=interpret, exact=exact,
                             gmin=gmin, ginv=ginv)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "gpb", "fold", "dedup",
                     "pool_factor", "bounds", "merge", "interpret", "exact",
                     "placement"),
)
def grouped_scan_pallas_v11(codes, ids, sizes, norms, q, pids, k: int,
                            metric: str, qt: int = 64, gpb: int = 4,
                            fold: int = 128, dedup: bool = False,
                            pool_factor: int = 1, bounds: str = "analytic",
                            merge: str = "pallas", interpret: bool = False,
                            exact: bool = True, placement: str = "sorted"):
    """v11: the v9 kernel with the SORTED-placement epilogue (see
    _sorted_epilogue) — one packed uint32 sort + one row take replace the
    v10 row scatter (1.83 -> ~0.8 ms at the nlist=512/B=8192 bench shape,
    kernel_ab28). DENSE-ONLY: requires every pid valid (fixed-nprobe
    semantics); callers with masked pid matrices (APS tails) must use v10.
    Same returns/semantics as v10; membership can differ from v10 only at
    quantization ties (the pool holds the same candidates in
    ascending-partition column order).

    placement="argsort" swaps the packed-key sort for an argsort of tgt
    (see _argsort_epilogue): no uint32 bit budget, pool in PROBE order —
    the sorted-placement analog for 10M-scale shapes where
    r_bits + qs_bits >= 32 would otherwise force the v10 row scatter."""
    from quake_tpu.ops.grouped import build_groups_scatter

    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v11 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % fold:
        raise ValueError(f"v11 needs C % fold == 0 (C={C}, fold={fold})")
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2

    qf = q.astype(jnp.float32)
    gmin, grange = _global_bounds(qf, codes, norms, sizes, metric, bounds)
    ginv = float(levels) / grange
    q_coef = 2.0 * ginv if metric == "l2" else ginv
    normsT = ((norms if metric == "l2" else jnp.zeros_like(norms)) + gmin) * ginv

    group_pid, qlist, tgt = build_groups_scatter(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    if placement not in ("sorted", "argsort"):
        raise ValueError(f"v11 placement must be 'sorted' or 'argsort', got {placement!r}")
    if placement == "sorted":
        # Sort-key budget: (qs << r_bits) | row must fit uint32 STRICTLY
        # below the 0xFFFFFFFF invalid marker (at exactly 32 bits an
        # all-ones valid key could collide with it).
        r_bits = max((Gn * qt - 1).bit_length(), 1)
        qs_bits = max((B - 1).bit_length(), 1)
        if r_bits + qs_bits >= 32:
            raise ValueError(
                f"v11 sort key overflows uint32 (B={B}, rows={Gn * qt}); "
                "use placement='argsort' or v10")
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    tgt = jnp.pad(tgt, ((0, Gn - G), (0, 0)),
                  constant_values=B * pids.shape[1])
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    # Unlike v10, ghost (size-0) rows KEEP their pair slot — the sorted
    # placement needs every valid pair to own exactly one row for the
    # [b*nprobe, (b+1)*nprobe) alignment; their stale values are masked in
    # the epilogue via group_size.
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = (qf * q_coef).astype(codes.dtype)[safe_q]

    def slab_spec(j):
        return pl.BlockSpec(
            (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    def norms_spec(j):
        return pl.BlockSpec(
            (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    kernel = _v9_kernel(kk, slot_mult, levels, gpb, fold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32)]
    (g_packed,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * gpb), *([normsT.reshape(P, 1, C)] * gpb))

    epilogue = _sorted_epilogue if placement == "sorted" else _argsort_epilogue
    return epilogue(g_packed, tgt, group_size, pids, codes, ids,
                    norms, q, k, kk, metric, slot_mult, levels,
                    dedup, pool_factor=pool_factor, merge=merge,
                    interpret=interpret, exact=exact,
                    gmin=gmin, ginv=ginv)


def budget_sort_key_fits(B: int, M: int, n_bud: int, P: int, qt: int,
                         gpb: int) -> bool:
    """True when the v11b sorted-placement uint32 key (query << r_bits) |
    row fits strictly below the 0xFFFFFFFF invalid marker for a budgeted
    grid of n_bud pairs (see _sorted_budget_epilogue / v11 guard)."""
    from quake_tpu.ops.grouped import budget_layout

    G = budget_layout(min(n_bud, B * M), P, qt)
    Gn = -(-G // gpb) * gpb
    r_bits = max((Gn * qt - 1).bit_length(), 1)
    qs_bits = max((B - 1).bit_length(), 1)
    return r_bits + qs_bits < 32


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "gpb", "fold", "dedup",
                     "pool_factor", "bounds", "merge", "interpret", "exact",
                     "pair_budget", "placement"),
)
def grouped_scan_pallas_v10b(codes, ids, sizes, norms, q, pids, k: int,
                             metric: str, pair_budget: int, qt: int = 64,
                             gpb: int = 4, fold: int = 128,
                             dedup: bool = False, pool_factor: int = 1,
                             bounds: str = "analytic", merge: str = "pallas",
                             interpret: bool = False, exact: bool = True,
                             placement: str = "scatter"):
    """v10b: the v10 scatter path with machinery sized to a PAIR BUDGET
    (VERDICT r3 #4 — the flat-pair-list grouped scan).

    On the masked APS path most of the [B, M] candidate matrix is -1: the
    plan scans a per-query prefix whose mean is far below M. v10 still
    sizes the group tables, the kernel grid (ghost steps are pl.when-
    skipped but still iterate), and the row scatter to B*M pairs. Here
    build_groups_budget truncates the sorted pair order at pair_budget, so
    all of that scales with the budget; only the initial packed sort and
    the [B*M+1, kk] scatter destination remain M-proportional.

    CONTRACT: valid pairs <= pair_budget (enforced by aps_oneshot's plan
    clipping; excess pairs would be dropped). Same returns/semantics as
    v10 otherwise.

    placement="sorted" (v11b) swaps the row scatter for the sorted
    placement (_sorted_budget_epilogue): one uint32 sort + one [B*W, kk]
    row take replace the [B*M+1, kk] scatter destination — the masked-path
    analog of the v10 -> v11 win. Requires the sort key to fit uint32
    (budget_sort_key_fits); pool columns come out in ascending-pid order
    (membership identical, lane order differs)."""
    from quake_tpu.ops.grouped import budget_layout, build_groups_budget

    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v10b packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % fold:
        raise ValueError(f"v10b needs C % fold == 0 (C={C}, fold={fold})")
    n_bud = min(pair_budget, B * pids.shape[1])
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2

    qf = q.astype(jnp.float32)
    gmin, grange = _global_bounds(qf, codes, norms, sizes, metric, bounds)
    ginv = float(levels) / grange
    q_coef = 2.0 * ginv if metric == "l2" else ginv
    normsT = ((norms if metric == "l2" else jnp.zeros_like(norms)) + gmin) * ginv

    group_pid, qlist, tgt = build_groups_budget(pids, P, qt, n_bud)
    G = budget_layout(n_bud, P, qt)
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    tgt = jnp.pad(tgt, ((0, Gn - G), (0, 0)),
                  constant_values=B * pids.shape[1])
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    if placement == "sorted":
        if not budget_sort_key_fits(B, pids.shape[1], pair_budget, P, qt, gpb):
            raise ValueError(
                f"v11b sort key overflows uint32 (B={B}, rows={Gn * qt}); "
                "use placement='scatter'")
        # Ghost rows KEEP their pair slot (the sorted placement counts one
        # row per valid pair); their stale values are masked via group_size
        # in the epilogue, exactly like v11 dense.
    else:
        # Ghost-skipped groups leave stale VMEM in the joint-select scratch
        # — route their rows to the discard slot (v10 convention).
        tgt = jnp.where((group_size > 0)[:, None], tgt, B * pids.shape[1])
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = (qf * q_coef).astype(codes.dtype)[safe_q]

    def slab_spec(j):
        return pl.BlockSpec(
            (1, C, D), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    def norms_spec(j):
        return pl.BlockSpec(
            (1, 1, C), lambda g, gp_, gs: (jnp.maximum(gp_[gpb * g + j], 0), 0, 0)
        )

    kernel = _v9_kernel(kk, slot_mult, levels, gpb, fold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, gp_, gs: (g, 0, 0))]
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, gp_, gs: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
            pltpu.VMEM((gpb * qt, fold), jnp.float32),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32)]
    (g_packed,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * gpb), *([normsT.reshape(P, 1, C)] * gpb))

    if placement == "sorted":
        return _sorted_budget_epilogue(g_packed, tgt, group_size, pids,
                                       codes, ids, norms, q, k, kk, metric,
                                       slot_mult, levels, dedup,
                                       pool_factor=pool_factor, merge=merge,
                                       interpret=interpret, exact=exact,
                                       gmin=gmin, ginv=ginv)
    return _scatter_epilogue(g_packed, tgt, pids, codes, ids, norms, q, k,
                             kk, metric, slot_mult, levels, dedup,
                             pool_factor=pool_factor, merge=merge,
                             interpret=interpret, exact=exact,
                             gmin=gmin, ginv=ginv)


def _v4_kernel(metric: str, k: int, slot_mult: int, levels: int, gpb: int,
               mat_qg: bool = False):
    """v4 chunked kernel body: one v3p selection per (partition, query-tile,
    chunk) chunk-group over a [QT, CT] tile.

    Size-awareness without the per-tile merge that sank the round-1
    tile-streamed kernel: each chunk emits its own packed top-k and the
    dequantized cross-chunk merge happens in the XLA epilogue (quantized keys
    use per-row-per-chunk scales, so chunks merge exactly like groups).
    Capacity padding past the last chunk is never fetched — DMA, matmul,
    quantize prologue and selection all track ceil(size/ct)*ct instead of C
    (the reference's scan cost is size-proportional too,
    list_scanning.h:241-263). Ghost-tail and empty chunk-groups are
    pl.when-skipped; their slab block indices repeat so the pipeline does
    not re-fetch."""

    def kernel(cg_pid_ref, cg_size_ref, cg_qsrc_ref, cg_chunk_ref, *refs):
        nq = 1 if mat_qg else gpb
        qg_refs = refs[:nq]
        slab_refs = refs[nq:nq + gpb]
        norms_refs = refs[nq + gpb:nq + 2 * gpb]
        out_ref = refs[nq + 2 * gpb]
        stats_ref = refs[nq + 2 * gpb + 1]
        g = pl.program_id(0)
        for j in range(gpb):
            size = cg_size_ref[gpb * g + j]

            def body(j=j, size=size):
                qg = qg_refs[0][j] if mat_qg else qg_refs[j][0]
                out, stats = _v3p_group_body(
                    qg, slab_refs[j][0], norms_refs[j][0, 0, 0],
                    size, metric, k, slot_mult, levels,
                )
                out_ref[j] = out
                stats_ref[j] = stats

            pl.when(size > 0)(body)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "qt", "ct", "gpb", "mat_qg", "dedup", "interpret"),
)
def grouped_scan_pallas_v4(codes, ids, sizes, norms, q, pids, k: int,
                           metric: str, qt: int = 32, ct: int = 512,
                           gpb: int = 8, mat_qg: bool = False,
                           dedup: bool = False, interpret: bool = False):
    """Size-aware chunked grouped scan (see _v4_kernel).

    Same inputs/returns/semantics as grouped_scan_pallas_v3p; additionally
    requires C % ct == 0 (callers pick ct from the store's tile-bucketed C).

    mat_qg: materialize query tiles per CHUNK-group ([G2, QT, D] gather) and
    feed them through one grid-indexed BlockSpec instead of gpb
    scalar-indexed specs over the per-GROUP tiles.
    """
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v4 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % ct:
        raise ValueError(f"v4 needs C % ct == 0 (C={C}, ct={ct})")
    kk = min(k, ct)
    slot_mult = max(1 << (int(ct - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2
    from quake_tpu.ops.grouped import build_chunk_groups

    (cg_pid, cg_chunk, cg_qsrc, cg_size, qlist, pair_cg,
     pair_slot) = build_chunk_groups(pids, sizes, P, qt, ct, C)
    G2 = cg_pid.shape[0]
    Gn = -(-G2 // gpb) * gpb
    cg_pid = jnp.pad(cg_pid, (0, Gn - G2), constant_values=-1)
    cg_chunk = jnp.pad(cg_chunk, (0, Gn - G2))
    cg_qsrc = jnp.pad(cg_qsrc, (0, Gn - G2))
    cg_size = jnp.pad(cg_size, (0, Gn - G2))

    safe_q = jnp.where(qlist >= 0, qlist, 0)  # [G, QT]
    qg = q.astype(codes.dtype)[safe_q]  # [G, QT, D]
    if mat_qg:
        qg_in = qg[cg_qsrc]  # [Gn, QT, D]
        qg_specs = [pl.BlockSpec((gpb, qt, D), lambda g, *_: (g, 0, 0))]
        qg_args = [qg_in]
    else:
        def qg_spec(j):
            return pl.BlockSpec(
                (1, qt, D),
                lambda g, pid_, sz_, qs_, ch_: (qs_[gpb * g + j], 0, 0),
            )

        qg_specs = [qg_spec(j) for j in range(gpb)]
        qg_args = [qg] * gpb

    def slab_spec(j):
        return pl.BlockSpec(
            (1, ct, D),
            lambda g, pid_, sz_, qs_, ch_: (
                jnp.maximum(pid_[gpb * g + j], 0), ch_[gpb * g + j], 0),
        )

    def norms_spec(j):
        # 4D layout so the block's LAST TWO dims (1, ct) equal the array's
        # last two dims — a (1, 1, ct) window over [P, 1, C] violates
        # Mosaic's (8, 128)-divisibility rule when ct < C and lowers to a
        # slow unaligned copy (measured ~10ms per chunk level in ab5/ab6).
        return pl.BlockSpec(
            (1, 1, 1, ct),
            lambda g, pid_, sz_, qs_, ch_: (
                jnp.maximum(pid_[gpb * g + j], 0), ch_[gpb * g + j], 0, 0),
        )

    kernel = _v4_kernel(metric, kk, slot_mult, levels, gpb, mat_qg=mat_qg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Gn // gpb,),
        in_specs=(
            qg_specs
            + [slab_spec(j) for j in range(gpb)]
            + [norms_spec(j) for j in range(gpb)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((gpb, qt, 2), lambda g, *_: (g, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((Gn, qt, 2), jnp.float32),
    ]
    norms4 = norms.reshape(P, C // ct, 1, ct)
    g_packed, g_stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cg_pid, cg_size, cg_qsrc, cg_chunk,
      *qg_args, *([codes] * gpb), *([norms4] * gpb))

    # ---- epilogue: decode, dequantize, two-stage merge, exact rescore ----
    alive = cg_size > 0
    valid = (g_packed >= 0.0) & alive[:, None, None]
    slots_local = jnp.mod(g_packed, float(slot_mult)).astype(jnp.int32)
    keys = jnp.floor(g_packed / float(slot_mult))
    rowmin = g_stats[:, :, 0:1]
    rng = g_stats[:, :, 1:2]
    approx = rowmin + keys * (rng / float(levels))
    if metric == "l2":
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=1)  # [B]
        approx = approx - q_sq[safe_q][cg_qsrc][:, :, None]
    approx = jnp.where(valid, approx, NEG_INF)
    gslot = cg_chunk[:, None, None] * ct + slots_local
    refs = jnp.where(
        valid, (jnp.maximum(cg_pid, 0)[:, None, None] << 16) | gslot, -1)

    # Stage 1: per-(query, probe) reduce the chunks' kk candidates to kk.
    okc = pair_cg >= 0  # [B, nprobe, MAXCH]
    pcg = jnp.where(okc, pair_cg, 0)
    ps = jnp.broadcast_to(pair_slot[:, :, None], pcg.shape)
    s = jnp.where(okc[..., None],
                  _pair_take(approx, pcg.reshape(pcg.shape[0], -1),
                             ps.reshape(ps.shape[0], -1)).reshape(
                      pcg.shape + (approx.shape[-1],)), NEG_INF)
    rf = jnp.where(okc[..., None],
                   _pair_take(refs, pcg.reshape(pcg.shape[0], -1),
                              ps.reshape(ps.shape[0], -1)).reshape(
                       pcg.shape + (refs.shape[-1],)), -1)
    Bq, npb, maxch, _ = s.shape
    s = s.reshape(Bq, npb, maxch * kk)
    rf = rf.reshape(Bq, npb, maxch * kk)
    if maxch > 1:
        s, idx = lax.top_k(s, kk)
        rf = jnp.take_along_axis(rf, idx, axis=2)
    # Stage 2: standard cross-probe merge + exact rescore.
    m_scores = s.reshape(Bq, -1)
    m_refs = rf.reshape(Bq, -1)
    return _rescore_topk(m_scores, m_refs, codes, ids, norms, q, k, kk,
                         metric, pids, dedup=dedup)


def _v5_kernel(metric: str, k: int, slot_mult: int, levels: int, gpb: int,
               maxch: int, ct: int):
    """v5: size-aware chunked scan with IN-KERNEL cross-chunk merge.

    Versus v4 (whose chunk-groups forced a [B, nprobe, maxch*k] stage-1
    lax.top_k in XLA — 13-14ms on its own): the grid stays GROUP-major, each
    group's chunks arrive through static per-chunk BlockSpecs, every chunk
    runs the packed v3p selection over [qt, ct], is dequantized in-kernel
    ([qt, k] scalar math), and a short exact merge over the [qt, maxch*k]
    candidates emits one [qt, k] (score, slot) result per group — the
    epilogue is v3-shaped (single [B, nprobe*k] merge + shared rescore).
    Chunks past ceil(size/ct) skip compute via pl.when (their DMA re-fetches
    the last valid chunk — bounded waste; the VPU work tracks real rows).
    """

    def kernel(group_pid_ref, group_size_ref, qg_ref, *refs):
        slab_refs = refs[:gpb * maxch]  # [j*maxch + c]
        norms_refs = refs[gpb * maxch:2 * gpb * maxch]
        out_s_ref = refs[2 * gpb * maxch]
        out_i_ref = refs[2 * gpb * maxch + 1]
        g = pl.program_id(0)
        mk = maxch * k
        for j in range(gpb):
            size = group_size_ref[gpb * g + j]

            def group_body(j=j, size=size):
                qg = qg_ref[j]
                QT = qg.shape[0]
                lane_mk = jax.lax.broadcasted_iota(jnp.int32, (QT, mk), 1)
                cand_s = jnp.full((QT, mk), NEG_INF, jnp.float32)
                cand_slot = jnp.full((QT, mk), -1, jnp.int32)
                for c in range(maxch):
                    csize = jnp.clip(size - c * ct, 0, ct)
                    packed, stats = _v3p_group_body(
                        qg, slab_refs[j * maxch + c][0],
                        norms_refs[j * maxch + c][0, 0, 0],
                        csize, metric, k, slot_mult, levels,
                    )
                    valid = packed >= 0.0
                    slot_loc = jnp.mod(packed, float(slot_mult))
                    key = jnp.floor(packed / float(slot_mult))
                    s = stats[:, 0:1] + key * (stats[:, 1:2] / float(levels))
                    s = jnp.where(valid, s, NEG_INF)
                    gslot = jnp.where(
                        valid, c * ct + slot_loc.astype(jnp.int32), -1)
                    # Place this chunk's k candidates at lanes [c*k,(c+1)*k).
                    s_p = jnp.pad(
                        s, ((0, 0), (c * k, (maxch - 1 - c) * k)),
                        constant_values=NEG_INF)
                    g_p = jnp.pad(
                        gslot, ((0, 0), (c * k, (maxch - 1 - c) * k)),
                        constant_values=-1)
                    sel = (lane_mk >= c * k) & (lane_mk < (c + 1) * k)
                    cand_s = jnp.where(sel, s_p, cand_s)
                    cand_slot = jnp.where(sel, g_p, cand_slot)

                # Exact k-round merge over the [QT, maxch*k] candidates
                # (slots are unique; ~6 tiny passes per round).
                out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)

                def select_round(i, carry):
                    cs, cslot, outv, outi = carry
                    best = jnp.max(cs, axis=1, keepdims=True)
                    best_slot = jnp.max(
                        jnp.where(cs == best, cslot, -1), axis=1,
                        keepdims=True)
                    winner = (cs == best) & (cslot == best_slot)
                    sel = out_lane == i
                    outv = jnp.where(sel, best, outv)
                    outi = jnp.where(
                        sel, jnp.where(best == NEG_INF, -1, best_slot), outi)
                    return (
                        jnp.where(winner, NEG_INF, cs), cslot, outv, outi)

                init = (
                    cand_s, cand_slot,
                    jnp.full((QT, k), NEG_INF, jnp.float32),
                    jnp.full((QT, k), -1, jnp.int32),
                )
                _, _, outv, outi = lax.fori_loop(0, k, select_round, init)
                out_s_ref[j] = outv
                out_i_ref[j] = outi

            pl.when(size > 0)(group_body)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "ct", "gpb", "dedup", "interpret"),
)
def grouped_scan_pallas_v5(codes, ids, sizes, norms, q, pids, k: int,
                           metric: str, qt: int = 32, ct: int = 512,
                           gpb: int = 4, dedup: bool = False,
                           interpret: bool = False):
    """Size-aware chunked grouped scan with in-kernel cross-chunk merge
    (see _v5_kernel). Same inputs/returns/semantics as
    grouped_scan_pallas_v3pn; requires C % ct == 0 (callers pick ct from the
    store's tile-bucketed C; ct=C degenerates to whole-slab)."""
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v5 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % ct:
        raise ValueError(f"v5 needs C % ct == 0 (C={C}, ct={ct})")
    maxch = C // ct
    kk = min(k, ct)
    slot_mult = max(1 << (int(ct - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = q.astype(codes.dtype)[safe_q]  # [Gn, QT, D]

    def slab_spec(j, c):
        def imap(g, gp_, gs_):
            pid = jnp.maximum(gp_[gpb * g + j], 0)
            nch_last = jnp.maximum((gs_[gpb * g + j] + ct - 1) // ct - 1, 0)
            return (pid, jnp.minimum(c, nch_last), 0)

        return pl.BlockSpec((1, ct, D), imap)

    def norms_spec(j, c):
        def imap(g, gp_, gs_):
            pid = jnp.maximum(gp_[gpb * g + j], 0)
            nch_last = jnp.maximum((gs_[gpb * g + j] + ct - 1) // ct - 1, 0)
            return (pid, jnp.minimum(c, nch_last), 0, 0)

        return pl.BlockSpec((1, 1, 1, ct), imap)

    kernel = _v5_kernel(metric, kk, slot_mult, levels, gpb, maxch, ct)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, *_: (g, 0, 0))]
            + [slab_spec(j, c) for j in range(gpb) for c in range(maxch)]
            + [norms_spec(j, c) for j in range(gpb) for c in range(maxch)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((gpb, qt, kk), lambda g, *_: (g, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((Gn, qt, kk), jnp.int32),
    ]
    norms4 = norms.reshape(P, maxch, 1, ct)
    nmc = gpb * maxch
    g_scores, g_slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * nmc), *([norms4] * nmc))

    # Slim v3-style epilogue: q_sq shift, refs, single merge, shared rescore.
    alive = group_size > 0
    valid = (g_slots >= 0) & alive[:, None, None]
    if metric == "l2":
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=1)
        g_scores = g_scores - q_sq[safe_q][:, :, None]
    g_scores = jnp.where(valid, g_scores, NEG_INF)
    refs = jnp.where(
        valid, (jnp.maximum(gp, 0)[:, None, None] << 16) | g_slots, -1)
    Bq = B
    ok = pair_group >= 0
    pg = jnp.where(ok, pair_group, 0)
    m_scores = jnp.where(
        ok[:, :, None], g_scores[pg, pair_slot], NEG_INF).reshape(Bq, -1)
    m_refs = jnp.where(ok[:, :, None], refs[pg, pair_slot], -1).reshape(Bq, -1)
    return _rescore_topk(m_scores, m_refs, codes, ids, norms, q, k, kk,
                         metric, pids, dedup=dedup)


def _v6_kernel(metric: str, k: int, slot_mult: int, levels: int, gpb: int,
               maxch: int, ct: int, C: int):
    """v6: chunked fetch+matmul, SINGLE whole-row selection.

    ab12's lesson: selection cost tracks ROUND COUNT, not lane width — v5's
    per-chunk top-k (maxch*k rounds) lost 2x despite scanning fewer lanes,
    while its k=1 floor beat v3pn's (chunked DMA/matmul savings are real).
    v6 keeps the chunked BlockSpecs (chunks past ceil(size/ct) re-fetch the
    last valid chunk and skip compute) but assembles the chunk scores into a
    [qt, C] VMEM scratch with static column-slice stores, then runs v3pn's
    ONE k-round packed selection over the full row."""

    def kernel(group_pid_ref, group_size_ref, qg_ref, *refs):
        slab_refs = refs[:gpb * maxch]  # [j*maxch + c]
        norms_refs = refs[gpb * maxch:2 * gpb * maxch]
        out_ref = refs[2 * gpb * maxch]
        stats_ref = refs[2 * gpb * maxch + 1]
        scratch = refs[2 * gpb * maxch + 2]  # [qt, C] f32
        g = pl.program_id(0)
        for j in range(gpb):
            size = group_size_ref[gpb * g + j]

            def group_body(j=j, size=size):
                qg = qg_ref[j]
                for c in range(maxch):
                    csize = jnp.clip(size - c * ct, 0, ct)

                    def chunk_body(c=c, csize=csize, qg=qg):
                        prod = jax.lax.dot_general(
                            qg, slab_refs[j * maxch + c][0],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [qt, ct]
                        if metric == "l2":
                            sc = 2.0 * prod - norms_refs[j * maxch + c][0, 0, 0][None, :]
                        else:
                            sc = prod
                        scratch[:, c * ct:(c + 1) * ct] = sc

                    def chunk_clear(c=c):
                        scratch[:, c * ct:(c + 1) * ct] = jnp.full(
                            (qg.shape[0], ct), NEG_INF, jnp.float32)

                    pl.when(csize > 0)(chunk_body)
                    pl.when(csize <= 0)(chunk_clear)
                out, stats = _v3p_select(
                    scratch[...], size, k, slot_mult, levels)
                out_ref[j] = out
                stats_ref[j] = stats

            pl.when(size > 0)(group_body)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "ct", "gpb", "dedup", "interpret"),
)
def grouped_scan_pallas_v6(codes, ids, sizes, norms, q, pids, k: int,
                           metric: str, qt: int = 32, ct: int = 512,
                           gpb: int = 4, dedup: bool = False,
                           interpret: bool = False):
    """Chunked-fetch single-selection grouped scan (see _v6_kernel). Same
    inputs/returns/semantics as grouped_scan_pallas_v3pn; requires
    C % ct == 0."""
    B, D = q.shape
    P, C, _ = codes.shape
    if P >= 32768 or C > 65536:
        raise ValueError("v6 packs (pid, slot) into int32: needs P < 32768, C <= 65536")
    if C % ct:
        raise ValueError(f"v6 needs C % ct == 0 (C={C}, ct={ct})")
    maxch = C // ct
    kk = min(k, C)
    slot_mult = max(1 << (int(C - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    Gn = -(-G // gpb) * gpb
    gp = jnp.pad(group_pid, (0, Gn - G), constant_values=-1)
    ql = jnp.pad(qlist, ((0, Gn - G), (0, 0)), constant_values=-1)
    group_size = jnp.where(gp >= 0, sizes[jnp.maximum(gp, 0)], 0).astype(jnp.int32)
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = q.astype(codes.dtype)[safe_q]  # [Gn, QT, D]

    def slab_spec(j, c):
        def imap(g, gp_, gs_):
            pid = jnp.maximum(gp_[gpb * g + j], 0)
            nch_last = jnp.maximum((gs_[gpb * g + j] + ct - 1) // ct - 1, 0)
            return (pid, jnp.minimum(c, nch_last), 0)

        return pl.BlockSpec((1, ct, D), imap)

    def norms_spec(j, c):
        def imap(g, gp_, gs_):
            pid = jnp.maximum(gp_[gpb * g + j], 0)
            nch_last = jnp.maximum((gs_[gpb * g + j] + ct - 1) // ct - 1, 0)
            return (pid, jnp.minimum(c, nch_last), 0, 0)

        return pl.BlockSpec((1, 1, 1, ct), imap)

    kernel = _v6_kernel(metric, kk, slot_mult, levels, gpb, maxch, ct, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Gn // gpb,),
        in_specs=(
            [pl.BlockSpec((gpb, qt, D), lambda g, *_: (g, 0, 0))]
            + [slab_spec(j, c) for j in range(gpb) for c in range(maxch)]
            + [norms_spec(j, c) for j in range(gpb) for c in range(maxch)]
        ),
        out_specs=[
            pl.BlockSpec((gpb, qt, kk), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((gpb, qt, 2), lambda g, *_: (g, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((qt, C), jnp.float32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((Gn, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((Gn, qt, 2), jnp.float32),
    ]
    norms4 = norms.reshape(P, maxch, 1, ct)
    nmc = gpb * maxch
    g_packed, g_stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(gp, group_size, qg, *([codes] * nmc), *([norms4] * nmc))
    return _v3p_epilogue(
        g_packed, g_stats, gp, pair_group, pair_slot, pids, safe_q,
        codes, ids, norms, q, k, kk, metric, slot_mult, levels,
        alive=group_size > 0, dedup=dedup,
    )


def _scores_kernel(metric: str):
    """Variant kernel: write raw [QT, C] scores to HBM; selection happens
    outside with XLA's tiled reducer (approx_max_k). Trades one extra HBM
    round-trip of the score matrix for removing the VPU-bound k-round
    selection from the kernel's critical path."""

    def kernel(group_pid_ref, qg_ref, slab_ref, sids_ref, out_ref):
        g = pl.program_id(0)
        pid = group_pid_ref[g]
        qg = qg_ref[0]
        slab = slab_ref[0]
        sids = sids_ref[0, 0]
        prod = jax.lax.dot_general(
            qg,
            slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            qf = qg.astype(jnp.float32)
            sf = slab.astype(jnp.float32)
            q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)
            s_sq = jnp.sum(sf * sf, axis=1)
            scores = 2.0 * prod - q_sq - s_sq[None, :]
        else:
            scores = prod
        valid = (sids >= 0)[None, :] & (pid >= 0)
        out_ref[0] = jnp.where(valid, scores, NEG_INF)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "qt", "interpret")
)
def grouped_scan_pallas_approx(codes, ids, q, pids, k: int, metric: str,
                               qt: int = 64, interpret: bool = False):
    """Pallas matmul + XLA approx_max_k selection variant of
    grouped_scan_pallas. Same signature/returns."""
    from quake_tpu.ops.scan import topk_from_scores

    B, D = q.shape
    P, C, _ = codes.shape
    kk = min(k, C)
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    safe_q = jnp.where(qlist >= 0, qlist, 0)
    qg = q.astype(codes.dtype)[safe_q]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, qt, D), lambda g, gp: (g, 0, 0)),
            pl.BlockSpec((1, C, D), lambda g, gp: (jnp.maximum(gp[g], 0), 0, 0)),
            pl.BlockSpec((1, 1, C), lambda g, gp: (jnp.maximum(gp[g], 0), 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, qt, C), lambda g, gp: (g, 0, 0))],
    )
    (scores_hbm,) = pl.pallas_call(
        _scores_kernel(metric),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, qt, C), jnp.float32)],
        interpret=interpret,
    )(group_pid, qg, codes, ids.reshape(P, 1, C))

    sids = ids[jnp.maximum(group_pid, 0)]  # [G, C]
    g_scores, g_idx = topk_from_scores(
        scores_hbm.reshape(G * qt, C),
        jnp.broadcast_to(sids[:, None, :], (G, qt, C)).reshape(G * qt, C),
        kk,
        approx=True,
    )
    g_scores = g_scores.reshape(G, qt, kk)
    g_ids = g_idx.reshape(G, qt, kk)
    return _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k, kk)


def _sized_kernel(metric: str, k: int, ct: int, max_tiles: int):
    """Size-aware tile-streamed kernel body. EXPERIMENTAL — measured SLOWER
    than the whole-slab kernel on v5e (22-32ms vs 10.6ms at B=1024,
    nprobe=16, 1M x 128, ~75% fill): the per-tile top-k merge multiplies
    selection rounds faster than size-awareness saves DMA. Kept as the
    starting point for a future capacity-class design; grouped_scan_pallas
    is the production kernel.

    Manually DMAs ceil(size/CT) row-tiles of the group's partition from HBM
    (double-buffered), so padded capacity beyond the partition's true size is
    never read nor scanned — DMA and selection cost track the REAL data
    volume (the reference's scan cost is size-proportional too;
    list_scanning.h:241-263). Emits (score, slot) pairs; slot->vector-id
    conversion happens in the XLA epilogue (one small gather), so the ids
    array is never touched by the kernel.
    """

    def kernel(group_pid_ref, group_size_ref, qg_ref, codes_hbm, out_s_ref,
               out_i_ref, slab, sem):
        g = pl.program_id(0)
        pid = jnp.maximum(group_pid_ref[g], 0)
        size = jnp.where(group_pid_ref[g] >= 0, group_size_ref[g], 0)
        n_tiles = (size + ct - 1) // ct
        qg = qg_ref[0]  # [QT, D]
        QT = qg.shape[0]
        q_sq = None
        if metric == "l2":
            qf = qg.astype(jnp.float32)
            q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)

        def tile_dma(slot, t):
            return pltpu.make_async_copy(
                codes_hbm.at[pid, pl.ds(t * ct, ct), :],
                slab.at[slot],
                sem.at[slot],
            )

        @pl.when(n_tiles > 0)
        def _():
            tile_dma(0, 0).start()

        out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (QT, ct), 1)

        def tile_body(t, carry):
            outv, outi = carry
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < n_tiles)
            def _():
                tile_dma(1 - slot, t + 1).start()

            tile_dma(slot, t).wait()
            tile = slab[slot]  # [CT, D]
            prod = jax.lax.dot_general(
                qg, tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [QT, CT]
            if metric == "l2":
                tf = tile.astype(jnp.float32)
                t_sq = jnp.sum(tf * tf, axis=1)
                scores = 2.0 * prod - q_sq - t_sq[None, :]
            else:
                scores = prod
            rem = size - t * ct
            slot_idx = t * ct + row_iota  # global slot of each lane
            scores = jnp.where(row_iota < rem, scores, NEG_INF)

            # Merge this tile's top-k into the running top-k: k rounds over
            # the tile, then the running lists are refreshed by comparing
            # per round against the carry (done jointly: each round picks
            # the max of (remaining tile lanes U remaining carry entries)).
            def select_round(i, c):
                scores_c, outv_c, outi_c, carry_s, carry_i = c
                tile_best = jnp.max(scores_c, axis=1, keepdims=True)
                carry_best = jnp.max(carry_s, axis=1, keepdims=True)
                take_tile = tile_best >= carry_best
                best = jnp.maximum(tile_best, carry_best)
                # winner slot/index from whichever side won
                is_best_t = (scores_c == tile_best) & take_tile
                win_slot_t = jnp.max(jnp.where(is_best_t, slot_idx, -1), axis=1,
                                     keepdims=True)
                is_best_c = (carry_s == carry_best) & ~take_tile
                lane_k = jax.lax.broadcasted_iota(jnp.int32, carry_s.shape, 1)
                win_lane_c = jnp.max(jnp.where(is_best_c, lane_k, -1), axis=1,
                                     keepdims=True)
                win_idx_c = jnp.max(
                    jnp.where(lane_k == win_lane_c, carry_i, -1), axis=1,
                    keepdims=True,
                )
                win = jnp.where(take_tile, win_slot_t, win_idx_c)
                win = jnp.where(best == NEG_INF, -1, win)
                lane = out_lane == i
                outv_c = jnp.where(lane, best, outv_c)
                outi_c = jnp.where(lane, win, outi_c)
                # clear the winner on its side
                scores_c = jnp.where(
                    (slot_idx == win_slot_t) & take_tile, NEG_INF, scores_c
                )
                carry_s = jnp.where(
                    (lane_k == win_lane_c) & ~take_tile, NEG_INF, carry_s
                )
                return scores_c, outv_c, outi_c, carry_s, carry_i

            init = (
                scores,
                jnp.full((QT, k), NEG_INF, jnp.float32),
                jnp.full((QT, k), -1, jnp.int32),
                outv,
                outi,
            )
            _, outv2, outi2, _, _ = lax.fori_loop(0, k, select_round, init)
            return outv2, outi2

        init = (
            jnp.full((QT, k), NEG_INF, jnp.float32),
            jnp.full((QT, k), -1, jnp.int32),
        )
        outv, outi = lax.fori_loop(0, n_tiles, tile_body, init)
        out_s_ref[0] = outv
        out_i_ref[0] = outi

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "qt", "ct", "interpret")
)
def grouped_scan_pallas_sized(codes, ids, sizes, q, pids, k: int, metric: str,
                              qt: int = 32, ct: int = 256,
                              interpret: bool = False):
    """Size-aware tile-streamed variant of grouped_scan_pallas.

    Additional input: sizes [P] int32 (valid-prefix lengths). codes must
    obey the compact-prefix invariant (slots < sizes[p] valid).
    """
    B, D = q.shape
    P, C, _ = codes.shape
    kk = min(k, C)
    max_tiles = -(-C // ct)
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    group_size = jnp.where(
        group_pid >= 0, sizes[jnp.maximum(group_pid, 0)], 0
    ).astype(jnp.int32)
    safe_q = jnp.where(qlist >= 0, qlist, 0)
    qg = q.astype(codes.dtype)[safe_q]

    kernel = _sized_kernel(metric, kk, ct, max_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, qt, D), lambda g, gp, gs: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # codes stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, qt, kk), lambda g, gp, gs: (g, 0, 0)),
            pl.BlockSpec((1, qt, kk), lambda g, gp, gs: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ct, D), codes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, qt, kk), jnp.float32),
        jax.ShapeDtypeStruct((G, qt, kk), jnp.int32),
    ]
    g_scores, g_slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(group_pid, group_size, qg, codes)

    # slot -> vector id (tiny gather; kernel never reads the ids array).
    safe_pid = jnp.maximum(group_pid, 0)[:, None, None]
    safe_slot = jnp.maximum(g_slots, 0)
    g_ids = ids[jnp.broadcast_to(safe_pid, g_slots.shape), safe_slot]
    g_ids = jnp.where(g_slots >= 0, g_ids, -1)
    g_ids = jnp.where(g_scores == NEG_INF, -1, g_ids)
    return _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k, kk)


def _packed_kernel(metric: str, k: int, slot_bits: int):
    """Packed-selection kernel body.

    Packs a monotone 15-bit score key (sign/exponent/7-mantissa of the f32
    score) with the 16-bit slot index into one positive int32:
    `(key15 << 16) | slot`. Packed values are UNIQUE per lane (slot in the
    low bits), so each top-k round is just max -> compare -> clear (~3 VPU
    passes vs ~7 for the unpacked kernel) with no id-disambiguation passes.
    Score quantization only affects near-tie ordering; the wrapper rescores
    the final k candidates exactly, so reported distances are exact.
    """

    def kernel(group_pid_ref, qg_ref, slab_ref, sids_ref, out_ref):
        g = pl.program_id(0)
        pid = group_pid_ref[g]
        qg = qg_ref[0]
        slab = slab_ref[0]
        sids = sids_ref[0, 0]  # [C]
        prod = jax.lax.dot_general(
            qg, slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            qf = qg.astype(jnp.float32)
            sf = slab.astype(jnp.float32)
            q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)
            s_sq = jnp.sum(sf * sf, axis=1)
            scores = 2.0 * prod - q_sq - s_sq[None, :]
        else:
            scores = prod

        QT, C = scores.shape
        bits = pltpu.bitcast(scores, jnp.uint32)
        sign = bits >> 31
        # Monotone total order on f32 bit patterns. Key width adapts to the
        # slot width: slot_bits = ceil(log2(C)), key keeps 31 - slot_bits
        # bits (sign + exponent + as much mantissa as fits).
        key = jnp.where(sign == 1, ~bits, bits | jnp.uint32(0x80000000))
        key_shift = 32 - (31 - slot_bits)
        keyq = (key >> key_shift).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
        packed = (keyq << slot_bits) | lane
        # Mask stale pad slots BEFORE selection: rows beyond the valid
        # prefix hold stale data after compaction and must not occupy
        # top-k rounds (ids == -1 marks them).
        valid = (sids >= 0)[None, :] & (pid >= 0)
        packed = jnp.where(valid, packed, -1)

        out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)

        def select_round(i, carry):
            packed_c, out = carry
            best = jnp.max(packed_c, axis=1, keepdims=True)  # [QT, 1]
            out = jnp.where(out_lane == i, best, out)
            return jnp.where(packed_c == best, -1, packed_c), out

        init = (packed, jnp.full((QT, k), -1, jnp.int32))
        _, out = lax.fori_loop(0, k, select_round, init)
        out_ref[0] = out

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "qt", "interpret")
)
def grouped_scan_pallas_packed(codes, ids, q, pids, k: int, metric: str,
                               qt: int = 32, interpret: bool = False):
    """Packed-selection variant of grouped_scan_pallas with exact final
    rescoring. Same signature/returns (scores, ids, scanned)."""

    B, D = q.shape
    P, C, _ = codes.shape
    kk = min(k, C)
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    safe_q = jnp.where(qlist >= 0, qlist, 0)
    q_cast = q.astype(codes.dtype)
    qg = q_cast[safe_q]

    slot_bits = max(int(C - 1).bit_length(), 1)
    kernel = _packed_kernel(metric, kk, slot_bits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, qt, D), lambda g, gp: (g, 0, 0)),
            pl.BlockSpec((1, C, D), lambda g, gp: (jnp.maximum(gp[g], 0), 0, 0)),
            pl.BlockSpec((1, 1, C), lambda g, gp: (jnp.maximum(gp[g], 0), 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, qt, kk), lambda g, gp: (g, 0, 0))],
    )
    (g_packed,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, qt, kk), jnp.int32)],
        interpret=interpret,
    )(group_pid, qg, codes, ids.reshape(P, 1, C))

    # Unpack: slot + quantized rank key.
    slot_mask = (1 << slot_bits) - 1
    slots = g_packed & slot_mask
    keys = (g_packed >> slot_bits).astype(jnp.float32)
    gpid_b = jnp.broadcast_to(
        jnp.maximum(group_pid, 0)[:, None, None], g_packed.shape
    )
    cand_ids = ids[gpid_b, slots]  # [G, qt, kk] vector ids (-1 for pad slots)
    valid = (g_packed >= 0) & (cand_ids >= 0)
    keys = jnp.where(valid, keys, -1.0)
    cand_ids = jnp.where(valid, cand_ids, -1)
    # Pack (pid, slot) refs so exact rescoring can gather winners' vectors.
    refs = (gpid_b << 16) | slots

    # Per-query merge by quantized key; carry both ids and refs.
    ok = pair_group >= 0
    pg = jnp.where(ok, pair_group, 0)
    m_keys = jnp.where(ok[:, :, None], keys[pg, pair_slot], -1.0).reshape(B, -1)
    m_ids = jnp.where(ok[:, :, None], cand_ids[pg, pair_slot], -1).reshape(B, -1)
    m_refs = jnp.where(ok[:, :, None], refs[pg, pair_slot], -1).reshape(B, -1)
    kfin = min(k, m_keys.shape[1])
    _, idx = lax.top_k(m_keys, kfin)
    top_ids = jnp.take_along_axis(m_ids, idx, axis=1)
    top_refs = jnp.take_along_axis(m_refs, idx, axis=1)

    # Exact rescore of the k winners (restores exact distances/order).
    w_pid = jnp.maximum(top_refs >> 16, 0)
    w_slot = top_refs & 0xFFFF  # refs always pack slot in 16 bits
    vecs = codes[w_pid, w_slot].astype(jnp.float32)  # [B, k, D]
    qf = q.astype(jnp.float32)
    prod = jnp.einsum("bkd,bd->bk", vecs, qf)
    if metric == "l2":
        exact = 2.0 * prod - jnp.sum(qf * qf, axis=1, keepdims=True) - jnp.sum(
            vecs * vecs, axis=2
        )
    else:
        exact = prod
    exact = jnp.where(top_ids >= 0, exact, -jnp.inf)
    scores, order = lax.top_k(exact, kfin)
    out_ids = jnp.take_along_axis(top_ids, order, axis=1)
    out_ids = jnp.where(jnp.isfinite(scores), out_ids, -1)
    scores = jnp.where(out_ids >= 0, scores, -jnp.inf)
    scanned = jnp.sum((pids >= 0).astype(jnp.int32), axis=1)
    return scores, out_ids, scanned


def _multi_kernel(metric: str, k: int, gb: int, C: int, D: int):
    """Multi-group manual-DMA kernel body. EXPERIMENTAL — measured SLOWER
    than the whole-slab BlockSpec kernel on v5e (15.3-19.7ms vs 9.8ms at
    B=1024, nprobe=16): Mosaic's automatic grid pipeline overlaps DMA with
    compute better than this manual double buffer, i.e. per-grid-step
    overhead was NOT the bottleneck. Kept for reference.

    Processes GB groups per grid step: each group's whole [C, D] slab is
    manually DMA'd HBM->VMEM with double buffering (next group's slab loads
    while the current one computes).

    Selection outputs (score, slot) with leftmost-slot tie-break — slots are
    unique per lane, so no ids DMA and no id-disambiguation passes; the
    wrapper recovers vector ids with one small gather.
    """

    def kernel(group_pid_ref, qg_ref, codes_hbm, ids_hbm, out_s_ref, out_i_ref,
               slab, id_slab, sem, id_sem):
        g = pl.program_id(0)

        def slab_dma(slot, j):
            pid = jnp.maximum(group_pid_ref[g * gb + j], 0)
            return pltpu.make_async_copy(
                codes_hbm.at[pid], slab.at[slot], sem.at[slot]
            )

        def ids_dma(slot, j):
            pid = jnp.maximum(group_pid_ref[g * gb + j], 0)
            return pltpu.make_async_copy(
                ids_hbm.at[pid], id_slab.at[slot], id_sem.at[slot]
            )

        slab_dma(0, 0).start()
        ids_dma(0, 0).start()

        for j in range(gb):  # static unroll: GB is small
            if j + 1 < gb:
                slab_dma((j + 1) % 2, j + 1).start()
                ids_dma((j + 1) % 2, j + 1).start()
            slab_dma(j % 2, j).wait()
            ids_dma(j % 2, j).wait()
            pid = group_pid_ref[g * gb + j]
            tile = slab[j % 2]  # [C, D]
            sids = id_slab[j % 2, 0]  # [C]
            qg = qg_ref[j]  # [QT, D]
            prod = jax.lax.dot_general(
                qg, tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if metric == "l2":
                qf = qg.astype(jnp.float32)
                tf = tile.astype(jnp.float32)
                q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)
                t_sq = jnp.sum(tf * tf, axis=1)
                scores = 2.0 * prod - q_sq - t_sq[None, :]
            else:
                scores = prod
            QT = scores.shape[0]
            valid = (sids >= 0)[None, :] & (pid >= 0)
            scores = jnp.where(valid, scores, NEG_INF)

            lane = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
            out_lane = jax.lax.broadcasted_iota(jnp.int32, (QT, k), 1)

            def select_round(i, carry):
                scores_c, outv, outi = carry
                best = jnp.max(scores_c, axis=1, keepdims=True)
                first = jnp.min(
                    jnp.where(scores_c == best, lane, C), axis=1, keepdims=True
                )
                sel = out_lane == i
                outv = jnp.where(sel, best, outv)
                outi = jnp.where(sel, first, outi)
                return jnp.where(lane == first, NEG_INF, scores_c), outv, outi

            init = (
                scores,
                jnp.full((QT, k), NEG_INF, jnp.float32),
                jnp.full((QT, k), C, jnp.int32),
            )
            _, outv, outi = lax.fori_loop(0, k, select_round, init)
            out_s_ref[j] = outv
            out_i_ref[j] = outi

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "qt", "gb", "interpret")
)
def grouped_scan_pallas_multi(codes, ids, q, pids, k: int, metric: str,
                              qt: int = 32, gb: int = 8,
                              interpret: bool = False):
    """Multi-group manual-DMA variant of grouped_scan_pallas (see
    _multi_kernel). Same signature/returns (scores, ids, scanned).

    Stale pad slots are masked AFTER the kernel: selected slots whose id is
    -1 are dropped before the per-query merge; correctness requires pad rows
    to never outrank k real candidates, so the wrapper zeroes pad rows'
    scores by checking ids at merge time AND the store keeps pad rows
    zeroed... instead, to stay exact with arbitrary stale data, the wrapper
    selects k + slack slots in-kernel and filters by id validity.
    """
    B, D = q.shape
    P, C, _ = codes.shape
    kk = min(k, C)
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    n_steps = -(-G // gb)
    pad_g = n_steps * gb - G
    gp = jnp.pad(group_pid, (0, pad_g), constant_values=-1)
    ql = jnp.pad(qlist, ((0, pad_g), (0, 0)), constant_values=-1)
    safe_q = jnp.where(ql >= 0, ql, 0)
    qg = q.astype(codes.dtype)[safe_q]  # [G_pad, QT, D]

    sel_k = kk
    kernel = _multi_kernel(metric, sel_k, gb, C, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((gb, qt, D), lambda g, gp_: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((gb, qt, sel_k), lambda g, gp_: (g, 0, 0)),
            pl.BlockSpec((gb, qt, sel_k), lambda g, gp_: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, C, D), codes.dtype),
            pltpu.VMEM((2, 1, C), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    g_scores, g_slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps * gb, qt, sel_k), jnp.float32),
            jax.ShapeDtypeStruct((n_steps * gb, qt, sel_k), jnp.int32),
        ],
        interpret=interpret,
    )(gp, qg, codes, ids.reshape(P, 1, C))

    # Recover ids; drop stale/pad slots (id == -1).
    gpid_b = jnp.broadcast_to(
        jnp.maximum(gp, 0)[:, None, None], g_slots.shape
    )
    safe_slots = jnp.clip(g_slots, 0, C - 1)
    g_ids = ids[gpid_b, safe_slots]
    valid = (g_slots < C) & (g_ids >= 0)
    g_scores = jnp.where(valid, g_scores, NEG_INF)
    g_ids = jnp.where(valid, g_ids, -1)

    return _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k, sel_k)

