"""Partition-major grouped scan: the high-throughput batched search path.

The reference's batched_serial_scan groups queries by partition on the host
so each partition is scanned once per batch (query_coordinator.cpp:708-721).
This is the TPU-native equivalent, fully on device:

  prologue  — invert pids [B, nprobe] into fixed-size groups: each group is
              (partition, up to QT probing queries). Partitions probed by
              more than QT queries span multiple groups. All static shapes
              (sort + segmented ranks + scatter).
  scan      — for each group, stream the partition slab once and compute a
              [QT, C] score matmul + per-query top-k. Two backends: a chunked
              XLA einsum (works everywhere) and a Pallas kernel with
              scalar-prefetch-indexed slab DMA (TPU).
  epilogue  — scatter group results back per query and merge top-k.

Why it matters: the query-major path gathers each probed partition once per
probing query (B*nprobe slab reads); this path reads each probed partition
once per batch — at large batch the whole store streams once, which is the
HBM bandwidth floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from quake_tpu.ops.scan import NEG_INF, topk_from_scores


def group_layout(B: int, nprobe: int, nlist_cap: int, qt: int) -> int:
    """Worst-case number of groups: every probed partition needs
    ceil(count/QT) groups; counts sum to B*nprobe and there are at most
    min(B*nprobe, nlist_cap) distinct partitions."""
    n_pairs = B * nprobe
    max_unique = min(n_pairs, nlist_cap)
    return max_unique + n_pairs // qt


@functools.partial(jax.jit, static_argnames=("nlist_cap", "qt"))
def build_groups(pids, nlist_cap: int, qt: int):
    """Invert per-query probe lists into partition-major groups.

    pids: [B, nprobe] int32 (-1 = pad). Returns:
      group_pid  [G] int32      partition of each group (-1 = unused group)
      qlist      [G, QT] int32  query indices per group (-1 = pad)
      pair_group [B, nprobe]    group of each (query, probe) pair
      pair_slot  [B, nprobe]    slot within the group

    Two builders with identical outputs:
      * matrix rank (default when B*nlist_cap is modest): scatter a [B, P]
        presence one-hot, exclusive-cumsum along B, gather per-pair ranks —
        no sort at all (~6x faster than the 65536-pair argsort the sort
        path needs at bench shape).
      * packed single-key sort (fallback for huge B*P).
    """
    B, nprobe = pids.shape
    if B * nlist_cap <= 1 << 26:
        return _build_groups_matrix(pids, nlist_cap, qt)
    return _build_groups_sort(pids, nlist_cap, qt)


@functools.partial(jax.jit, static_argnames=("nlist_cap", "qt"))
def _build_groups_matrix(pids, nlist_cap: int, qt: int):
    """Sort-free build_groups via presence-matrix prefix ranks.

    rank(b, j) = number of pairs from earlier queries probing the same
    partition (exclusive cumsum over the query axis of a [B, P] probe-count
    matrix, gathered at (b, pids[b, j])) plus the number of earlier probes
    of the same partition within the row (rows normally probe distinct
    partitions, but arbitrary pids are part of the contract)."""
    B, nprobe = pids.shape
    G = group_layout(B, nprobe, nlist_cap, qt)
    safe = jnp.where(pids >= 0, pids, nlist_cap)
    pres = jnp.zeros((B, nlist_cap + 1), jnp.int32)
    pres = pres.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], safe
    ].add(1, mode="drop")
    before = jnp.cumsum(pres, axis=0) - pres  # exclusive over queries
    eq = safe[:, :, None] == safe[:, None, :]  # [B, j, j']
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (nprobe, nprobe), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (nprobe, nprobe), 0)
    )
    dup_rank = jnp.sum((eq & earlier[None]).astype(jnp.int32), axis=2)
    rank = jnp.take_along_axis(before, safe, axis=1) + dup_rank  # [B, nprobe]
    counts = before[-1] + pres[-1]  # [P+1] pairs per partition
    groups_of = (counts[:nlist_cap] + qt - 1) // qt
    gbase = jnp.cumsum(groups_of) - groups_of  # [P]
    gb = jnp.where(pids >= 0, gbase[jnp.clip(pids, 0, nlist_cap - 1)], G)
    pair_group = (gb + rank // qt).astype(jnp.int32)
    pair_slot = (rank % qt).astype(jnp.int32)
    pair_group = jnp.where(pids >= 0, pair_group, -1)
    pair_slot = jnp.where(pids >= 0, pair_slot, 0)

    tgt = jnp.where(pids >= 0, pair_group, G)
    group_pid = jnp.full((G,), -1, jnp.int32).at[tgt.reshape(-1)].set(
        pids.reshape(-1), mode="drop")
    qid = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, nprobe))
    qlist = jnp.full((G, qt), -1, jnp.int32).at[
        tgt.reshape(-1), pair_slot.reshape(-1)
    ].set(qid.reshape(-1), mode="drop")
    return group_pid, qlist, pair_group, pair_slot


@functools.partial(jax.jit, static_argnames=("nlist_cap", "qt"))
def _build_groups_sort(pids, nlist_cap: int, qt: int):
    """Sort-based build_groups (see build_groups)."""
    B, nprobe = pids.shape
    G = group_layout(B, nprobe, nlist_cap, qt)
    n = B * nprobe
    flat_pid = pids.reshape(-1)
    flat_qid = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, nprobe)
    ).reshape(-1)

    # Sort pairs by partition (pads (-1) sort first). Sorting ONE packed
    # int32 key ((pid+1)*n + flat_index, unique) is ~2x faster on TPU than
    # a stable argsort (which sorts (key, iota) pairs) and reproduces the
    # stable order exactly, since flat_index rises within each pid run.
    if (nlist_cap + 1) * n <= 2**31 - 1:
        key_sorted = jnp.sort((flat_pid + 1) * n + jnp.arange(n, dtype=jnp.int32))
        p_sorted = key_sorted // n - 1
        order = key_sorted - (p_sorted + 1) * n
    else:
        order = jnp.argsort(flat_pid, stable=True)
        p_sorted = flat_pid[order]
    q_sorted = flat_qid[order]
    valid = p_sorted >= 0

    # Rank within equal-pid run.
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), p_sorted[1:] != p_sorted[:-1]]
    )
    run_start = lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - run_start

    # Groups per partition run: ceil(count/qt); base group index = cumulative
    # groups of preceding runs. Compute per-position: each run start
    # contributes ceil(run_count/qt) groups.
    counts = jnp.bincount(jnp.where(valid, p_sorted, nlist_cap), length=nlist_cap + 1)
    run_count = counts[jnp.clip(p_sorted, 0, nlist_cap - 1)]
    groups_of_run = (run_count + qt - 1) // qt
    # prefix over run starts, in sorted order
    start_contrib = jnp.where(is_start & valid, groups_of_run, 0)
    base_after = jnp.cumsum(start_contrib)
    base = base_after - jnp.where(valid, groups_of_run, 0)

    group_sorted = (base + rank // qt).astype(jnp.int32)
    slot_sorted = (rank % qt).astype(jnp.int32)
    group_sorted = jnp.where(valid, group_sorted, G)  # pads -> dropped
    slot_sorted = jnp.where(valid, slot_sorted, 0)

    group_pid = jnp.full((G,), -1, jnp.int32).at[group_sorted].set(
        p_sorted, mode="drop"
    )
    qlist = jnp.full((G, qt), -1, jnp.int32).at[group_sorted, slot_sorted].set(
        q_sorted, mode="drop"
    )

    # Invert the sort to pair-major layout.
    pair_group = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(valid, group_sorted, -1)
    )
    pair_slot = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    return (
        group_pid,
        qlist,
        pair_group.reshape(B, nprobe),
        pair_slot.reshape(B, nprobe),
    )


@functools.partial(jax.jit, static_argnames=("nlist_cap", "qt", "ct", "cap"))
def build_chunk_groups(pids, sizes, nlist_cap: int, qt: int, ct: int, cap: int):
    """Chunk-level grouping for the size-aware v4 kernel.

    Extends build_groups: each (partition, query-tile) group expands into
    ceil(size/ct) chunk-groups covering only the partition's valid prefix —
    capacity padding beyond the last chunk is never DMA'd nor scanned (the
    reference's scan cost is size-proportional too, list_scanning.h:241-263).
    Chunk-groups are compact-prefix in [0, total_chunks) so the kernel can
    skip the ghost tail.

    Returns:
      cg_pid   [G2] int32   partition of each chunk-group (-1 = unused)
      cg_chunk [G2] int32   chunk index within the partition (units of ct)
      cg_qsrc  [G2] int32   source group index (row into qlist)
      cg_size  [G2] int32   valid lanes in this chunk (0 = skip)
      qlist    [G, QT] int32
      pair_cg  [B, nprobe, MAXCH] int32  chunk-groups of each pair (-1 pad)
      pair_slot [B, nprobe] int32
    """
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, nlist_cap, qt)
    G = group_pid.shape[0]
    maxch = -(-cap // ct)
    G2 = G * maxch
    gsz = jnp.where(group_pid >= 0, sizes[jnp.maximum(group_pid, 0)], 0)
    gsz = gsz.astype(jnp.int32)
    nch = (gsz + ct - 1) // ct  # chunks this group actually needs
    base = jnp.cumsum(nch) - nch  # compact-prefix chunk-group base per group
    ch = jnp.arange(maxch, dtype=jnp.int32)
    tgt = base[:, None] + ch[None, :]  # [G, MAXCH]
    tgt = jnp.where(ch[None, :] < nch[:, None], tgt, G2)  # drop unused
    gidx = jnp.arange(G, dtype=jnp.int32)
    cg_pid = jnp.full((G2,), -1, jnp.int32).at[tgt].set(
        jnp.broadcast_to(group_pid[:, None], (G, maxch)), mode="drop")
    cg_chunk = jnp.zeros((G2,), jnp.int32).at[tgt].set(
        jnp.broadcast_to(ch[None, :], (G, maxch)), mode="drop")
    cg_qsrc = jnp.zeros((G2,), jnp.int32).at[tgt].set(
        jnp.broadcast_to(gidx[:, None], (G, maxch)), mode="drop")
    cg_size = jnp.zeros((G2,), jnp.int32).at[tgt].set(
        jnp.clip(gsz[:, None] - ch[None, :] * ct, 0, ct), mode="drop")

    # Per-pair chunk-group pointers for the epilogue merge.
    ok = pair_group >= 0
    pg = jnp.where(ok, pair_group, 0)
    pair_cg = base[pg][:, :, None] + ch[None, None, :]
    pair_cg = jnp.where(
        ok[:, :, None] & (ch[None, None, :] < nch[pg][:, :, None]),
        pair_cg, -1,
    ).astype(jnp.int32)
    return cg_pid, cg_chunk, cg_qsrc, cg_size, qlist, pair_cg, pair_slot


def _group_scores(qg, slab, sids, metric: str, snorms=None):
    """qg [Gc, QT, D], slab [Gc, C, D], sids [Gc, C] -> scores [Gc, QT, C].

    snorms: optional [Gc, C] cached squared norms of the slab (StoreState.norms)
    — skips the per-slab ||x||^2 reduction."""
    prod = jax.lax.dot_general(
        qg,
        slab,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        qf = qg.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=2)  # [Gc, QT]
        if snorms is None:
            sf = slab.astype(jnp.float32)
            snorms = jnp.sum(sf * sf, axis=2)  # [Gc, C]
        scores = 2.0 * prod - q_sq[:, :, None] - snorms[:, None, :]
    else:
        scores = prod
    return jnp.where((sids >= 0)[:, None, :], scores, NEG_INF)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "qt", "group_chunk")
)
def grouped_scan_xla(codes, ids, q, pids, k: int, metric: str,
                     qt: int = 64, group_chunk: int = 64, norms=None):
    """Partition-major batched scan, chunked-XLA backend.

    codes [P, C, D], ids [P, C], q [B, D], pids [B, nprobe] int32;
    norms: optional [P, C] cached squared norms.
    Returns (scores [B, k], ids [B, k], partitions_scanned [B]).
    """
    B, D = q.shape
    nprobe = pids.shape[1]
    P, C, _ = codes.shape
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, qt)
    G = group_pid.shape[0]
    kk = min(k, C)

    # Pad groups to a chunk multiple.
    n_chunks = -(-G // group_chunk)
    pad = n_chunks * group_chunk - G
    gp = jnp.pad(group_pid, (0, pad), constant_values=-1)
    ql = jnp.pad(qlist, ((0, pad), (0, 0)), constant_values=-1)
    gp_c = gp.reshape(n_chunks, group_chunk)
    ql_c = ql.reshape(n_chunks, group_chunk, qt)

    q_cast = q.astype(codes.dtype)

    def scan_chunk(args):
        gpid, gql = args  # [Gc], [Gc, QT]
        safe_pid = jnp.where(gpid >= 0, gpid, 0)
        slab = codes[safe_pid]  # [Gc, C, D]
        sids = ids[safe_pid]
        sids = jnp.where((gpid >= 0)[:, None], sids, -1)
        safe_q = jnp.where(gql >= 0, gql, 0)
        qg = q_cast[safe_q]  # [Gc, QT, D]
        snorms = norms[safe_pid] if norms is not None else None
        scores = _group_scores(qg, slab, sids, metric, snorms)  # [Gc, QT, C]
        Gc = scores.shape[0]
        s, i = topk_from_scores(
            scores.reshape(Gc * qt, C),
            jnp.broadcast_to(sids[:, None, :], (Gc, qt, C)).reshape(Gc * qt, C),
            kk,
            approx=True,
        )
        return s.reshape(Gc, qt, kk), i.reshape(Gc, qt, kk)

    g_scores, g_ids = lax.map(scan_chunk, (gp_c, ql_c))
    g_scores = g_scores.reshape(n_chunks * group_chunk, qt, kk)
    g_ids = g_ids.reshape(n_chunks * group_chunk, qt, kk)

    return _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k, kk)


def _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k: int, kk: int):
    """Epilogue: gather each query's per-probe group results and merge."""
    B, nprobe = pair_group.shape
    ok = pair_group >= 0
    pg = jnp.where(ok, pair_group, 0)
    s = g_scores[pg, pair_slot]  # [B, nprobe, kk]
    i = g_ids[pg, pair_slot]
    s = jnp.where(ok[:, :, None], s, NEG_INF)
    i = jnp.where(ok[:, :, None], i, -1)
    scores, out_ids = topk_from_scores(
        s.reshape(B, nprobe * kk), i.reshape(B, nprobe * kk), min(k, nprobe * kk)
    )
    if scores.shape[1] < k:
        # Fewer candidates than k: pad with -1/-inf (reference convention,
        # query_coordinator.cpp:447-456).
        pad = k - scores.shape[1]
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        out_ids = jnp.pad(out_ids, ((0, 0), (0, pad)), constant_values=-1)
    scanned = jnp.sum((pids >= 0).astype(jnp.int32), axis=1)
    return scores, out_ids, scanned
