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

    Default builder: single packed-key sort + searchsorted run offsets +
    gather-built group arrays + ONE scatter (the inverse permutation). TPU
    scatters and [B, P] cumsums each cost ~0.6-0.9ms at bench shape
    (kernel_ab10), so the alternatives lose: the original sort path (4
    scatters + bincount + associative_scan) and the matrix-rank path
    (presence scatter + cumsum) both measure ~3.3ms vs ~1.5ms for this one.
    """
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


@functools.partial(jax.jit, static_argnames=("nlist_cap", "qt", "inv_mode"))
def _build_groups_sort(pids, nlist_cap: int, qt: int, inv_mode: str = "scatter"):
    """Scatter-minimal sort-based build_groups (see build_groups).

    One packed-key sort orders pairs by (partition, flat index); per-pid run
    offsets come from vectorized searchsorted; group_pid/qlist are pure
    GATHERS from the sorted order; the only scatter is the inverse
    permutation (original pair -> sorted position).

    inv_mode selects how that inverse permutation is computed (kernel_ab15
    A/B candidates — TPU scatters cost 0.6-0.9 ms at bench shape):
      "scatter"      one .at[order].set(iota) scatter (default)
      "searchsorted" inv = searchsorted(key_sorted, keys) — every pair's key
                     IS in the sorted array, so its insertion point is its
                     sorted position; log2(n) gather rounds, no scatter
      "sort"         second sort of (order * n + iota): position j of the
                     result holds the pair whose sorted position is j
    """
    B, nprobe = pids.shape
    G = group_layout(B, nprobe, nlist_cap, qt)
    n = B * nprobe
    P = nlist_cap
    flat_pid = pids.reshape(-1)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    if (P + 1) * n <= 2**31 - 1:
        # Packed single-key sort: key = (pid+1)*n + flat_index is unique and
        # reproduces the stable order (flat index rises within a pid run).
        key_sorted = jnp.sort((flat_pid + 1) * n + iota_n)
        p_sorted = key_sorted // n - 1
        order = key_sorted - (p_sorted + 1) * n
        # Run offsets: first sorted position with pid >= p, for p in [0, P].
        offs = jnp.searchsorted(
            key_sorted, (jnp.arange(P + 1, dtype=jnp.int32) + 1) * n
        ).astype(jnp.int32)
    else:
        order = jnp.argsort(flat_pid, stable=True).astype(jnp.int32)
        p_sorted = flat_pid[order]
        offs = jnp.searchsorted(
            p_sorted, jnp.arange(P + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

    counts = offs[1:] - offs[:-1]  # [P] pairs per partition
    groups_of = (counts + qt - 1) // qt
    gbase = jnp.cumsum(groups_of) - groups_of  # [P]
    total_groups = jnp.where(P > 0, gbase[-1] + groups_of[-1], 0)

    # Group arrays by GATHER: group g belongs to the partition whose
    # [gbase[p], gbase[p]+groups_of[p]) range contains g. Each populated
    # partition stamps p+1 at its first group slot (scatter-max), and a
    # running max fills its run — measured slightly faster than the
    # searchsorted spelling on v5e (kernel_ab17), and searchsorted over
    # large inputs is catastrophically slow there (ab16: 10.5 ms).
    g_iota = jnp.arange(G, dtype=jnp.int32)
    p_iota = jnp.arange(P, dtype=jnp.int32)
    marks = jnp.zeros((G + 1,), jnp.int32).at[
        jnp.where(groups_of > 0, gbase, G)
    ].max(p_iota + 1, mode="drop")
    p_of_g = lax.cummax(marks[:G]) - 1
    p_of_g = jnp.clip(p_of_g, 0, P - 1)
    g_valid = g_iota < total_groups
    group_pid = jnp.where(g_valid, p_of_g, -1)
    tile = g_iota - gbase[p_of_g]
    start = offs[p_of_g] + tile * qt  # position of the tile's first pair
    lane = jnp.arange(qt, dtype=jnp.int32)
    pos = start[:, None] + lane[None, :]  # [G, qt] sorted positions
    in_run = pos < (offs[p_of_g] + counts[p_of_g])[:, None]
    # qid of a sorted position = original flat index // nprobe.
    qs = order[jnp.clip(pos, 0, n - 1)] // nprobe
    qlist = jnp.where(g_valid[:, None] & in_run, qs, -1)

    # Pair-major group/slot: rank = sorted position - run offset.
    if inv_mode == "searchsorted" and (P + 1) * n <= 2**31 - 1:
        keys = (flat_pid + 1) * n + iota_n
        inv = jnp.searchsorted(key_sorted, keys).astype(jnp.int32)
    elif inv_mode == "sort":
        # Two-operand sort (key=order, payload=iota): row j of the payload
        # is the pair whose sorted position is j. (order * n + iota would
        # overflow int32 at bench shapes.)
        _, inv = jax.lax.sort((order, iota_n), num_keys=1)
    else:
        inv = jnp.zeros((n,), jnp.int32).at[order].set(iota_n)
    rank = inv.reshape(B, nprobe) - offs[jnp.clip(pids, 0, P - 1)]
    ok = pids >= 0
    pair_group = jnp.where(
        ok, gbase[jnp.clip(pids, 0, P - 1)] + rank // qt, -1
    ).astype(jnp.int32)
    pair_slot = jnp.where(ok, rank % qt, 0).astype(jnp.int32)
    return group_pid, qlist, pair_group, pair_slot


@functools.partial(jax.jit, static_argnames=("nlist_cap", "qt"))
def build_groups_scatter(pids, nlist_cap: int, qt: int):
    """build_groups variant for the SCATTER epilogue (v10): returns, instead
    of the pair-major (pair_group, pair_slot) inverse permutation, the flat
    pair index of every kernel row — so the epilogue can scatter kernel
    output rows straight into pair-major order.

    Kernel row (g, t) covers sorted position pos = offs[p] + tile*qt + t;
    its original pair is order[pos] = b*nprobe + j. That array is already
    materialized for qlist (qs = order[pos] // nprobe), so dropping the
    inverse permutation removes the [n] scatter (0.6-0.9 ms at bench shape,
    kernel_ab10) and the rank arithmetic at zero added gathers.

    Returns:
      group_pid [G] int32    partition of each group (-1 = unused)
      qlist     [G, QT]      query indices per group (-1 = pad)
      tgt       [G, QT]      flat pair index (b*nprobe + j) of each kernel
                             row; n = B*nprobe for invalid rows (scatter to
                             a discard slot)
    """
    B, nprobe = pids.shape
    G = group_layout(B, nprobe, nlist_cap, qt)
    n = B * nprobe
    P = nlist_cap
    flat_pid = pids.reshape(-1)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    if (P + 1) * n <= 2**31 - 1:
        key_sorted = jnp.sort((flat_pid + 1) * n + iota_n)
        order = key_sorted - (key_sorted // n) * n
        offs = jnp.searchsorted(
            key_sorted, (jnp.arange(P + 1, dtype=jnp.int32) + 1) * n
        ).astype(jnp.int32)
    else:
        order = jnp.argsort(flat_pid, stable=True).astype(jnp.int32)
        p_sorted = flat_pid[order]
        offs = jnp.searchsorted(
            p_sorted, jnp.arange(P + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

    counts = offs[1:] - offs[:-1]
    groups_of = (counts + qt - 1) // qt
    gbase = jnp.cumsum(groups_of) - groups_of
    total_groups = jnp.where(P > 0, gbase[-1] + groups_of[-1], 0)

    g_iota = jnp.arange(G, dtype=jnp.int32)
    p_iota = jnp.arange(P, dtype=jnp.int32)
    marks = jnp.zeros((G + 1,), jnp.int32).at[
        jnp.where(groups_of > 0, gbase, G)
    ].max(p_iota + 1, mode="drop")
    p_of_g = lax.cummax(marks[:G]) - 1
    p_of_g = jnp.clip(p_of_g, 0, P - 1)
    g_valid = g_iota < total_groups
    group_pid = jnp.where(g_valid, p_of_g, -1)
    tile = g_iota - gbase[p_of_g]
    start = offs[p_of_g] + tile * qt
    lane = jnp.arange(qt, dtype=jnp.int32)
    pos = start[:, None] + lane[None, :]
    in_run = pos < (offs[p_of_g] + counts[p_of_g])[:, None]
    tgt_raw = order[jnp.clip(pos, 0, n - 1)]  # [G, qt] flat pair index
    valid = g_valid[:, None] & in_run
    qlist = jnp.where(valid, tgt_raw // nprobe, -1)
    tgt = jnp.where(valid, tgt_raw, n)
    return group_pid, qlist, tgt


def budget_layout(n_bud: int, nlist_cap: int, qt: int) -> int:
    """Worst-case group count for a pair-budgeted grouping: at most
    min(n_bud, nlist_cap) distinct partitions, each adding one partial
    group on top of the n_bud // qt full ones (see group_layout)."""
    return min(n_bud, nlist_cap) + n_bud // qt


@functools.partial(jax.jit, static_argnames=("nlist_cap", "qt", "n_bud"))
def build_groups_budget(pids, nlist_cap: int, qt: int, n_bud: int):
    """build_groups_scatter with the machinery sized to a PAIR BUDGET.

    The masked APS scan hands grouped_scan a [B, M] candidate matrix in
    which only the planned prefix of each row is valid (often ~40% of the
    pairs at production targets). build_groups_scatter still sizes every
    downstream array — group tables, kernel grid, scatter targets — to the
    worst case B*M. Here invalid pairs are keyed to sort LAST and the
    sorted order is truncated to n_bud, so everything after the (still
    B*M-sized) packed sort scales with the budget instead.

    CONTRACT: the caller guarantees the number of valid pairs is <= n_bud
    (aps_oneshot's plan clipping enforces it on the APS path). Valid pairs
    beyond the budget would be silently dropped.

    Returns (group_pid [Gb], qlist [Gb, QT], tgt [Gb, QT]) with
    Gb = budget_layout(n_bud, nlist_cap, qt); tgt is the flat pair index
    b * M + j of each kernel row (n = B*M for discard rows), exactly as
    build_groups_scatter returns.
    """
    B, nprobe = pids.shape
    n = B * nprobe
    n_bud = min(n_bud, n)
    G = budget_layout(n_bud, nlist_cap, qt)
    P = nlist_cap
    flat_pid = pids.reshape(-1)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    ok = flat_pid >= 0

    if (P + 2) * n <= 2**31 - 1:
        # Packed single-key sort with invalid pairs keyed LAST:
        # key = (pid+1)*n + i for valid, (P+1)*n + i for invalid.
        keys = jnp.where(ok, (flat_pid + 1) * n + iota_n, (P + 1) * n + iota_n)
        key_sorted = jnp.sort(keys)[:n_bud]
        order = key_sorted - (key_sorted // n) * n
        offs = jnp.searchsorted(
            key_sorted, (jnp.arange(P + 1, dtype=jnp.int32) + 1) * n
        ).astype(jnp.int32)
    else:
        safe = jnp.where(ok, flat_pid, P)  # invalid sorts last
        p_sorted, order = jax.lax.sort(
            (safe, iota_n), num_keys=1)
        p_sorted, order = p_sorted[:n_bud], order[:n_bud]
        offs = jnp.searchsorted(
            p_sorted, jnp.arange(P + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

    counts = offs[1:] - offs[:-1]
    groups_of = (counts + qt - 1) // qt
    gbase = jnp.cumsum(groups_of) - groups_of
    total_groups = jnp.where(P > 0, gbase[-1] + groups_of[-1], 0)

    g_iota = jnp.arange(G, dtype=jnp.int32)
    p_iota = jnp.arange(P, dtype=jnp.int32)
    marks = jnp.zeros((G + 1,), jnp.int32).at[
        jnp.where(groups_of > 0, jnp.minimum(gbase, G), G)
    ].max(p_iota + 1, mode="drop")
    p_of_g = lax.cummax(marks[:G]) - 1
    p_of_g = jnp.clip(p_of_g, 0, P - 1)
    g_valid = g_iota < total_groups
    group_pid = jnp.where(g_valid, p_of_g, -1)
    tile = g_iota - gbase[p_of_g]
    start = offs[p_of_g] + tile * qt
    lane = jnp.arange(qt, dtype=jnp.int32)
    pos = start[:, None] + lane[None, :]
    in_run = pos < (offs[p_of_g] + counts[p_of_g])[:, None]
    tgt_raw = order[jnp.clip(pos, 0, n_bud - 1)]
    valid = g_valid[:, None] & in_run
    qlist = jnp.where(valid, tgt_raw // nprobe, -1)
    tgt = jnp.where(valid, tgt_raw, n)
    return group_pid, qlist, tgt


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
    jax.jit, static_argnames=("k", "metric", "qt", "group_chunk", "dedup")
)
def grouped_scan_xla(codes, ids, q, pids, k: int, metric: str,
                     qt: int = 64, group_chunk: int = 64, norms=None,
                     dedup: bool = False):
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

    return _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k, kk,
                         dedup=dedup)


def _merge_groups(g_scores, g_ids, pair_group, pair_slot, pids, k: int,
                  kk: int, dedup: bool = False):
    """Epilogue: gather each query's per-probe group results and merge.

    dedup: spilled stores hold each vector in two partitions; keep only the
    first occurrence of each id (see _rescore_topk in pallas_grouped)."""
    B, nprobe = pair_group.shape
    ok = pair_group >= 0
    pg = jnp.where(ok, pair_group, 0)
    # Flattened single-axis row gather: the 2-index advanced-indexing
    # spelling lowers to a slow XLA gather path on TPU (kernel_ab18).
    G, qt, kk_ = g_scores.shape
    flat_idx = pg * qt + pair_slot
    s = jnp.take(g_scores.reshape(G * qt, kk_), flat_idx, axis=0)
    i = jnp.take(g_ids.reshape(G * qt, kk_), flat_idx, axis=0)
    s = jnp.where(ok[:, :, None], s, NEG_INF)
    i = jnp.where(ok[:, :, None], i, -1)
    pool = min(2 * k if dedup else k, nprobe * kk)
    scores, out_ids = topk_from_scores(
        s.reshape(B, nprobe * kk), i.reshape(B, nprobe * kk), pool
    )
    if dedup:
        earlier = (
            lax.broadcasted_iota(jnp.int32, (pool, pool), 1)
            < lax.broadcasted_iota(jnp.int32, (pool, pool), 0)
        )
        same = out_ids[:, :, None] == out_ids[:, None, :]
        is_dup = jnp.any(same & earlier[None] & (out_ids >= 0)[:, :, None],
                         axis=2)
        scores = jnp.where(is_dup, NEG_INF, scores)
        out_ids = jnp.where(is_dup, -1, out_ids)
        scores, order = lax.top_k(scores, pool)
        out_ids = jnp.take_along_axis(out_ids, order, axis=1)
    scores = scores[:, :k]
    out_ids = out_ids[:, :k]
    if scores.shape[1] < k:
        # Fewer candidates than k: pad with -1/-inf (reference convention,
        # query_coordinator.cpp:447-456).
        pad = k - scores.shape[1]
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        out_ids = jnp.pad(out_ids, ((0, 0), (0, pad)), constant_values=-1)
    scanned = jnp.sum((pids >= 0).astype(jnp.int32), axis=1)
    return scores, out_ids, scanned
