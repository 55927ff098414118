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
    """
    B, nprobe = pids.shape
    G = group_layout(B, nprobe, nlist_cap, qt)
    n = B * nprobe
    flat_pid = pids.reshape(-1)
    flat_qid = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, nprobe)
    ).reshape(-1)

    # Sort pairs by partition (pads (-1) sort first).
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
