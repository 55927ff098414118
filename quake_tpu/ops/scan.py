"""Device scan kernels: batched distance computation + top-k selection.

TPU-native replacement for the reference's SIMD scan kernels
(src/cpp/include/list_scanning.h:241-366). Instead of a per-vector SIMD loop
feeding a TopkBuffer, distances are computed as MXU matmuls over padded
partition slabs and selection is a fused `lax.top_k` merge.

Conventions (matching the reference's output semantics):
  * Internally everything is a "score" — higher is better. L2 uses the
    negated *squared* distance; IP uses the raw inner product.
  * Invalid slots/ids carry score NEG_INF and id -1.
  * User-facing L2 distances are sqrt'd (list_scanning.h:260,352-357);
    missing results are padded with id=-1 and +inf (L2) / -inf (IP)
    (query_coordinator.cpp:447-456).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = jnp.float32(-jnp.inf)


def merge_topk(scores_a, ids_a, scores_b, ids_b, k: int):
    """Merge two per-query candidate sets into top-k (higher score = better).

    scores_*: [B, ka]/[B, kb] f32; ids_*: int32. Returns ([B,k], [B,k]).
    The analog of TopkBuffer::batch_add + flush (list_scanning.h:117-173).
    """
    scores = jnp.concatenate([scores_a, scores_b], axis=1)
    ids = jnp.concatenate([ids_a, ids_b], axis=1)
    return topk_from_scores(scores, ids, k)


def topk_from_scores(scores, ids, k: int, approx: bool = False):
    """Select top-k by score, gathering ids along. scores [B, M], ids [B, M].

    With approx=True, wide rows use lax.approx_max_k — the TPU-optimized
    tiled max-reduction from "TPU-KNN: K Nearest Neighbor Search at Peak
    FLOP/s" (exact on CPU; recall_target=0.99 on TPU) — because lax.top_k
    lowers to a full sort costing ~1000x the distance matmul it follows.
    Only the grouped-scan block selections opt in; flat (exact-mode) scans
    and result merges stay exact so flat search keeps recall 1.0.
    """
    k = min(k, scores.shape[1])
    if approx and scores.shape[1] > 256 and k <= 128:
        top_scores, idx = lax.approx_max_k(scores, k, recall_target=0.99)
    else:
        top_scores, idx = lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, idx, axis=1)
    # Squash ids of -inf entries to -1 so padding never leaks a real-looking id.
    top_ids = jnp.where(top_scores == NEG_INF, jnp.int32(-1), top_ids)
    return top_scores, top_ids


def _block_scores(q, q_sq, block, block_sq, metric: str):
    """Scores of queries vs a block of vectors: q [B,D], block [M,D] -> [B,M]."""
    prod = jax.lax.dot_general(
        q,
        block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        return 2.0 * prod - q_sq[:, None] - block_sq[None, :]
    return prod


def flat_scan(q, codes, ids, k: int, metric: str = "l2", chunk_size: int = 8192,
              approx: bool = False):
    """Top-k of queries against a flat (padded) buffer of vectors.

    q: [B, D]; codes: [N, D] (N padded); ids: [N] int32 with -1 = invalid slot.
    Returns (scores [B,k], ids [B,k]). Exact by default (the user-facing flat
    index mode); approx=True switches selection to the tiled reducer — used
    for the PARENT centroid ranking inside IVF search, where a full sort of
    the [B, nlist] score matrix would dominate the whole query
    (candidate-set selection tolerates 0.99-recall ranking).

    The analog of scanning a flat index / the parent centroid index
    (query_coordinator.cpp:624-626). Each chunk is one [B,D]x[D,chunk] MXU
    matmul; a running top-k is merged across chunks with lax.scan so the
    [B, N] score matrix never materializes.
    """
    B, D = q.shape
    N = codes.shape[0]
    k = min(k, N)
    q = q.astype(codes.dtype)
    q_sq = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=1)

    if N <= chunk_size:
        block_sq = jnp.sum(codes.astype(jnp.float32) * codes.astype(jnp.float32), axis=1)
        scores = _block_scores(q, q_sq, codes, block_sq, metric)
        scores = jnp.where((ids >= 0)[None, :], scores, NEG_INF)
        return topk_from_scores(scores, jnp.broadcast_to(ids[None, :], (B, N)), k,
                                approx=approx)

    # Pad to a chunk multiple and scan.
    n_chunks = -(-N // chunk_size)
    pad = n_chunks * chunk_size - N
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    ids_p = jnp.pad(ids, (0, pad), constant_values=-1)
    codes_c = codes_p.reshape(n_chunks, chunk_size, D)
    ids_c = ids_p.reshape(n_chunks, chunk_size)

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )

    def body(carry, blk):
        c_scores, c_ids = carry
        block, bids = blk
        block_sq = jnp.sum(block.astype(jnp.float32) * block.astype(jnp.float32), axis=1)
        scores = _block_scores(q, q_sq, block, block_sq, metric)
        scores = jnp.where((bids >= 0)[None, :], scores, NEG_INF)
        s, i = topk_from_scores(scores, jnp.broadcast_to(bids[None, :], scores.shape), k)
        return merge_topk(c_scores, c_ids, s, i, k), None

    (scores, out_ids), _ = lax.scan(body, init, (codes_c, ids_c))
    return scores, out_ids


def ivf_scan(q, pids, codes, ids, sizes, k: int, metric: str = "l2"):
    """Scan per-query probed partitions: the TPU analog of batched_serial_scan
    (query_coordinator.cpp:675-799) without host-side query grouping — the
    batch dimension is native.

    q: [B, D]; pids: [B, nprobe] int32 (-1 = skip); codes: [P, C, D];
    ids: [P, C] int32 (-1 = empty slot); sizes: [P] int32.
    Returns (scores [B,k], ids [B,k], partitions_scanned [B] int32).
    """
    B, D = q.shape
    nprobe = pids.shape[1]
    C = codes.shape[1]
    q = q.astype(codes.dtype)
    q_sq = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=1)

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )

    def body(carry, pid_r):
        c_scores, c_ids, n_scanned = carry
        valid = pid_r >= 0
        p = jnp.where(valid, pid_r, 0)
        slab = codes[p]  # [B, C, D]
        sids = ids[p]  # [B, C]
        prod = jax.lax.dot_general(
            slab,
            q,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [B, C]
        if metric == "l2":
            slab_f = slab.astype(jnp.float32)
            slab_sq = jnp.sum(slab_f * slab_f, axis=2)
            scores = 2.0 * prod - q_sq[:, None] - slab_sq
        else:
            scores = prod
        slot_ok = (sids >= 0) & valid[:, None]
        scores = jnp.where(slot_ok, scores, NEG_INF)
        s, i = topk_from_scores(scores, sids, k, approx=True)
        merged = merge_topk(c_scores, c_ids, s, i, k)
        return (merged[0], merged[1], n_scanned + valid.astype(jnp.int32)), None

    (scores, out_ids, n_scanned), _ = lax.scan(body, init, pids.T)
    return scores, out_ids, n_scanned


def scores_to_distances(scores, ids, metric: str):
    """Convert internal scores to reference-convention distances.

    L2: sqrt of squared distance, +inf fill for missing; IP: raw score, -inf
    fill (query_coordinator.cpp:447-456; list_scanning.h:260).
    """
    missing = ids < 0
    if metric == "l2":
        d = jnp.sqrt(jnp.maximum(-scores, 0.0))
        return jnp.where(missing, jnp.inf, d)
    return jnp.where(missing, -jnp.inf, scores)


def finalize_result(scores, ids, metric: str):
    """(scores, int32 ids) -> (int64-ish ids, distances) in reference layout."""
    return ids, scores_to_distances(scores, ids, metric)


@functools.partial(jax.jit, static_argnames=("k",))
def dedup_topk(scores, ids, k: int):
    """Keep each id's best entry, then top-k (SOAR spilled stores: the same
    vector can reach a merged result list through both of its partitions).
    scores/ids [B, pool] -> [B, k]."""
    B, pool = scores.shape
    earlier = (
        lax.broadcasted_iota(jnp.int32, (pool, pool), 1)
        < lax.broadcasted_iota(jnp.int32, (pool, pool), 0)
    )
    same = ids[:, :, None] == ids[:, None, :]
    is_dup = jnp.any(same & earlier[None] & (ids >= 0)[:, :, None], axis=2)
    scores = jnp.where(is_dup, NEG_INF, scores)
    ids = jnp.where(is_dup, -1, ids)
    kfin = min(k, pool)
    scores, order = lax.top_k(scores, kfin)
    ids = jnp.take_along_axis(ids, order, axis=1)
    ids = jnp.where(scores == NEG_INF, -1, ids)
    if kfin < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - kfin)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - kfin)), constant_values=-1)
    return scores, ids
