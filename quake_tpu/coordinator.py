"""Search execution: jitted device programs for flat, fixed-nprobe, and
adaptive (APS) scans.

TPU-native replacement for the reference QueryCoordinator
(src/cpp/src/query_coordinator.cpp). The three host scan modes (serial /
batched-serial / worker pool, :659-673) collapse into batched device programs:
the batch dimension is native, so query grouping and per-core job queues are
unnecessary. APS early termination — a host polling loop in the reference
(:383-430) — becomes a `lax.while_loop` over ranked partition chunks with a
per-query active mask; the device-side recall estimate (geometry.py) decides
continuation, preserving the reference's semantics: stop once the cumulative
probability of scanned partitions exceeds the recall target (:416-424).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from quake_tpu import geometry
from quake_tpu.ops.scan import NEG_INF, flat_scan, ivf_scan, merge_topk


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk_size", "approx"))
def flat_search(codes, ids, q, k: int, metric: str, chunk_size: int = 16384,
                approx: bool = False):
    """Scan every slot of the store (flat index / parent centroid index;
    query_coordinator.cpp:624-626). codes [P, C, D], ids [P, C].

    approx=True switches selection to the tiled reducer — for PARENT
    candidate ranking, where lax.top_k's full row sort would dominate the
    whole query (user-facing flat search stays exact)."""
    P, C, D = codes.shape
    return flat_scan(q, codes.reshape(P * C, D), ids.reshape(P * C), k, metric,
                     chunk_size, approx=approx)


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def ivf_search(codes, ids, q, pids, k: int, metric: str):
    """Fixed-nprobe scan of per-query probed partitions (batched_serial_scan
    analog, query_coordinator.cpp:675-799)."""
    sizes = None  # slot validity comes from ids >= 0
    return ivf_scan(q, pids, codes, ids, sizes, k, metric)


def aps_setup(q, centroids, pids, dimension: int, use_precomputed: bool, table):
    """Shared APS preamble: per-candidate Voronoi boundary distances and the
    beta lookup table. Returns (boundary [B, M], valid [B, M], table).

    APS geometry always works in L2 space. For IP, spherical k-means keeps
    centroids unit-norm (clustering.cpp:25-26), so max-IP Voronoi cells ==
    L2 Voronoi cells of the centroids and the k-th IP score s maps to an
    L2 radius r = sqrt(|q|^2 + 1 - 2 s) (MIPS->NN reduction on a ~unit-norm
    corpus). This replaces the reference's angle-to-midpoint IP heuristic
    (geometry.h:96-109), which is untested there and does not adhere.
    """
    valid = pids >= 0
    cents = centroids[jnp.where(valid, pids, 0)]  # [B, M, D]
    boundary = geometry.boundary_distances(q.astype(jnp.float32), cents, "l2")
    boundary = jnp.where(valid, boundary, jnp.inf).at[:, 0].set(boundary[:, 0])
    if use_precomputed and table is None:
        # The table fully determines the cap-volume model in precomputed
        # mode; passing it as DATA (not baking it in) lets callers sweep the
        # model dimension without recompiling (build-time calibration).
        table = geometry.beta_table(dimension, "l2")
    return boundary, valid, table


def aps_loop(
    q,
    pids,
    boundary,
    valid,
    table,
    recall_target,
    recompute_threshold,
    k: int,
    metric: str,
    dimension: int,
    chunk: int,
    use_precomputed: bool,
    scan_chunk,
    gamma=None,
):
    """The APS while-loop core, shared by the single-device and shard_map
    paths. `scan_chunk(eff)` scans a [B, chunk] pid matrix (-1 = skip) and
    returns merged per-query (scores [B,k], ids [B,k]) — on a mesh it wraps
    the local scan plus the cross-device top-k merge, so the termination
    state below stays replicated-identical on every device.

    Reference: the per-query termination loop at query_coordinator.cpp:383-430
    (worker path) / :537-579 (serial path), restructured as a device-side
    predicate over ranked partition chunks.
    """
    B = q.shape[0]
    M = pids.shape[1]
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    pids_p = jnp.pad(pids, ((0, 0), (0, pad)), constant_values=-1)
    q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)
    rank_idx = jnp.arange(M, dtype=jnp.int32)[None, :]

    init = (
        jnp.int32(0),
        jnp.full((B, k), NEG_INF, jnp.float32),  # top scores
        jnp.full((B, k), -1, jnp.int32),  # top ids
        jnp.full((B,), 1.0e6, jnp.float32),  # query radius (serial_scan :523)
        jnp.zeros((B, M), jnp.float32),  # recall profile
        jnp.ones((B,), jnp.bool_),  # active mask
        jnp.zeros((B,), jnp.int32),  # partitions actually scanned
    )

    def cond(state):
        i, _, _, _, _, active, _ = state
        return (i < n_chunks) & jnp.any(active)

    def body(state):
        i, scores, sids, radius, probs, active, scanned = state
        pid_chunk = lax.dynamic_slice(pids_p, (0, i * chunk), (B, chunk))
        eff = jnp.where(active[:, None], pid_chunk, -1)
        n_new = jnp.sum((eff >= 0).astype(jnp.int32), axis=1)
        s, si = scan_chunk(eff)
        scores, sids = merge_topk(scores, sids, s, si, k)

        kth = scores[:, k - 1]
        if metric == "l2":
            radius_new = jnp.sqrt(jnp.maximum(-kth, 0.0))
        else:
            radius_new = jnp.sqrt(jnp.maximum(q_sq + 1.0 - 2.0 * kth, 0.0))
        radius_new = jnp.where(jnp.isfinite(kth), radius_new, jnp.inf)
        rel = jnp.abs(radius_new - radius) / jnp.maximum(jnp.abs(radius_new), 1e-30)
        recompute = (rel > recompute_threshold) & active
        probs_new = geometry.recall_profile(
            boundary, radius_new, dimension, "l2", use_precomputed, table,
            valid, gamma=gamma,
        )
        probs = jnp.where(recompute[:, None], probs_new, probs)
        radius = jnp.where(recompute, radius_new, radius)

        # Reference semantics are EXCLUSIVE of the most recent partition
        # (serial_scan sums probs[i] for i < p, query_coordinator.cpp:573-576)
        # — slightly conservative, which also compensates the cap model's
        # optimism on non-uniform (manifold) data.
        ranks_scanned = jnp.minimum((i + 1) * chunk, M)
        cum = jnp.sum(jnp.where(rank_idx < ranks_scanned - 1, probs, 0.0), axis=1)
        active = active & (cum < recall_target)
        return (i + 1, scores, sids, radius, probs, active, scanned + n_new)

    _, scores, sids, _, _, _, scanned = lax.while_loop(cond, body, init)
    return scores, sids, scanned


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "dimension", "chunk", "use_precomputed", "qt", "kernel",
        "small_batch", "exact",
    ),
)
def aps_search(
    codes,
    ids,
    centroids,
    q,
    pids,
    recall_target,
    recompute_threshold,
    k: int,
    metric: str,
    dimension: int,
    chunk: int = 4,
    use_precomputed: bool = True,
    table=None,
    qt: int = 32,
    kernel: str = "xla",
    sizes=None,
    norms=None,
    gamma=None,
    small_batch=None,
    exact: bool = True,
):
    """Adaptive partition scan with recall-target early termination.

    pids: [B, M] candidate partitions in rank order (nearest centroid first,
    -1 = pad) — the initial_search_fraction set from the parent search
    (query_coordinator.cpp:636-641). Scans `chunk` ranked partitions per
    while-loop step; queries whose estimated cumulative recall passes the
    target go inactive (their remaining chunk scans are masked out).

    Each chunk scans PARTITION-MAJOR via the grouped kernel (the same
    machinery as the fixed-nprobe path): probed partitions stream once per
    chunk regardless of batch size, so recall-target mode scales to
    production batches — the reference treats APS as first-class in its
    batched path too (query_coordinator.cpp:675-799 with the termination
    loop at :383-430). The old query-major per-rank gather materialized
    [B, C, D] slabs (~3.2 GB per rank at B=4096) and OOM'd.

    Returns (scores [B,k], ids [B,k], partitions_scanned [B]).
    """
    boundary, valid, table = aps_setup(
        q, centroids, pids, dimension, use_precomputed, table
    )

    if small_batch is None:
        # MEASURED NEGATIVE (kernel_ab22, B=64 device time): the per-rank
        # slab-gather path — the "serial APS" analog built for this regime
        # (query_coordinator.cpp:471-611) — costs 9.0-9.4 ms/batch vs
        # 4.9-6.5 ms for the grouped machinery at the same recall: per-query
        # slab gathers re-read each probed partition per PROBING QUERY,
        # while the grouped path's prologue is small at B*chunk pairs.
        # Kept as an explicit opt-in knob only.
        small_batch = False
    if small_batch:
        def scan_chunk(eff):
            s, si, _ = ivf_scan(q, eff, codes, ids, sizes, k, metric)
            return s, si
    else:
        def scan_chunk(eff):
            s, si, _ = grouped_scan(
                codes, ids, sizes, norms, q, eff, k, metric, qt, 64, kernel,
                exact=exact,
            )
            return s, si

    return aps_loop(
        q, pids, boundary, valid, table, recall_target, recompute_threshold,
        k, metric, dimension, chunk, use_precomputed, scan_chunk, gamma=gamma,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "dimension", "chunk0", "use_precomputed", "qt",
        "kernel", "plan_margin", "exact", "width_clip", "budget_w",
    ),
)
def aps_search_planned(
    codes,
    ids,
    centroids,
    q,
    pids,
    recall_target,
    k: int,
    metric: str,
    dimension: int,
    chunk0: int = 4,
    use_precomputed: bool = True,
    table=None,
    qt: int = 32,
    kernel: str = "xla",
    sizes=None,
    norms=None,
    gamma=None,
    plan_margin: int = 0,
    exact: bool = True,
    width_clip: int = 0,
    budget_w: int = 0,
):
    """Two-phase ("planned") APS: prologue scan -> per-query probe plan ->
    ONE masked tail scan. Replaces the while_loop for production batches.

    The while-loop APS re-pays the full grouped machinery (build_groups
    prologue + kernel + merge/rescore epilogue + termination math) on every
    chunk step — measured 1.85x the equal-recall fixed-nprobe cost at
    B=4096 (round-3 STATUS #3). This path scans the top `chunk0` ranked
    partitions once, computes the recall profile from the resulting k-th
    distance, derives each query's needed rank count n_b directly (smallest
    n whose exclusive cumulative probability passes the target — the same
    conservative convention as the loop, query_coordinator.cpp:573-576),
    and scans ranks [chunk0, n_b) in a single masked grouped scan.

    Adherence semantics are preserved: the phase-1 radius is an upper bound
    on the final k-th distance (more scanning only improves it), and a
    larger radius shifts probability mass OUT of the ranked prefix, so the
    plan can only overscan relative to the loop, never underscan. The
    recompute_threshold knob does not apply (there is exactly one profile
    computation).

    Returns (scores [B,k], ids [B,k], partitions_scanned [B]).
    """
    boundary, valid, table = aps_setup(
        q, centroids, pids, dimension, use_precomputed, table
    )

    def scan(eff, pair_budget=0):
        s, si, _ = grouped_scan(
            codes, ids, sizes, norms, q, eff, k, metric, qt, 64, kernel,
            exact=exact, pair_budget=pair_budget,
        )
        return s, si

    return aps_plan(
        q, pids, boundary, valid, table, recall_target, k, metric, dimension,
        chunk0, use_precomputed, scan, gamma=gamma, plan_margin=plan_margin,
        width_clip=width_clip, budget_w=budget_w,
    )


def aps_plan(q, pids, boundary, valid, table, recall_target, k: int,
             metric: str, dimension: int, chunk0: int, use_precomputed: bool,
             scan_chunk, gamma=None, plan_round: int = 4,
             plan_margin: int = 0, width_clip: int = 0, budget_w: int = 0):
    """Planned-APS core, shared by the single-device and shard_map paths
    (see aps_search_planned). `scan_chunk(eff)` scans a [B, m] pid matrix
    (-1 = skip) and returns merged per-query (scores [B,k], ids [B,k]) — on
    a mesh it wraps the local scan plus the cross-device merge, so the plan
    below is computed from replicated-identical state on every device.

    plan_round: tail ranks are rounded UP to this granularity. The loop
    path stops only at chunk multiples, and the build-time calibration
    inherits that overshoot as an adherence cushion — a cushionless exact
    plan measured 0.869 achieved at target 0.9 (experiments/aps_planned_ab,
    loop same run: 0.906).

    plan_margin: extra ranks added to the tail of every query whose plan
    extends past the prologue. The model is most optimistic exactly on
    those marginal queries (their k-th radius is still shrinking), and the
    loop hands them a FULL extra chunk where the plan hands them the
    model-minimal count — the margin recovers that cushion at a fraction
    of the cost.

    width_clip / budget_w: same flat-pair-list budgeting as aps_oneshot.
    Without it the masked tail machinery is sized to B * (M - chunk0) even
    though the mean plan depth is ~M/5 — at the calibrated candidate width
    (aps_plan_width, e.g. 48 at nlist=256) the unbudgeted tail measured
    70-74 ms vs ~8 ms fixed-np12 at B=8192 (experiments/aps_width_check,
    r4). Plans are clipped to width_clip TAIL ranks (c0 + width_clip
    total) and the tail to a B * budget_w pair budget (proportional
    scale-down on overflow); the tail scan then runs the machinery sized
    to that budget. The clip pair is calibrated with the end-to-end
    adherence gate active (index._calibrate_radius_predictor); bounding
    the tail rather than the total keeps the gate-validated reach after
    the prologue ranks (a total-width clip measured 0.8964 @ target 0.9,
    aps_width_check2)."""
    B, M = pids.shape
    c0 = min(chunk0, M)

    eff0 = pids[:, :c0]
    s0, i0 = scan_chunk(eff0)

    kth = s0[:, k - 1]
    if metric == "l2":
        radius = jnp.sqrt(jnp.maximum(-kth, 0.0))
    else:
        q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)
        radius = jnp.sqrt(jnp.maximum(q_sq + 1.0 - 2.0 * kth, 0.0))
    radius = jnp.where(jnp.isfinite(kth), radius, jnp.inf)
    probs = geometry.recall_profile(
        boundary, radius, dimension, "l2", use_precomputed, table, valid,
        gamma=gamma,
    )

    # n_b = smallest n with sum_{i < n-1} probs_i >= target (exclusive
    # convention): cs[j] = sum_{i<=j} -> condition met at n = j + 2.
    cs = jnp.cumsum(probs, axis=1)
    hit = cs >= recall_target
    first = jnp.argmax(hit, axis=1)  # first j with cs[j] >= target
    n_b = jnp.where(jnp.any(hit, axis=1), first + 2, M)
    tail = jnp.clip(n_b - c0, 0, None)
    if plan_margin:
        tail = jnp.where(tail > 0, tail + plan_margin, 0)
    tail = -(-tail // plan_round) * plan_round  # ceil to plan_round
    n_b = jnp.clip(c0 + tail, c0, M)

    Wt = M
    pair_budget = 0
    if width_clip and budget_w:
        # width_clip bounds the TAIL width (the machinery the tail pass
        # actually scans), so plans reach c0 + width_clip total ranks —
        # clipping the TOTAL to width_clip shaved planned adherence to
        # 0.8964 @ target 0.9 (aps_width_check2): the prologue ranks ate
        # into the reach the oneshot gate had validated.
        Wt = min(c0 + width_clip, M)
        n_b = jnp.minimum(n_b, Wt)
        n_bud = B * max(budget_w, plan_round)
        tail = n_b - c0
        total = jnp.sum(tail)
        # Scale down via a float ratio, not an int product: int32 tail *
        # Python-int n_bud stays int32 under weak promotion, and B=16384
        # with a wide calibrated budget puts per-element products near
        # 2^31 (ADVICE r4: silent plan corruption at scale). ratio <= 1
        # whenever the branch applies, and tail <= M is exactly
        # representable in f32, so the floor is within 1 of the exact
        # integer quotient — inside the plan margin.
        ratio = n_bud / jnp.maximum(total.astype(jnp.float32), 1.0)
        scaled = jnp.floor(tail.astype(jnp.float32) * ratio).astype(
            jnp.int32)
        tail = jnp.where(total > n_bud, scaled, tail)
        n_b = c0 + tail
        pair_budget = int(n_bud)

    rank_idx = jnp.arange(Wt, dtype=jnp.int32)[None, :]
    tail_mask = (rank_idx >= c0) & (rank_idx < n_b[:, None])
    if Wt > c0:
        eff1 = jnp.where(tail_mask[:, c0:], pids[:, c0:Wt], -1)
        s1, i1 = scan_chunk(eff1, pair_budget)
        scores, sids = merge_topk(s0, i0, s1, i1, k)
        n1 = jnp.sum((eff1 >= 0).astype(jnp.int32), axis=1)
    else:
        scores, sids = s0, i0
        n1 = jnp.zeros((B,), jnp.int32)
    scanned = jnp.sum((eff0 >= 0).astype(jnp.int32), axis=1) + n1
    return scores, sids, scanned


@functools.partial(
    jax.jit,
    static_argnames=(
        "parent_k", "mcap", "k", "metric", "dimension", "use_precomputed",
        "qt", "kernel", "plan_margin", "exact", "width_clip", "budget_w",
        "parent_kernel",
    ),
)
def aps_search_oneshot_fused(
    codes,
    ids,
    centroids,
    parent_codes,
    parent_ids,
    parent_norms,
    q,
    recall_target,
    parent_k: int,
    mcap: int,
    k: int,
    metric: str,
    dimension: int,
    radius_a,
    radius_b,
    use_precomputed: bool = True,
    table=None,
    qt: int = 32,
    kernel: str = "xla",
    sizes=None,
    norms=None,
    gamma=None,
    plan_margin: int = 4,
    exact: bool = True,
    width_clip: int = 0,
    budget_w: int = 0,
    parent_kernel: str = "approx",
):
    """Oneshot APS with the parent ranking FUSED into the same program
    (round 5): the separate parent dispatch measured ~3.6 ms of the 17.8 ms
    oneshot step at B=8192/nlist=256 (aps_band_bisect_b8192 — serving 17.8
    vs the same pipeline with precomputed pids 14.2), and a whole extra
    dispatch round-trip in the latency regime. Single-level, non-spilled
    parents only; the recursive/sharded/spilled cases keep the two-dispatch
    path (index._search_device_full routes). Semantics identical to
    aps_search_oneshot on rank_parents(parent_k) candidates clipped to the
    calibrated mcap. Returns (scores, ids, scanned, pids) — pids feeds the
    maintenance hit window."""
    pids = rank_parents(parent_codes, parent_ids, parent_norms, q, parent_k,
                        metric, parent_kernel)
    if mcap and pids.shape[1] > mcap:
        pids = pids[:, :mcap]
    boundary, valid, table = aps_setup(
        q, centroids, pids, dimension, use_precomputed, table
    )

    def scan(eff, pair_budget=0):
        s, si, _ = grouped_scan(
            codes, ids, sizes, norms, q, eff, k, metric, qt, 64, kernel,
            exact=exact, pair_budget=pair_budget,
        )
        return s, si

    scores, sids, scanned = aps_oneshot(
        q, pids, boundary, valid, table, recall_target, k, metric, dimension,
        use_precomputed, scan, centroids, radius_a, radius_b, gamma=gamma,
        plan_margin=plan_margin, width_clip=width_clip, budget_w=budget_w,
    )
    return scores, sids, scanned, pids


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "dimension", "use_precomputed", "qt", "kernel",
        "plan_margin", "exact", "width_clip", "budget_w",
    ),
)
def aps_search_oneshot(
    codes,
    ids,
    centroids,
    q,
    pids,
    recall_target,
    k: int,
    metric: str,
    dimension: int,
    radius_a,
    radius_b,
    use_precomputed: bool = True,
    table=None,
    qt: int = 32,
    kernel: str = "xla",
    sizes=None,
    norms=None,
    gamma=None,
    plan_margin: int = 4,
    exact: bool = True,
    width_clip: int = 0,
    budget_w: int = 0,
):
    """One-pass APS: predicted radius -> per-query probe plan -> ONE scan.

    The planned path (aps_search_planned) still pays the grouped machinery
    twice (prologue + tail). This TPU extension drops the prologue entirely:
    the k-th-neighbor radius is PREDICTED from the query's nearest-centroid
    distance via a build-time-calibrated affine model
    (radius ~= radius_a + radius_b * d1, quake_tpu.index.calibrate_aps),
    the recall profile and plan are computed from that radius, and the whole
    candidate prefix [0, n_b) is scanned in a single masked grouped scan —
    cost approaches the equal-recall fixed-nprobe scan plus the profile
    math.

    Adherence now rests on the predictor: the calibration fits the model on
    sampled resident vectors against their exact k-th distances, shifts it
    to an upper residual quantile, and validates achieved recall end-to-end
    (bumping the shift until the target holds). An overpredicted radius
    only overscans; the margin/rounding cushion matches the planned path.
    The reference has no analog (its APS always iterates,
    query_coordinator.cpp:383-430); this is the repo's own operating point.

    Returns (scores [B,k], ids [B,k], partitions_scanned [B]).
    """
    boundary, valid, table = aps_setup(
        q, centroids, pids, dimension, use_precomputed, table
    )

    def scan(eff, pair_budget=0):
        s, si, _ = grouped_scan(
            codes, ids, sizes, norms, q, eff, k, metric, qt, 64, kernel,
            exact=exact, pair_budget=pair_budget,
        )
        return s, si

    return aps_oneshot(
        q, pids, boundary, valid, table, recall_target, k, metric, dimension,
        use_precomputed, scan, centroids, radius_a, radius_b, gamma=gamma,
        plan_margin=plan_margin, width_clip=width_clip, budget_w=budget_w,
    )


def aps_oneshot(q, pids, boundary, valid, table, recall_target, k: int,
                metric: str, dimension: int, use_precomputed: bool,
                scan_chunk, centroids, radius_a, radius_b, gamma=None,
                plan_round: int = 4, plan_margin: int = 4,
                width_clip: int = 0, budget_w: int = 0):
    """Oneshot-APS core, shared by the single-device and shard_map paths
    (see aps_search_oneshot). `scan_chunk(eff, pair_budget=0)` scans a
    [B, M] pid matrix (-1 = skip) and returns merged per-query
    (scores, ids) — on a mesh it wraps the local scan plus the cross-device
    merge; the plan is computed from replicated-identical inputs so every
    device masks identically.

    width_clip / budget_w (flat-pair-list mode, VERDICT r3 #4): when set,
    plans are clipped to width_clip ranks per query and to a TOTAL of
    B * budget_w pairs per batch (proportional scale-down of the
    above-floor tail on overflow), and the scan runs with the grouped
    machinery sized to that budget (grouped_scan_pallas_v10b) instead of
    B * M. Both are calibrated at build time with the end-to-end adherence
    gate active (index._calibrate_radius_predictor), so the clipping's
    recall cost is validated, not assumed."""
    B, M = pids.shape
    qf = q.astype(jnp.float32)
    c0 = centroids[jnp.maximum(pids[:, 0], 0)].astype(jnp.float32)  # [B, D]
    d1 = jnp.sqrt(jnp.maximum(jnp.sum((qf - c0) ** 2, axis=1), 0.0))
    radius = jnp.maximum(radius_a + radius_b * d1, 0.0)

    probs = geometry.recall_profile(
        boundary, radius, dimension, "l2", use_precomputed, table, valid,
        gamma=gamma,
    )
    # Same exclusive-cumsum plan convention as aps_plan: n_b = smallest n
    # with sum_{i < n-1} probs_i >= target. Unlike the planned path the
    # margin applies to EVERY query (there is no prologue whose result
    # could already satisfy the plan).
    cs = jnp.cumsum(probs, axis=1)
    hit = cs >= recall_target
    first = jnp.argmax(hit, axis=1)
    n_b = jnp.where(jnp.any(hit, axis=1), first + 2, M)
    n_b = n_b + plan_margin
    n_b = -(-n_b // plan_round) * plan_round
    minf = jnp.minimum(plan_round, M)
    n_b = jnp.clip(n_b, minf, M)

    W = M
    pair_budget = 0
    if width_clip and budget_w:
        W = min(width_clip, M)
        n_b = jnp.minimum(n_b, W)
        # Total-pair budget: scale the above-floor tail down so that
        # sum(n_b) <= B * budget_w is GUARANTEED (floor division), never
        # dropping a query below the plan floor. Overflow is rare by
        # construction (budget_w is calibrated above the mean plan width);
        # when it hits, the scale-down sheds the deepest plans' tail ranks
        # first in relative terms — the lowest-probability pairs.
        n_bud = B * max(budget_w, int(plan_round))
        total = jnp.sum(n_b)
        base = B * minf
        avail = jnp.maximum(n_bud - base, 0)
        denom = jnp.maximum(total - base, 1)
        scaled = minf + ((n_b - minf) * avail) // denom
        n_b = jnp.where(total > n_bud, scaled, n_b)
        pair_budget = int(n_bud)

    rank_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    eff = jnp.where(rank_idx < n_b[:, None], pids[:, :W], -1)
    scores, sids = scan_chunk(eff, pair_budget)
    scanned = jnp.sum((eff >= 0).astype(jnp.int32), axis=1)
    return scores, sids, scanned


def grouped_scan(codes, ids, sizes, norms, q, pids, k: int, metric: str,
                 qt: int, group_chunk: int, kernel: str,
                 dedup: bool = False, exact: bool = True,
                 dense: bool = False, pair_budget: int = 0):
    """Dispatch to a grouped-scan backend by name.

    kernel: "xla" (chunked lax.map — any platform), "v2" (whole-slab Pallas,
    id-tie-break selection), "v3" (slot selection + cached norms + size
    masking), "v3p" (float-packed selection + exact rescore), "v4" (size-
    aware chunked v3p + ghost-skip; optional "v4cCT[gGPB]" spelling pins
    the chunk/groups-per-step, e.g. "v4c512g8"), "v7"/"v8"/"v9" (column-
    folded / global-scale-quantized / joint-round kernels), "v10" (v9 +
    scatter epilogue), "v11" (v9 + sorted-placement epilogue; the
    production default on TPU).

    dense: promise that EVERY pid is valid (fixed-nprobe semantics). The
    v11 sorted placement requires it — with dense=False (APS masked
    tails), a v11 request silently rides the v10 scatter epilogue instead.

    pair_budget > 0 (masked v10/v11 requests only): run the budgeted
    flat-pair-list path (grouped_scan_pallas_v10b) — group tables, kernel
    grid, and scatter rows sized to the budget instead of B*M. The caller
    must guarantee valid pairs <= pair_budget (aps_oneshot plan clipping).
    All return (scores [B,k], ids [B,k], scanned [B]).
    """
    if kernel.startswith("v5") or kernel.startswith("v6"):
        from quake_tpu.ops.pallas_grouped import (
            grouped_scan_pallas_v5,
            grouped_scan_pallas_v6,
        )

        fn = (grouped_scan_pallas_v6 if kernel.startswith("v6")
              else grouped_scan_pallas_v5)
        C = codes.shape[1]
        ct, gpb = 0, 4
        if len(kernel) > 2:  # v6cCT or v6cCTgGPB
            spec = kernel[3:]
            if "g" in spec:
                cts, gs = spec.split("g")
                ct, gpb = int(cts), int(gs)
            else:
                ct = int(spec)
        if not ct or C % ct:
            # Largest preferred chunk that divides the store's bucketed C;
            # fall back to whole-slab (ct=C) when nothing divides.
            ct = next((c for c in (512, 384, 256, 128) if C % c == 0), C)
        return fn(codes, ids, sizes, norms, q, pids,
                  k, metric, qt=qt, ct=ct, gpb=gpb, dedup=dedup)
    if kernel.startswith("v4"):
        from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v4

        C = codes.shape[1]
        ct, gpb = 0, 8
        if len(kernel) > 2:  # v4cCT or v4cCTgGPB
            spec = kernel[3:]
            if "g" in spec:
                cts, gs = spec.split("g")
                ct, gpb = int(cts), int(gs)
            else:
                ct = int(spec)
        if not ct or C % ct:
            ct = next((c for c in (512, 384, 256, 128) if C % c == 0), C)
        return grouped_scan_pallas_v4(codes, ids, sizes, norms, q, pids,
                                      k, metric, qt=qt, ct=ct, gpb=gpb,
                                      dedup=dedup)
    if dedup and (kernel in ("v2", "v3", "v3p")):
        raise ValueError(
            f"kernel {kernel!r} does not support dedup (spilled stores); "
            "use the default v3pN, v4, v5/v6, v7, or xla backends"
        )
    if (kernel.startswith("v7") or kernel.startswith("v8")
            or kernel.startswith("v9") or kernel.startswith("v10")
            or kernel.startswith("v11")):
        from quake_tpu.ops.pallas_grouped import (
            grouped_scan_pallas_v7,
            grouped_scan_pallas_v8,
            grouped_scan_pallas_v9,
            grouped_scan_pallas_v10,
            grouped_scan_pallas_v11,
        )

        name = ("v11" if kernel.startswith("v11")
                else "v10" if kernel.startswith("v10") else kernel[:2])
        gpb, fold = 4, 128
        spec = kernel[len(name):]  # "", "g8", "g4f256", "f256"
        if "f" in spec:
            spec, fs = spec.split("f")
            fold = int(fs)
        if spec.startswith("g"):
            gpb = int(spec[1:])
        if (pair_budget > 0 and not dense and name in ("v10", "v11")
                and codes.shape[1] % fold == 0):
            from quake_tpu.ops.pallas_grouped import (budget_sort_key_fits,
                                                      grouped_scan_pallas_v10b)

            # v11b: sorted placement for the budgeted masked scan — the
            # masked-path analog of the v10 -> v11 dense win. Falls back
            # to the row scatter when the uint32 sort key can't fit.
            placement = ("sorted" if name == "v11" and budget_sort_key_fits(
                q.shape[0], pids.shape[1], pair_budget, codes.shape[0],
                qt, gpb) else "scatter")
            return grouped_scan_pallas_v10b(
                codes, ids, sizes, norms, q, pids, k, metric,
                pair_budget=pair_budget, qt=qt, gpb=gpb, fold=fold,
                dedup=dedup, exact=exact, placement=placement)
        if name == "v11" and not dense:
            # The sorted-placement epilogue requires every pair valid
            # (fixed-nprobe semantics); masked pid matrices (APS tails)
            # ride the scatter epilogue instead.
            name = "v10"
        B = q.shape[0]
        placement = "sorted"
        if name == "v11":
            from quake_tpu.ops.grouped import group_layout

            rows = -(-group_layout(B, pids.shape[1], codes.shape[0], qt)
                     // gpb) * gpb * qt
            # >= 32: an all-ones 32-bit valid key could collide with the
            # 0xFFFFFFFF invalid marker.
            if (max((rows - 1).bit_length(), 1)
                    + max((B - 1).bit_length(), 1)) >= 32:
                # The packed uint32 key overflows at 10M-scale shapes
                # (P~4096/qt=64 rows need 20 bits, B>=8192 needs 13+).
                # Default is v11 placement="argsort" (no bit budget; tgt
                # covers [0, n) exactly once under dense fixed-nprobe, so
                # argsort(tgt)[:n] IS the row->pair placement): the same-run
                # A/B on the 10M production shape (tenm_cliff, B=24576)
                # measured argsort 27.5/29.3 ms at np12/np13 vs the v10 row
                # scatter's 30.7/57.8 — v10 carries a 2x cost cliff past
                # n=B*nprobe ~300k and doubles again at B=32768 (65.7 vs
                # 33.5 ms). QUAKE_TPU_V11_OVERFLOW=v10 restores the scatter.
                if os.environ.get("QUAKE_TPU_V11_OVERFLOW", "argsort") == "v10":
                    name = "v10"
                else:
                    placement = "argsort"
            if os.environ.get("QUAKE_TPU_V11_PLACEMENT") == "argsort":
                # A/B knob: force argsort placement even where the packed
                # uint32 key fits (experiments/bsweep_160 placement arm).
                placement = "argsort"
        fn = {"v7": grouped_scan_pallas_v7,
              "v8": grouped_scan_pallas_v8,
              "v9": grouped_scan_pallas_v9,
              "v10": grouped_scan_pallas_v10,
              "v11": grouped_scan_pallas_v11}[name]
        C = codes.shape[1]
        if C % fold:
            # Fall back to the non-folded packed kernel on odd capacities.
            from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3pn

            return grouped_scan_pallas_v3pn(codes, ids, sizes, norms, q, pids,
                                            k, metric, qt=qt, gpb=gpb,
                                            dedup=dedup)
        if name == "v11":
            return fn(codes, ids, sizes, norms, q, pids,
                      k, metric, qt=qt, gpb=gpb, fold=fold, dedup=dedup,
                      exact=exact, placement=placement)
        if name == "v10":
            return fn(codes, ids, sizes, norms, q, pids,
                      k, metric, qt=qt, gpb=gpb, fold=fold, dedup=dedup,
                      exact=exact)
        return fn(codes, ids, sizes, norms, q, pids,
                  k, metric, qt=qt, gpb=gpb, fold=fold, dedup=dedup)
    if kernel.startswith("v3p") and len(kernel) > 3:  # v3p2 / v3p4 / ...
        from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3pn

        return grouped_scan_pallas_v3pn(codes, ids, sizes, norms, q, pids,
                                        k, metric, qt=qt, gpb=int(kernel[3:]),
                                        dedup=dedup)
    if kernel == "v3p":
        from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3p

        return grouped_scan_pallas_v3p(codes, ids, sizes, norms, q, pids,
                                       k, metric, qt=qt)
    if kernel == "v3":
        from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3

        return grouped_scan_pallas_v3(codes, ids, sizes, norms, q, pids,
                                      k, metric, qt=qt)
    if kernel == "v2":
        from quake_tpu.ops.pallas_grouped import grouped_scan_pallas

        return grouped_scan_pallas(codes, ids, q, pids, k, metric, qt=qt)
    from quake_tpu.ops.grouped import grouped_scan_xla

    return grouped_scan_xla(codes, ids, q, pids, k, metric, qt=qt,
                            group_chunk=group_chunk, norms=norms,
                            dedup=dedup)


def rank_parents(parent_codes, parent_ids, parent_norms, q, nprobe: int,
                 metric: str, parent_kernel: str = "approx"):
    """Ranked candidate partitions (the recursive parent search,
    query_coordinator.cpp:628-646). parent_kernel: "approx" = XLA matmul +
    approx_max_k; "pallas" = fused matmul + column-folded packed selection
    (ops/pallas_flat.py — ~4x less selection time on v5e, quantized rank
    order). Falls back to approx when the pallas preconditions fail."""
    Pp, Cp, D = parent_codes.shape
    N = Pp * Cp
    if (
        parent_kernel == "pallas"
        and parent_norms is not None
        and N % 128 == 0
        and N <= 16384
    ):
        from quake_tpu.ops.pallas_flat import parent_rank_pallas

        return parent_rank_pallas(parent_codes, parent_ids, parent_norms, q,
                                  nprobe, metric)
    _, pids = flat_scan(
        q, parent_codes.reshape(N, D), parent_ids.reshape(N),
        nprobe, metric, approx=True,
    )
    return pids


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "metric", "qt", "group_chunk", "kernel", "dedup",
        "parent_kernel", "exact"),
)
def fused_ivf_search(
    codes, ids, sizes, norms, parent_codes, parent_ids, q,
    k: int, nprobe: int, metric: str, qt: int, group_chunk: int,
    kernel: str = "xla", dedup: bool = False,
    parent_norms=None, parent_kernel: str = "approx", exact: bool = True,
):
    """End-to-end fixed-nprobe search as ONE device program: parent centroid
    scan -> partition-major grouped scan -> top-k merge -> distance
    conversion. A single dispatch matters: per-dispatch overhead dominates
    multi-program pipelines on remote-attached TPUs, and fusing also lets XLA
    overlap the stages.

    Returns (scores, ids32, distances, scanned, pids).
    """
    from quake_tpu.ops.scan import scores_to_distances

    pids = rank_parents(parent_codes, parent_ids, parent_norms, q, nprobe,
                        metric, parent_kernel)
    # Self-heal the dense invariant: the approx parent path can surface a
    # padded slot as -1 (topk_from_scores squashes -inf winners) in edge
    # cases, and one -1 pid would drop its pair from build_groups_scatter —
    # silently shifting v11's sorted-placement windows for every query.
    # Substitute the query's best (always-valid) parent; duplicate pids are
    # already collapsed by the unique pair keys downstream.
    pids = jnp.where(pids >= 0, pids, pids[:, :1])
    scores, ids32, scanned = grouped_scan(
        codes, ids, sizes, norms, q, pids, k, metric, qt, group_chunk, kernel,
        dedup=dedup, exact=exact, dense=True,
    )
    dists = scores_to_distances(scores, ids32, metric)
    return scores, ids32, dists, scanned, pids


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk_size"))
def fused_flat_search(codes, ids, q, k: int, metric: str, chunk_size: int = 16384):
    """Flat search + distance conversion in one program."""
    from quake_tpu.ops.scan import scores_to_distances

    scores, ids32 = flat_search(codes, ids, q, k, metric, chunk_size)
    return scores, ids32, scores_to_distances(scores, ids32, metric)
