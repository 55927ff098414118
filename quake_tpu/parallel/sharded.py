"""Partition-parallel search and build over a device mesh.

The TPU-native analog of the reference worker pool
(src/cpp/src/query_coordinator.cpp:243-469): a query batch is replicated to
all shards, each shard scans its resident slice of the probed partitions and
produces a local top-k, and a cross-device merge over ICI (all_gather +
top_k) replaces the shared-memory global_topk_buffer merge
(query_coordinator.cpp:172,234). No job queues, no polling: the merge is one
collective.

k-means build is data-parallel: rows sharded, per-iteration segment sums
psum'd across the mesh (SURVEY §7.1 "sharded k-means").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from quake_tpu.ops.scan import flat_scan, ivf_scan, topk_from_scores
from quake_tpu.parallel.mesh import SHARD_AXIS


def _merge_gathered(scores, ids32, k: int, axis: str, dedup: bool = False):
    """all_gather per-device top-k and reduce to global top-k (the ICI
    tournament replacing TopkBuffer::batch_add merging).

    dedup: SOAR spilled stores — a vector's two copies can surface from two
    different shards (and, under slot sharding, from one shard); keep each
    id's best entry over a 2k pool (see ops.scan.dedup_topk)."""
    all_s = lax.all_gather(scores, axis)  # [ndev, B, k]
    all_i = lax.all_gather(ids32, axis)
    ndev, B, kk = all_s.shape
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(B, ndev * kk)
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, ndev * kk)
    if dedup:
        from quake_tpu.ops.scan import dedup_topk

        pool = min(2 * k, ndev * kk)
        ps, pi = topk_from_scores(all_s, all_i, pool)
        return dedup_topk(ps, pi, k)
    return topk_from_scores(all_s, all_i, k)


def _detect_slot_sharded(arr) -> bool:
    spec = getattr(arr.sharding, "spec", None)
    return spec is not None and len(spec) > 1 and spec[1] == SHARD_AXIS


def sharded_ivf_search(mesh, codes, ids, q, pids, k: int, metric: str,
                       strategy: str | None = None, dedup: bool = False):
    """Fixed-nprobe search over sharded slabs.

    codes [P, C, D] / ids [P, C] sharded per the chosen strategy; q [B, D]
    and pids [B, nprobe] (global partition indices, -1 pad) replicated.
    Returns (scores [B, k], ids [B, k], scanned [B]) replicated.

    dedup (SOAR spill): the local scan runs at 2k (copies can crowd a
    k-wide local list) and both local and global merges keep distinct ids.
    """
    if strategy is None:
        strategy = "slot" if _detect_slot_sharded(codes) else "partition"
    k_loc = 2 * k if dedup else k

    def _local_finish(s, i):
        if dedup:
            from quake_tpu.ops.scan import dedup_topk

            s, i = dedup_topk(s, i, k)
        return _merge_gathered(s, i, k, SHARD_AXIS, dedup=dedup)

    if strategy == "slot":

        def local(codes_l, ids_l, q_l, pids_l):
            s, i, scanned = ivf_scan(q_l, pids_l, codes_l, ids_l, None,
                                     k_loc, metric)
            ms, mi = _local_finish(s, i)
            return ms, mi, scanned  # scanned identical on all shards

        in_specs = (P(None, SHARD_AXIS), P(None, SHARD_AXIS), P(), P())
    else:

        def local(codes_l, ids_l, q_l, pids_l):
            dev = lax.axis_index(SHARD_AXIS)
            p_local = codes_l.shape[0]
            offset = dev.astype(jnp.int32) * p_local
            local_idx = pids_l - offset
            owned = (pids_l >= 0) & (local_idx >= 0) & (local_idx < p_local)
            local_pids = jnp.where(owned, local_idx, -1)
            s, i, scanned = ivf_scan(q_l, local_pids, codes_l, ids_l, None,
                                     k_loc, metric)
            ms, mi = _local_finish(s, i)
            return ms, mi, lax.psum(scanned, SHARD_AXIS)

        in_specs = (P(SHARD_AXIS), P(SHARD_AXIS), P(), P())

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(codes, ids, q, pids)


def sharded_flat_search(mesh, codes, ids, q, k: int, metric: str,
                        chunk_size: int = 16384):
    """Exact search with the store sharded over the mesh (even row-sharding
    of the flat buffer, SURVEY §2.4)."""

    def local(codes_l, ids_l, q_l):
        Pl, Cl, D = codes_l.shape
        s, i = flat_scan(q_l, codes_l.reshape(Pl * Cl, D), ids_l.reshape(Pl * Cl),
                         k, metric, chunk_size)
        return _merge_gathered(s, i, k, SHARD_AXIS)

    if _detect_slot_sharded(codes):
        in_specs = (P(None, SHARD_AXIS), P(None, SHARD_AXIS), P())
    else:
        in_specs = (P(SHARD_AXIS), P(SHARD_AXIS), P())

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(codes, ids, q)


def _local_grouped_chunk(codes_l, ids_l, norms_l, q_l, k, metric, qt,
                         group_chunk, kernel, strategy, exact=True):
    """Local masked grouped scan + cross-device top-k merge — the per-chunk
    scan closure shared by the sharded APS paths. kernel: any
    coordinator.grouped_scan backend; the Pallas kernels need norms (pass
    the sharded StoreState.norms) and derive local slab validity in-shard
    (a sharded slice of the compact prefix is itself a prefix). APS chunk
    matrices are masked, so the dispatch keeps dense=False (v11 requests
    ride the v10 scatter epilogue)."""
    from quake_tpu.coordinator import grouped_scan

    sizes_l = jnp.sum((ids_l >= 0).astype(jnp.int32), axis=1)

    if strategy == "slot":

        def scan_chunk(eff, pair_budget=0):
            s, i, _ = grouped_scan(codes_l, ids_l, sizes_l, norms_l, q_l,
                                   eff, k, metric, qt, group_chunk, kernel,
                                   exact=exact, pair_budget=pair_budget)
            return _merge_gathered(s, i, k, SHARD_AXIS)

    else:

        def scan_chunk(eff, pair_budget=0):
            dev = lax.axis_index(SHARD_AXIS)
            p_local = codes_l.shape[0]
            local_idx = eff - dev.astype(jnp.int32) * p_local
            owned = (eff >= 0) & (local_idx >= 0) & (local_idx < p_local)
            leff = jnp.where(owned, local_idx, -1)
            s, i, _ = grouped_scan(codes_l, ids_l, sizes_l, norms_l, q_l,
                                   leff, k, metric, qt, group_chunk, kernel,
                                   exact=exact, pair_budget=pair_budget)
            return _merge_gathered(s, i, k, SHARD_AXIS)

    return scan_chunk


def sharded_aps_search(mesh, codes, ids, centroids, q, pids, recall_target,
                       recompute_threshold, k: int, metric: str,
                       dimension: int, chunk: int = 4,
                       use_precomputed: bool = True, table=None,
                       qt: int = 32, group_chunk: int = 64,
                       strategy: str | None = None, gamma=None,
                       norms=None, kernel: str = "xla", exact: bool = True):
    """Recall-target (APS) search over sharded slabs.

    The whole APS while-loop runs inside shard_map: each chunk's grouped
    scan is local to the device's slab slice, followed by an all_gather
    top-k merge, so the termination state (radius / recall profile / active
    mask) is replicated-identical on every device — the mesh analog of the
    reference worker path honoring recall_target
    (query_coordinator.cpp:243-469).

    codes [P, C, D] / ids [P, C] sharded (slot or partition strategy);
    centroids, q, pids replicated. Returns replicated
    (scores [B,k], ids [B,k], scanned [B]).
    """
    from quake_tpu.coordinator import aps_loop, aps_setup

    if strategy is None:
        strategy = "slot" if _detect_slot_sharded(codes) else "partition"
    if table is None and use_precomputed:
        from quake_tpu.geometry import beta_table

        table = beta_table(dimension, "l2")
    if table is None:
        table = jnp.zeros((2, 1), jnp.float32)  # dummy; unused when not precomputed

    has_norms = norms is not None

    def local(codes_l, ids_l, *rest):
        if has_norms:
            norms_l, cents, q_l, pids_l, table_l = rest
        else:
            norms_l = None
            cents, q_l, pids_l, table_l = rest
        boundary, valid, _ = aps_setup(
            q_l, cents, pids_l, dimension, use_precomputed=False, table=None
        )
        scan_chunk = _local_grouped_chunk(
            codes_l, ids_l, norms_l, q_l, k, metric, qt, group_chunk,
            kernel, strategy, exact=exact)

        return aps_loop(
            q_l, pids_l, boundary, valid, table_l, recall_target,
            recompute_threshold, k, metric, dimension, chunk,
            use_precomputed, scan_chunk, gamma=gamma,
        )

    if strategy == "slot":
        store_spec = P(None, SHARD_AXIS)
    else:
        store_spec = P(SHARD_AXIS)
    norm_spec = (store_spec,) if has_norms else ()
    norm_arg = (norms,) if has_norms else ()
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(store_spec, store_spec) + norm_spec + (P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(codes, ids, *norm_arg, centroids, q, pids, table)


def sharded_aps_search_planned(mesh, codes, ids, centroids, q, pids,
                               recall_target, k: int, metric: str,
                               dimension: int, chunk0: int = 4,
                               use_precomputed: bool = True, table=None,
                               qt: int = 32, group_chunk: int = 64,
                               strategy: str | None = None, gamma=None,
                               plan_margin: int = 0,
                               norms=None, kernel: str = "xla",
                               exact: bool = True,
                               width_clip: int = 0, budget_w: int = 0):
    """Planned (two-phase) APS over the mesh: prologue scan -> replicated
    per-query probe plan -> one masked tail scan (see
    coordinator.aps_search_planned). Both scans are local + all_gather
    merges, and the plan is computed from replicated-identical merged
    state, so every device executes the same tail mask."""
    from quake_tpu.coordinator import aps_plan, aps_setup

    if strategy is None:
        strategy = "slot" if _detect_slot_sharded(codes) else "partition"
    if table is None and use_precomputed:
        from quake_tpu.geometry import beta_table

        table = beta_table(dimension, "l2")
    if table is None:
        table = jnp.zeros((2, 1), jnp.float32)

    has_norms = norms is not None

    def local(codes_l, ids_l, *rest):
        if has_norms:
            norms_l, cents, q_l, pids_l, table_l = rest
        else:
            norms_l = None
            cents, q_l, pids_l, table_l = rest
        boundary, valid, _ = aps_setup(
            q_l, cents, pids_l, dimension, use_precomputed=False, table=None
        )
        scan_chunk = _local_grouped_chunk(
            codes_l, ids_l, norms_l, q_l, k, metric, qt, group_chunk,
            kernel, strategy, exact=exact)

        return aps_plan(
            q_l, pids_l, boundary, valid, table_l, recall_target, k, metric,
            dimension, chunk0, use_precomputed, scan_chunk, gamma=gamma,
            plan_margin=plan_margin, width_clip=width_clip,
            budget_w=budget_w,
        )

    if strategy == "slot":
        store_spec = P(None, SHARD_AXIS)
    else:
        store_spec = P(SHARD_AXIS)
    norm_spec = (store_spec,) if has_norms else ()
    norm_arg = (norms,) if has_norms else ()
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(store_spec, store_spec) + norm_spec + (P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(codes, ids, *norm_arg, centroids, q, pids, table)


def sharded_aps_search_oneshot(mesh, codes, ids, centroids, q, pids,
                               recall_target, k: int, metric: str,
                               dimension: int, radius_a, radius_b,
                               use_precomputed: bool = True, table=None,
                               qt: int = 32, group_chunk: int = 64,
                               strategy: str | None = None, gamma=None,
                               plan_margin: int = 4,
                               norms=None, kernel: str = "xla",
                               exact: bool = True,
                               width_clip: int = 0, budget_w: int = 0):
    """Oneshot APS over the mesh: predicted-radius probe plan -> ONE masked
    scan (see coordinator.aps_search_oneshot). The plan is computed from
    replicated inputs (centroids, pids, the calibrated radius model), so
    every device masks identically; the scan is local + all_gather merge."""
    from quake_tpu.coordinator import aps_oneshot, aps_setup

    if strategy is None:
        strategy = "slot" if _detect_slot_sharded(codes) else "partition"
    if table is None and use_precomputed:
        from quake_tpu.geometry import beta_table

        table = beta_table(dimension, "l2")
    if table is None:
        table = jnp.zeros((2, 1), jnp.float32)

    has_norms = norms is not None

    def local(codes_l, ids_l, *rest):
        if has_norms:
            norms_l, cents, q_l, pids_l, table_l = rest
        else:
            norms_l = None
            cents, q_l, pids_l, table_l = rest
        boundary, valid, _ = aps_setup(
            q_l, cents, pids_l, dimension, use_precomputed=False, table=None
        )
        scan_chunk = _local_grouped_chunk(
            codes_l, ids_l, norms_l, q_l, k, metric, qt, group_chunk,
            kernel, strategy, exact=exact)

        return aps_oneshot(
            q_l, pids_l, boundary, valid, table_l, recall_target, k, metric,
            dimension, use_precomputed, scan_chunk, cents, radius_a,
            radius_b, gamma=gamma, plan_margin=plan_margin,
            width_clip=width_clip, budget_w=budget_w,
        )

    if strategy == "slot":
        store_spec = P(None, SHARD_AXIS)
    else:
        store_spec = P(SHARD_AXIS)
    norm_spec = (store_spec,) if has_norms else ()
    norm_arg = (norms,) if has_norms else ()
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(store_spec, store_spec) + norm_spec + (P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(codes, ids, *norm_arg, centroids, q, pids, table)


def sharded_kmeans_step(mesh, x_sharded, centroids, metric: str = "l2"):
    """One data-parallel Lloyd iteration: x rows sharded, centroids
    replicated; segment sums psum over the mesh. Returns (new_centroids
    replicated, local assignments sharded)."""
    n_clusters = centroids.shape[0]

    def local(x_l, cents):
        if metric == "ip":
            cents = cents / jnp.maximum(
                jnp.linalg.norm(cents, axis=1, keepdims=True), 1e-12
            )
        cents_sq = jnp.sum(cents * cents, axis=1)
        x_sq = jnp.sum(x_l.astype(jnp.float32) ** 2, axis=1)
        prod = jax.lax.dot_general(
            x_l, cents,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = prod if metric == "ip" else 2.0 * prod - x_sq[:, None] - cents_sq[None, :]
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        sums = jax.ops.segment_sum(x_l.astype(jnp.float32), a, num_segments=n_clusters)
        counts = jax.ops.segment_sum(
            jnp.ones((x_l.shape[0],), jnp.float32), a, num_segments=n_clusters
        )
        sums = lax.psum(sums, SHARD_AXIS)
        counts = lax.psum(counts, SHARD_AXIS)
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        new_c = jnp.where((counts < 0.5)[:, None], cents, new_c)
        if metric == "ip":
            new_c = new_c / jnp.maximum(
                jnp.linalg.norm(new_c, axis=1, keepdims=True), 1e-12
            )
        return new_c, a

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(SHARD_AXIS), P()),
        out_specs=(P(), P(SHARD_AXIS)),
        check_vma=False,
    )
    return fn(x_sharded, centroids)


def sharded_fused_search(mesh, codes, ids, norms, parent_codes, parent_ids, q,
                         k: int, nprobe: int, metric: str,
                         qt: int = 64, group_chunk: int = 64,
                         dedup: bool = False, shard_parents: bool = True,
                         kernel: str = "xla", exact: bool = True):
    """End-to-end fixed-nprobe search over the mesh as one program:
    SHARDED parent centroid scan -> per-shard partition-major grouped scan
    of the local slab slice -> all_gather top-k merge -> distances.

    Works with slot sharding (codes [P, C, D] sharded on axis 1): every
    device scans its 1/ndev slice of each probed partition, so the grouped
    scan's bandwidth splits evenly across the mesh.

    shard_parents: split the centroid buffer row-wise across the mesh; each
    device ranks its 1/ndev of the centroids and one all_gather +
    [B, ndev*nprobe] top-k merge yields the EXACT global candidate ranking
    (the union of per-shard top-nprobe contains the global top-nprobe).
    Round-2 measured the replicated parent scan + prologue as the Amdahl
    share capping mesh scaling (per-device bytes 0.25x at ndev=8 vs the
    ideal 0.125x, experiments/shard_work_division.py); this removes the
    parent's share of it. Reference analog: jobs, not coordination, dominate
    its worker pool (query_coordinator.cpp:243-469).

    kernel/exact: the local scan backend (coordinator.grouped_scan names) —
    on a real slice pass the index's Pallas kernel ("v11g4"); local slab
    VALIDITY is derived in-shard (a slot-sharded slice of the compact
    prefix is itself a prefix, so sizes_l = count of non-negative local
    ids). Caveat: the Pallas fold kernels need the LOCAL capacity C/ndev
    to be a multiple of 128; the dispatch falls back to v3pn otherwise
    (store bucketing rounds C to 128, not 128*ndev).
    """
    from quake_tpu.coordinator import grouped_scan
    from quake_tpu.ops.scan import scores_to_distances

    ndev = mesh.devices.size
    Pp, Cp, D = parent_codes.shape
    N = Pp * Cp
    pc_flat = parent_codes.reshape(N, D)
    pi_flat = parent_ids.reshape(N)
    shard_parents = shard_parents and N % ndev == 0 and N // ndev >= nprobe

    def local(codes_l, ids_l, norms_l, pcodes_l, pids_l, q_l):
        if shard_parents:
            ls, lp = flat_scan(q_l, pcodes_l, pids_l, nprobe, metric,
                               approx=True)
            all_s = lax.all_gather(ls, SHARD_AXIS)  # [ndev, B, nprobe]
            all_p = lax.all_gather(lp, SHARD_AXIS)
            nd, B, np_ = all_s.shape
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(B, nd * np_)
            all_p = jnp.moveaxis(all_p, 0, 1).reshape(B, nd * np_)
            _, probe = topk_from_scores(all_s, all_p, nprobe)
        else:
            _, probe = flat_scan(q_l, pcodes_l, pids_l, nprobe, metric,
                                 approx=True)
        # Dense-scan invariant self-heal (see fused_ivf_search): replace any
        # -1 padded parent slot with the query's best parent.
        probe = jnp.where(probe >= 0, probe, probe[:, :1])
        sizes_l = jnp.sum((ids_l >= 0).astype(jnp.int32), axis=1)
        s, i, scanned = grouped_scan(
            codes_l, ids_l, sizes_l, norms_l, q_l, probe, k, metric,
            qt, group_chunk, kernel, dedup=dedup, exact=exact, dense=True,
        )
        ms, mi = _merge_gathered(s, i, k, SHARD_AXIS, dedup=dedup)
        return ms, mi, scores_to_distances(ms, mi, metric), scanned, probe

    parent_spec = P(SHARD_AXIS) if shard_parents else P()
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, SHARD_AXIS), P(None, SHARD_AXIS), P(None, SHARD_AXIS),
                  parent_spec, parent_spec, P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return fn(codes, ids, norms, pc_flat, pi_flat, q)
