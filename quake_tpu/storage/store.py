"""Partition storage: padded fixed-capacity slabs in HBM.

TPU-native replacement for the reference's DynamicInvertedLists/IndexPartition
(src/cpp/include/dynamic_inverted_list.h, index_partition.h). Instead of
per-partition growable heap buffers with NUMA placement, all partitions live in
one padded device array `codes [P, C, D]` with a compact-prefix invariant:
slot j of partition p is valid iff j < sizes[p], and ids[p, j] == -1 marks
invalid slots. Growth doubles C (capacity class promotion, the analog of
IndexPartition capacity doubling at index_partition.cpp:247-255); partition
count growth doubles P under an `active` mask.

All mutation is functional: jitted device programs with buffer donation, so
updates are in-place in HBM. Host-side bookkeeping (free rows, generation
counters, resident-id set) lives in the PartitionStore wrapper.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quake_tpu.storage.idmap import make_id_map
from quake_tpu.utils import next_pow2, to_i64

MIN_CAPACITY = 256  # initial per-partition capacity floor (one scan tile)


@jax.tree_util.register_dataclass
@dataclass
class StoreState:
    codes: jax.Array  # [P, C, D]
    ids: jax.Array  # [P, C] int32, -1 = invalid slot
    sizes: jax.Array  # [P] int32
    centroids: jax.Array  # [P, D] float32
    active: jax.Array  # [P] bool
    # Cached squared L2 norms of the STORED codes (f32), [P, C]. Maintained by
    # every mutation kernel so scan kernels skip the per-slab ||x||^2 pass —
    # a full [C, D] VPU reduction per group otherwise (the reference gets the
    # same term inside fvec_L2sqr per vector, list_scanning.h:260; on TPU it
    # is pure re-computation of mutation-time-known data). ~0.4% extra HBM.
    norms: jax.Array  # [P, C] float32


def _sumsq(v, store_dtype):
    """Squared L2 norm of values as they will be stored (bf16 rounds first)."""
    vf = v.astype(store_dtype).astype(jnp.float32)
    return jnp.sum(vf * vf, axis=-1)


# ---------------------------------------------------------------------------
# Jitted functional kernels
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("P", "C"), donate_argnums=())
def _init_from_assignments(x, vids, centroids, assignments, P: int, C: int):
    """Scatter vectors into slabs by cluster (partition_manager.cpp:33-121)."""
    n, d = x.shape
    nlist = centroids.shape[0]
    order = jnp.argsort(assignments, stable=True)
    a_sorted = assignments[order]
    x_sorted = x[order]
    v_sorted = vids[order]
    counts = jnp.bincount(assignments, length=P)
    starts = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    slots = jnp.arange(n, dtype=jnp.int32) - starts[a_sorted].astype(jnp.int32)

    codes = jnp.zeros((P, C, d), x.dtype).at[a_sorted, slots].set(x_sorted)
    ids = jnp.full((P, C), -1, jnp.int32).at[a_sorted, slots].set(v_sorted.astype(jnp.int32))
    sizes = counts.astype(jnp.int32)
    cents = jnp.zeros((P, d), jnp.float32).at[:nlist].set(centroids.astype(jnp.float32))
    active = jnp.zeros((P,), jnp.bool_).at[:nlist].set(True)
    norms = jnp.zeros((P, C), jnp.float32).at[a_sorted, slots].set(
        _sumsq(x_sorted, x.dtype)
    )
    return StoreState(codes, ids, sizes, cents, active, norms)


@functools.partial(jax.jit, donate_argnums=(0,))
def _append(state: StoreState, rows, vecs, vids):
    """Append n vectors to their target rows. rows [n] int32, -1 = skip (pad)."""
    n = rows.shape[0]
    valid = rows >= 0
    safe_rows = jnp.where(valid, rows, 0)
    order = jnp.argsort(rows, stable=True)
    r_sorted = rows[order]
    # rank within equal-row group
    same = jnp.concatenate([jnp.zeros((1,), jnp.bool_), r_sorted[1:] == r_sorted[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    group_start = jnp.where(~same, idx, 0)
    group_start = lax.associative_scan(jnp.maximum, group_start)
    rank = idx - group_start
    slot_sorted = state.sizes[jnp.where(r_sorted >= 0, r_sorted, 0)] + rank
    # unsort
    slots = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    slots = jnp.where(valid, slots, 0)

    write_rows = jnp.where(valid, safe_rows, state.codes.shape[0])  # OOB -> dropped
    codes = state.codes.at[write_rows, slots].set(vecs.astype(state.codes.dtype), mode="drop")
    ids = state.ids.at[write_rows, slots].set(vids.astype(jnp.int32), mode="drop")
    sizes = state.sizes + jnp.bincount(safe_rows, weights=valid.astype(jnp.int32),
                                       length=state.sizes.shape[0]).astype(jnp.int32)
    norms = state.norms.at[write_rows, slots].set(
        _sumsq(vecs, state.codes.dtype), mode="drop"
    )
    return StoreState(codes, ids, sizes, state.centroids, state.active, norms)


@functools.partial(jax.jit, donate_argnums=(0,))
def _remove_compact(state: StoreState, rows, remove_ids_sorted):
    """Remove by id from the given rows and compact each row's prefix.

    Swap-with-last removal (index_partition.cpp:79-102) becomes a stable
    keep-first permutation per row — same O(1)-per-slot work, fully batched.
    rows: [m] int32 (-1 = pad); remove_ids_sorted: [r] int32 sorted (pad with
    int32 max).
    """
    m = rows.shape[0]
    C = state.ids.shape[1]
    valid_row = rows >= 0
    safe = jnp.where(valid_row, rows, 0)
    sub_ids = state.ids[safe]  # [m, C]
    pos = jnp.searchsorted(remove_ids_sorted, sub_ids)
    pos = jnp.clip(pos, 0, remove_ids_sorted.shape[0] - 1)
    hit = (remove_ids_sorted[pos] == sub_ids) & (sub_ids >= 0)
    keep = (sub_ids >= 0) & ~hit
    # stable partition: keep slots first
    perm = jnp.argsort(~keep, axis=1, stable=True)  # [m, C]
    new_ids = jnp.take_along_axis(jnp.where(keep, sub_ids, -1), perm, axis=1)
    sub_codes = state.codes[safe]
    new_codes = jnp.take_along_axis(sub_codes, perm[:, :, None], axis=1)
    new_norms = jnp.take_along_axis(state.norms[safe], perm, axis=1)
    new_sizes = keep.sum(axis=1).astype(jnp.int32)

    write_rows = jnp.where(valid_row, safe, state.ids.shape[0])
    codes = state.codes.at[write_rows].set(new_codes, mode="drop")
    ids = state.ids.at[write_rows].set(new_ids, mode="drop")
    sizes = state.sizes.at[write_rows].set(new_sizes, mode="drop")
    norms = state.norms.at[write_rows].set(new_norms, mode="drop")
    n_removed = jnp.sum(hit & valid_row[:, None]).astype(jnp.int32)
    return StoreState(codes, ids, sizes, state.centroids, state.active, norms), n_removed


@functools.partial(jax.jit, donate_argnums=())
def _get_vectors(state: StoreState, rows, vids):
    """Fetch vectors by (row, id). Returns (vecs [m, D], found [m] bool)."""
    valid = rows >= 0
    safe = jnp.where(valid, rows, 0)
    sub_ids = state.ids[safe]  # [m, C]
    match = sub_ids == vids[:, None].astype(jnp.int32)
    found = jnp.any(match, axis=1) & valid
    slot = jnp.argmax(match, axis=1)
    vecs = state.codes[safe, slot].astype(jnp.float32)
    return jnp.where(found[:, None], vecs, 0.0), found


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_partitions(state: StoreState, rows, vecs, vids, sizes, centroids):
    """Replace whole partitions (used by split/refine). vecs [m, C, D]."""
    valid = rows >= 0
    write_rows = jnp.where(valid, rows, state.ids.shape[0])
    codes = state.codes.at[write_rows].set(vecs.astype(state.codes.dtype), mode="drop")
    ids = state.ids.at[write_rows].set(vids.astype(jnp.int32), mode="drop")
    szs = state.sizes.at[write_rows].set(sizes.astype(jnp.int32), mode="drop")
    cents = state.centroids.at[write_rows].set(centroids.astype(jnp.float32), mode="drop")
    active = state.active.at[write_rows].set(True, mode="drop")
    norms = state.norms.at[write_rows].set(
        _sumsq(vecs, state.codes.dtype), mode="drop"
    )
    return StoreState(codes, ids, szs, cents, active, norms)


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_vectors(state: StoreState, rows, vids, vecs):
    """Overwrite existing vectors in place (quake_index.h modify)."""
    valid = rows >= 0
    safe = jnp.where(valid, rows, 0)
    sub_ids = state.ids[safe]  # [m, C]
    match = sub_ids == vids[:, None].astype(jnp.int32)
    found = jnp.any(match, axis=1) & valid
    slot = jnp.argmax(match, axis=1)
    write_rows = jnp.where(found, safe, state.ids.shape[0])
    codes = state.codes.at[write_rows, slot].set(vecs.astype(state.codes.dtype), mode="drop")
    norms = state.norms.at[write_rows, slot].set(
        _sumsq(vecs, state.codes.dtype), mode="drop"
    )
    return StoreState(codes, state.ids, state.sizes, state.centroids, state.active, norms)


@functools.partial(jax.jit, donate_argnums=(0,))
def _delete_partitions(state: StoreState, rows):
    valid = rows >= 0
    write_rows = jnp.where(valid, rows, state.ids.shape[0])
    ids = state.ids.at[write_rows].set(-1, mode="drop")
    sizes = state.sizes.at[write_rows].set(0, mode="drop")
    active = state.active.at[write_rows].set(False, mode="drop")
    return StoreState(state.codes, ids, sizes, state.centroids, active, state.norms)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_centroids(state: StoreState, rows, centroids):
    valid = rows >= 0
    write_rows = jnp.where(valid, rows, state.ids.shape[0])
    cents = state.centroids.at[write_rows].set(centroids.astype(jnp.float32), mode="drop")
    return StoreState(state.codes, state.ids, state.sizes, cents, state.active, state.norms)


@functools.partial(jax.jit, static_argnames=("new_C",), donate_argnums=(0,))
def _grow_capacity(state: StoreState, new_C: int):
    C = state.ids.shape[1]
    codes = jnp.pad(state.codes, ((0, 0), (0, new_C - C), (0, 0)))
    ids = jnp.pad(state.ids, ((0, 0), (0, new_C - C)), constant_values=-1)
    norms = jnp.pad(state.norms, ((0, 0), (0, new_C - C)))
    return StoreState(codes, ids, state.sizes, state.centroids, state.active, norms)


@functools.partial(jax.jit, static_argnames=("new_P",), donate_argnums=(0,))
def _grow_partitions(state: StoreState, new_P: int):
    P = state.ids.shape[0]
    codes = jnp.pad(state.codes, ((0, new_P - P), (0, 0), (0, 0)))
    ids = jnp.pad(state.ids, ((0, new_P - P), (0, 0)), constant_values=-1)
    sizes = jnp.pad(state.sizes, (0, new_P - P))
    cents = jnp.pad(state.centroids, ((0, new_P - P), (0, 0)))
    active = jnp.pad(state.active, (0, new_P - P))
    norms = jnp.pad(state.norms, ((0, new_P - P), (0, 0)))
    return StoreState(codes, ids, sizes, cents, active, norms)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _bucket(n: int, floor: int = 8) -> int:
    """Pad a dynamic batch length to a pow2 bucket to bound recompilation."""
    return next_pow2(max(n, 1), floor)


class PartitionStore:
    """Host orchestrator over StoreState.

    Replaces the reference PartitionManager's storage duties
    (src/cpp/src/partition_manager.cpp). Maintains:
      * free-row list + per-row generation counters (stable partition identity
        for the maintenance hit window without device-side id indirection),
      * a resident vector-id -> row map for O(1) add-validation/remove routing
        (the reference scans all partitions: dynamic_inverted_list.cpp:137-149;
        we do better, per SURVEY §7.1).
    """

    def __init__(self, dimension: int, dtype=jnp.float32):
        self.d = int(dimension)
        self.dtype = dtype
        self.state: StoreState | None = None
        self.free_rows: list[int] = []
        self.generation: np.ndarray | None = None  # [P] int64
        self.id_map = make_id_map()  # native C++ map, dict fallback
        self.spill_map = None  # second residency map when SOAR spill is on
        self.cap_multiple = 128  # capacity rounding granularity (see
        # init_from_assignments; 128 * num_shards for slot-sharded stores)

    @property
    def spill(self) -> bool:
        return self.spill_map is not None

    # -- properties ---------------------------------------------------------

    @property
    def P(self) -> int:
        return int(self.state.ids.shape[0])

    @property
    def C(self) -> int:
        return int(self.state.ids.shape[1])

    def nlist(self) -> int:
        return self.P - len(self.free_rows)

    def ntotal(self) -> int:
        return len(self.id_map)

    def active_rows(self) -> np.ndarray:
        free = set(self.free_rows)
        return np.array([r for r in range(self.P) if r not in free], dtype=np.int64)

    def partition_sizes(self, rows=None) -> np.ndarray:
        sizes = np.asarray(self.state.sizes)
        if rows is None:
            return sizes
        rows = np.asarray(rows)
        out = np.zeros(rows.shape, dtype=sizes.dtype)
        ok = rows >= 0
        out[ok] = sizes[rows[ok]]
        return out

    # -- construction --------------------------------------------------------

    def init_from_assignments(self, x, vids, centroids, assignments,
                              spill_assignments=None, cap_multiple: int = 128):
        """spill_assignments: optional [n] secondary partition per vector
        (SOAR spill) — every vector is stored twice; id_map tracks the
        primary copy, spill_map the secondary; ntotal stays logical.

        cap_multiple: capacity rounding granularity. Default 128 (one TPU
        tile row). Sharded builds pass 128 * num_shards so that every
        device's SLOT-SHARDED slab slice (C / num_shards columns) is
        itself a 128-multiple — the Pallas fold kernels require it, and
        otherwise a real slice falls back to the slower v3pn backend."""
        x = np.asarray(x)
        vids_np = to_i64(vids)
        assigns_np = np.asarray(assignments)
        if spill_assignments is not None:
            spill_np = np.asarray(spill_assignments)
            n_logical = len(vids_np)
            x = np.concatenate([x, x])
            vids_np = np.concatenate([vids_np, vids_np])
            assigns_np = np.concatenate([assigns_np, spill_np]).astype(
                assigns_np.dtype)
        nlist = int(np.asarray(centroids).shape[0])
        counts = np.bincount(assigns_np, minlength=nlist)
        # Round capacity to a 128-row tile multiple (not pow2): with
        # build-time balancing the max partition is ~balance_factor x the
        # mean, and C directly multiplies every scan's HBM traffic and VPU
        # lane count.
        max_count = int(counts.max(initial=1))
        cm = max(128, -(-int(cap_multiple) // 128) * 128)
        self.cap_multiple = cm
        C = -(-max(MIN_CAPACITY, max_count) // cm) * cm
        # Partition-axis padding: tight 128-granularity (P directly scales
        # the grouped scan's group count; pow2 doubling wastes up to 2x).
        # Growth happens on demand in ensure_rows, also at 128 granularity.
        P = max(8, -(-nlist // 128) * 128) if nlist > 1 else 1
        self.state = _init_from_assignments(
            jnp.asarray(x, self.dtype),
            jnp.asarray(vids_np),
            jnp.asarray(centroids, jnp.float32),
            jnp.asarray(assigns_np, jnp.int32),
            P=P,
            C=C,
        )
        self.free_rows = list(range(nlist, P))[::-1]
        self.generation = np.zeros(P, dtype=np.int64)
        if spill_assignments is not None:
            self.id_map = make_id_map(n_logical)
            self.id_map.set_batch(
                vids_np[:n_logical], assigns_np[:n_logical].astype(np.int32))
            self.spill_map = make_id_map(n_logical)
            self.spill_map.set_batch(
                vids_np[n_logical:], assigns_np[n_logical:].astype(np.int32))
        else:
            self.id_map = make_id_map(len(vids_np))
            self.id_map.set_batch(vids_np, assigns_np.astype(np.int32))
            self.spill_map = None

    def init_single_partition(self, x, vids):
        """Flat-index mode: one partition 0 holding everything
        (quake_index.cpp:68-79). Centroid = mean of data."""
        x = np.asarray(x)
        centroid = np.mean(x, axis=0, keepdims=True, dtype=np.float64).astype(np.float32)
        assignments = np.zeros(x.shape[0], dtype=np.int32)
        self.init_from_assignments(x, vids, centroid, assignments)

    # -- mutation -------------------------------------------------------------

    def ensure_capacity(self, incoming_counts: np.ndarray):
        """Grow C if any row would overflow. incoming_counts: [P]-aligned."""
        sizes = np.asarray(self.state.sizes)
        need = int((sizes[: len(incoming_counts)] + incoming_counts).max(initial=0))
        if need > self.C:
            _newC = next_pow2(need, self.C * 2)
            # Preserve the shard granularity: every device's slot-sharded
            # slice of the grown slab must stay a 128-multiple.
            cm = self.cap_multiple
            _newC = -(-_newC // cm) * cm
            self.state = _grow_capacity(self.state, new_C=_newC)

    def ensure_capacity_multiple(self, multiple: int):
        """Re-bucket C to a multiple of `multiple` (and make it the growth
        granularity). Called when an EXISTING store is sharded post-build:
        slot sharding slices the capacity axis across devices, and the
        Pallas fold kernels require each LOCAL slice (C / num_shards) to be
        a 128-multiple — otherwise the sharded scan silently falls back to
        the slower v3pn backend (docs/STATUS.md r3 gap #4)."""
        cm = max(128, -(-int(multiple) // 128) * 128)
        self.cap_multiple = max(self.cap_multiple, cm)
        newC = -(-self.C // cm) * cm
        if newC != self.C:
            self.state = _grow_capacity(self.state, new_C=newC)

    def ensure_rows(self, n_new_rows: int):
        if n_new_rows <= len(self.free_rows):
            return
        old_P = self.P
        needed = old_P + n_new_rows - len(self.free_rows)
        new_P = max(-(-needed // 128) * 128, old_P + 128)
        self.state = _grow_partitions(self.state, new_P=new_P)
        self.free_rows = list(range(old_P, new_P))[::-1] + self.free_rows
        self.generation = np.concatenate(
            [self.generation, np.zeros(new_P - old_P, dtype=np.int64)]
        )

    def append(self, rows: np.ndarray, vecs: np.ndarray, vids: np.ndarray,
               spill_rows: np.ndarray = None):
        """Append vectors to rows (already validated/assigned).

        spill_rows: secondary partition per vector (SOAR spill stores) — the
        vectors are appended twice; spill_map tracks the second copy."""
        if spill_rows is not None:
            self._append_one(np.asarray(spill_rows), vecs, vids,
                             self.spill_map)
        self._append_one(rows, vecs, vids, self.id_map)

    def append_spill_copies(self, rows: np.ndarray, vecs: np.ndarray,
                            vids: np.ndarray):
        """Append only the SPILL residency of each vector (the caller
        handles the primaries separately, e.g. through overflow splitting)."""
        self._append_one(np.asarray(rows), vecs, vids, self.spill_map)

    def append_primaries(self, rows: np.ndarray, vecs: np.ndarray,
                         vids: np.ndarray):
        """Append only the PRIMARY residency (rows may contain -1 for
        vectors already inserted via a split)."""
        self._append_one(np.asarray(rows), vecs, vids, self.id_map)

    def _append_one(self, rows: np.ndarray, vecs: np.ndarray,
                    vids: np.ndarray, id_map):
        n = len(rows)
        counts = np.bincount(rows[rows >= 0], minlength=self.P)
        self.ensure_capacity(counts)
        b = _bucket(n)
        rows_p = np.full(b, -1, np.int32)
        rows_p[:n] = rows
        vecs_p = np.zeros((b, self.d), np.float32)
        vecs_p[:n] = vecs
        vids_p = np.full(b, -1, np.int64)
        vids_p[:n] = vids
        self.state = _append(
            self.state, jnp.asarray(rows_p), jnp.asarray(vecs_p), jnp.asarray(vids_p)
        )
        ok = rows[:n] >= 0
        id_map.set_batch(np.asarray(vids[:n])[ok], rows[:n][ok].astype(np.int32))

    def remove(self, vids: np.ndarray) -> int:
        """Remove vector ids. Routes to only the affected rows via id_to_row.
        Spilled stores remove BOTH copies (the value-matched compaction
        covers every affected partition in one pass)."""
        vids = to_i64(vids)
        lookup = self.id_map.get_batch(vids)
        present_mask = lookup >= 0
        if self.spill_map is not None:
            # Presence is the UNION of both maps: an id resident only in
            # spill_map (e.g. a spill copy orphaned by partition deletion
            # before re-homing) must still be compacted and erased.
            lookup2 = self.spill_map.get_batch(vids)
            present_mask = present_mask | (lookup2 >= 0)
        present = vids[present_mask]
        if len(present) == 0:
            return 0
        rows = lookup[lookup >= 0]
        if self.spill_map is not None:
            rows = np.concatenate([rows, lookup2[lookup2 >= 0]])
        rows = np.unique(rows)
        mb = _bucket(len(rows))
        rows_p = np.full(mb, -1, np.int32)
        rows_p[: len(rows)] = rows
        rb = _bucket(len(present))
        rem = np.full(rb, np.iinfo(np.int32).max, np.int32)
        rem[: len(present)] = np.sort(present)
        self.state, n_removed = _remove_compact(
            self.state, jnp.asarray(rows_p), jnp.asarray(rem)
        )
        self.id_map.erase_batch(present)
        if self.spill_map is not None:
            self.spill_map.erase_batch(present)
        return len(present)

    def update_vectors(self, vids: np.ndarray, vecs: np.ndarray):
        """Overwrite resident vectors by id (used by parent.modify).
        Spilled stores update both copies."""
        vids = to_i64(vids)
        if self.spill_map is not None:
            self._update_one(vids, vecs, self.spill_map)
        self._update_one(vids, vecs, self.id_map)

    def _update_one(self, vids: np.ndarray, vecs: np.ndarray, id_map):
        m = len(vids)
        rows = id_map.get_batch(vids)
        b = _bucket(m)
        rows_p = np.full(b, -1, np.int32)
        rows_p[:m] = rows
        vids_p = np.full(b, -1, np.int64)
        vids_p[:m] = vids
        vecs_p = np.zeros((b, self.d), np.float32)
        vecs_p[:m] = vecs
        self.state = _update_vectors(
            self.state, jnp.asarray(rows_p), jnp.asarray(vids_p), jnp.asarray(vecs_p)
        )

    def get_vectors(self, vids: np.ndarray):
        """Fetch vectors by id (partition_manager.cpp:322-341).

        Returns (vecs [m, d] f32, found [m] bool)."""
        vids = to_i64(vids)
        m = len(vids)
        rows = self.id_map.get_batch(vids)
        b = _bucket(m)
        rows_p = np.full(b, -1, np.int32)
        rows_p[:m] = rows
        vids_p = np.full(b, -1, np.int64)
        vids_p[:m] = vids
        vecs, found = _get_vectors(self.state, jnp.asarray(rows_p), jnp.asarray(vids_p))
        return np.asarray(vecs)[:m], np.asarray(found)[:m]

    def allocate_rows(self, n: int) -> list[int]:
        self.ensure_rows(n)
        rows = [self.free_rows.pop() for _ in range(n)]
        for r in rows:
            self.generation[r] += 1
        return rows

    def write_partitions(self, rows, vecs_list, vids_list, centroids,
                         spill_flags_list=None):
        """Write whole partitions (split/refine). Lists of per-partition arrays.

        spill_flags_list (spilled stores): per-partition bool arrays aligned
        with vids_list — True where the written copy is the vector's SPILL
        residency (tracked by spill_map), False for the primary (id_map)."""
        m = len(rows)
        max_sz = max((len(v) for v in vids_list), default=1)
        if max_sz > self.C:
            self.state = _grow_capacity(self.state, new_C=next_pow2(max_sz, self.C * 2))
        mb = _bucket(m, 1)
        rows_p = np.full(mb, -1, np.int32)
        rows_p[:m] = rows
        vecs_p = np.zeros((mb, self.C, self.d), np.float32)
        vids_p = np.full((mb, self.C), -1, np.int64)
        sizes_p = np.zeros(mb, np.int32)
        cents_p = np.zeros((mb, self.d), np.float32)
        for i in range(m):
            sz = len(vids_list[i])
            vecs_p[i, :sz] = vecs_list[i]
            vids_p[i, :sz] = vids_list[i]
            sizes_p[i] = sz
            cents_p[i] = centroids[i]
        self.state = _write_partitions(
            self.state,
            jnp.asarray(rows_p),
            jnp.asarray(vecs_p),
            jnp.asarray(vids_p),
            jnp.asarray(sizes_p),
            jnp.asarray(cents_p),
        )
        all_keys = [np.asarray(v, np.int64) for v in vids_list if len(v)]
        all_rows = [
            np.full(len(vids_list[i]), rows[i], np.int32)
            for i in range(m)
            if len(vids_list[i])
        ]
        if all_keys:
            keys = np.concatenate(all_keys)
            vals = np.concatenate(all_rows)
            if spill_flags_list is not None:
                flags = np.concatenate(
                    [np.asarray(f, bool) for i, f in enumerate(spill_flags_list)
                     if len(vids_list[i])]
                )
                if (~flags).any():
                    self.id_map.set_batch(keys[~flags], vals[~flags])
                if flags.any():
                    self.spill_map.set_batch(keys[flags], vals[flags])
            else:
                self.id_map.set_batch(keys, vals)

    def delete_partitions(self, rows):
        """Deactivate rows; ids within them are dropped from the resident
        map. Spilled stores erase each id from whichever map tracks the copy
        that lived in the deleted row (the twin's residency stays valid)."""
        rows_arr = np.asarray(rows, dtype=np.int64)
        ids_np = np.asarray(self.state.ids[rows_arr])
        if self.spill_map is None:
            gone = ids_np[ids_np >= 0].astype(np.int64)
            if len(gone):
                self.id_map.erase_batch(gone)
        else:
            for ri, r in enumerate(rows_arr):
                gone = ids_np[ri][ids_np[ri] >= 0].astype(np.int64)
                if not len(gone):
                    continue
                prim = self.id_map.get_batch(gone)
                if (prim == r).any():
                    self.id_map.erase_batch(gone[prim == r])
                spl = self.spill_map.get_batch(gone)
                if (spl == r).any():
                    self.spill_map.erase_batch(gone[spl == r])
        mb = _bucket(len(rows), 1)
        rows_p = np.full(mb, -1, np.int32)
        rows_p[: len(rows)] = rows
        self.state = _delete_partitions(self.state, jnp.asarray(rows_p))
        for r in sorted(rows, reverse=True):
            self.generation[r] += 1
            self.free_rows.append(int(r))

    def set_centroids(self, rows, centroids):
        mb = _bucket(len(rows), 1)
        rows_p = np.full(mb, -1, np.int32)
        rows_p[: len(rows)] = rows
        cents_p = np.zeros((mb, self.d), np.float32)
        cents_p[: len(rows)] = centroids
        self.state = _set_centroids(self.state, jnp.asarray(rows_p), jnp.asarray(cents_p))

    def get_partition(self, row: int):
        """Host copy of one partition's (vectors, ids)."""
        sz = int(np.asarray(self.state.sizes)[row])
        codes = np.asarray(self.state.codes[row, :sz]).astype(np.float32)
        ids = np.asarray(self.state.ids[row, :sz]).astype(np.int64)
        return codes, ids

    def get_ids(self) -> np.ndarray:
        return self.id_map.items()[0]
