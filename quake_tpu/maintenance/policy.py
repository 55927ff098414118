"""Cost-based adaptive maintenance: split hot partitions, delete cold ones,
locally refine the neighborhood.

Port of the reference MaintenancePolicy flow
(src/cpp/src/maintenance_policies.cpp:33-202):
  gate on a full hit window -> aggregate per-partition hit rates ->
  delete_delta / split_delta vs ns thresholds (with delete-rejection via
  parent reassignment simulation, :77-119) -> execute deletes (with vector
  reassignment) then splits (2-way k-means each) -> local refinement of the
  split neighborhood (radius = k-NN of split centroids, :188-202).

Unlike the reference — where record_query_hits is never called from the search
path (SURVEY §2.1) — the QuakeIndex search path feeds the window
automatically via record_query_hits_device.
"""

from __future__ import annotations

import time

import numpy as np

from quake_tpu.kmeans import lloyd_refine_np
from quake_tpu.maintenance.cost_estimator import MaintenanceCostEstimator
from quake_tpu.maintenance.hit_tracker import HitCountTracker
from quake_tpu.params import MaintenancePolicyParams, SearchParams
from quake_tpu.timing import MaintenanceTimingInfo


def _now_us() -> int:
    return int(time.perf_counter() * 1e6)


class MaintenancePolicy:
    def __init__(self, index, params: MaintenancePolicyParams):
        self.index = index
        self.params = params
        # k=10 mirrors the reference's hardcoded estimator k
        # (maintenance_policies.cpp:24-27). A build-time/loaded profiled
        # latency grid (index.profile_latency) replaces the analytic model
        # when present — reference semantics: quake_index.cpp:81-82.
        self.cost_estimator = MaintenanceCostEstimator(
            index.d(), params.alpha, 10,
            latency_estimator=getattr(index, "latency_profile", None),
        )
        self.hit_count_tracker = HitCountTracker(
            params.window_size, max(index.ntotal(), 1)
        )

    # -- recording -------------------------------------------------------------

    def record_query_hits(self, partition_ids):
        """Host-side parity API (maintenance_policies.cpp:179-182)."""
        pids = np.asarray(partition_ids, dtype=np.int64)
        sizes = self.index.store.partition_sizes(pids)
        self.hit_count_tracker.add_query_data(pids, int(sizes.sum()))

    def record_query_hits_device(self, pids_dev, scanned_dev):
        self.hit_count_tracker.add_batch_device(pids_dev, scanned_dev)

    def reset(self):
        self.hit_count_tracker.reset()

    # -- the main loop -----------------------------------------------------------

    def perform_maintenance(self) -> MaintenanceTimingInfo:
        timing = MaintenanceTimingInfo()
        p = self.params
        tracker = self.hit_count_tracker
        if tracker.get_num_queries_recorded() < p.window_size:
            return timing

        t_total = _now_us()
        store = self.index.store
        sizes = store.partition_sizes()
        per_query_hits = tracker.get_per_query_hits(sizes)

        agg = np.zeros(store.P, dtype=np.int64)
        for hits in per_query_hits:
            valid = hits[(hits >= 0) & (hits < store.P)]
            np.add.at(agg, valid, 1)

        active_rows = store.active_rows()
        total_partitions = len(active_rows)
        if total_partitions <= 1:
            return timing
        ntotal = self.index.ntotal()
        avg_size = ntotal / total_partitions
        scan_fraction = tracker.get_current_scan_fraction()

        to_delete: list[int] = []
        to_split: list[int] = []
        for r in active_rows:
            r = int(r)
            hit_rate = agg[r] / p.window_size
            size = int(sizes[r])
            delete_delta = self.cost_estimator.compute_delete_delta(
                size, hit_rate, total_partitions, scan_fraction, avg_size
            )
            if delete_delta < -p.delete_threshold_ns:
                if p.enable_delete_rejection and size > p.min_partition_size:
                    delta = self._delete_delta_with_reassign(
                        r, size, hit_rate, total_partitions, agg
                    )
                    if delta < -p.delete_threshold_ns:
                        to_delete.append(r)
                else:
                    to_delete.append(r)
            elif size > p.min_partition_size:
                split_delta = self.cost_estimator.compute_split_delta(
                    size, hit_rate, total_partitions
                )
                if split_delta < -p.split_threshold_ns:
                    to_split.append(r)

        # Never delete everything.
        max_del = total_partitions - 1
        to_delete = to_delete[:max_del]

        t_del = _now_us()
        if to_delete:
            self._delete_partitions(to_delete, reassign=True)
            timing.n_deletes = len(to_delete)
        timing.delete_time_us = _now_us() - t_del

        t_split = _now_us()
        new_rows: list[int] = []
        if to_split:
            new_rows = self._split_partitions(to_split)
            timing.n_splits = len(to_split)
        timing.split_time_us = _now_us() - t_split

        t_refine = _now_us()
        if new_rows:
            self.local_refinement(new_rows)
        timing.split_refine_time_us = _now_us() - t_refine

        tracker.invalidate_rows(to_delete + to_split)
        timing.total_time_us = _now_us() - t_total
        return timing

    # -- helpers ------------------------------------------------------------------

    def _delete_delta_with_reassign(self, row, size, hit_rate, total_partitions, agg):
        """Delete-rejection: simulate reassignment via parent search k=2
        (maintenance_policies.cpp:77-119)."""
        import jax.numpy as jnp

        store = self.index.store
        vecs, _ = store.get_partition(row)
        if vecs.shape[0] == 0:
            return -np.inf  # empty partition: always delete
        sp = SearchParams(k=2, batched_scan=True)
        _, ids32, _ = self.index.parent._search_device(jnp.asarray(vecs), sp)
        reassign = np.asarray(ids32).ravel()
        reassign = reassign[(reassign >= 0) & (reassign != row)]
        if reassign.size == 0:
            return 0.0
        uniques, counts = np.unique(reassign, return_counts=True)
        sizes = store.partition_sizes(uniques)
        hit_rates = agg[uniques] / self.params.window_size
        return self.cost_estimator.compute_delete_delta_w_reassign(
            size, hit_rate, total_partitions,
            counts.tolist(), sizes.tolist(), hit_rates.tolist(),
        )

    def _delete_partitions(self, rows, reassign: bool = True):
        """partition_manager.cpp:524-554: remove centroids from parent, free
        the rows, optionally reassign orphaned vectors via add().

        Spilled stores: each orphan copy keeps its residency map and must be
        re-homed to a partition DIFFERENT from its twin's (the other copy
        stays where it is)."""
        store = self.index.store
        orphans = []
        spill_flags, twins = [], []
        for r in rows:
            vecs, vids = store.get_partition(int(r))
            if not vecs.shape[0]:
                continue
            orphans.append((vecs, vids))
            if self.index.spill:
                # Ownership + twin row per orphan, recorded BEFORE deletion.
                prim = store.id_map.get_batch(vids)
                spl = store.spill_map.get_batch(vids)
                was_spill = spl == int(r)
                spill_flags.append(was_spill)
                twins.append(np.where(was_spill, prim, spl).astype(np.int64))
        self.index.parent.remove(np.asarray(rows, dtype=np.int64))
        store.delete_partitions([int(r) for r in rows])
        if not (reassign and orphans):
            return
        vecs = np.concatenate([o[0] for o in orphans])
        vids = np.concatenate([o[1] for o in orphans])
        if not self.index.spill:
            self.index.add(vecs, vids)
            return
        # Re-home each orphan copy: best parent candidate that is not the
        # twin's partition (the twin's residency is untouched; ids stay
        # resident, so index.add()'s duplicate validation cannot be used).
        import jax.numpy as jnp

        flags = np.concatenate(spill_flags)
        twin = np.concatenate(twins)
        sp = SearchParams(k=2, batched_scan=True)
        _, cand32, _ = self.index.parent._search_device(jnp.asarray(vecs), sp)
        cand = np.asarray(cand32).astype(np.int64)
        # cand[:,1] can be -1 (parent has < 2 candidates); the fallback below
        # then re-homes a spill copy into its twin's partition. Acceptable:
        # search dedup tolerates same-partition twins, and the next
        # maintenance refinement separates them.
        new_rows = np.where(cand[:, 0] != twin, cand[:, 0], cand[:, 1])
        # Both of an id's partitions deleted: the copies reassign together
        # (identical vectors, identical candidates) — send the primary to
        # the 1st candidate and the spill to the 2nd so they stay apart.
        uniq, counts = np.unique(vids, return_counts=True)
        is_dup = np.isin(vids, uniq[counts > 1])
        new_rows = np.where(is_dup & ~flags, cand[:, 0], new_rows)
        new_rows = np.where(is_dup & flags, cand[:, 1], new_rows)
        new_rows = np.where(new_rows >= 0, new_rows, cand[:, 0]).astype(np.int32)
        if (~flags).any():
            store.append_primaries(new_rows[~flags], vecs[~flags], vids[~flags])
        if flags.any():
            store.append_spill_copies(new_rows[flags], vecs[flags], vids[flags])

    def _split_partitions(self, rows) -> list[int]:
        """2-way k-means per partition; delete originals, add the halves
        (partition_manager.cpp:393-445 + maintenance_policies.cpp:150-163)."""
        return self.index.split_partitions(rows)

    def local_refinement(self, rows):
        """Refine the k-NN neighborhood of the given (split) partitions
        (maintenance_policies.cpp:188-202)."""
        import jax.numpy as jnp

        p = self.params
        if p.refinement_radius == 0 or not rows:
            return
        store = self.index.store
        cents = np.asarray(store.state.centroids)[np.asarray(rows, dtype=np.int64)]
        k = min(p.refinement_radius, self.index.nlist())
        sp = SearchParams(k=k, batched_scan=True)
        _, ids32, _ = self.index.parent._search_device(jnp.asarray(cents), sp)
        refine_rows = np.unique(np.asarray(ids32).ravel())
        refine_rows = refine_rows[refine_rows >= 0]
        self.refine_partitions(refine_rows.tolist(), p.refinement_iterations)

    def refine_partitions(self, rows, iterations: int):
        """Local Lloyd passes constrained to the given partitions
        (partition_manager.cpp:447-488, clustering.cpp:99-182).

        Spilled stores: both of an id's copies can sit in the refine
        neighborhood; being identical vectors, Lloyd puts them in the same
        cluster — the spill copy is then bumped to its second-nearest
        refined centroid, and every moved copy keeps its residency map."""
        import os

        if not rows:
            return
        store = self.index.store
        spill = self.index.spill
        if not spill and os.environ.get("QUAKE_TPU_MAINT_HOST") != "1":
            # Round 5 (VERDICT r4 #5): ONE batched device Lloyd over the
            # gathered neighborhood slabs (kmeans.batched_refine) replaces
            # the per-row get_partition walk (a tunnel round-trip per
            # partition) + host lloyd_refine_np. The host only regroups
            # rows by the returned assignment and rewrites the partitions.
            import jax.numpy as jnp

            from quake_tpu.kmeans import batched_refine
            from quake_tpu.storage.store import _bucket

            state = store.state
            R = len(rows)
            Rb = _bucket(R, 1)
            rows_p = np.full(Rb, -1, np.int32)
            rows_p[:R] = [int(r) for r in rows]
            slabs, slab_ids, sizes, cents_dev, assign = batched_refine(
                state.codes, state.ids, state.sizes, state.centroids,
                jnp.asarray(rows_p), niter=max(iterations, 1),
                metric=self.index.metric)
            slabs = np.asarray(slabs)
            slab_ids = np.asarray(slab_ids).astype(np.int64)
            sizes = np.asarray(sizes)
            new_cents = np.asarray(cents_dev)[:R]
            assign = np.asarray(assign)
            # Flatten the pooled (vector, id, target-slot) triples, then
            # regroup per target slot with vectorized masks.
            fv, fi, fa = [], [], []
            for i in range(R):
                sz = int(sizes[i])
                fv.append(slabs[i, :sz])
                fi.append(slab_ids[i, :sz])
                fa.append(assign[i, :sz])
            fv = (np.concatenate(fv) if fv
                  else np.zeros((0, self.index.d()), np.float32))
            fi = np.concatenate(fi) if fi else np.zeros(0, np.int64)
            fa = np.concatenate(fa) if fa else np.zeros(0, np.int32)
            clusters = []
            for j in range(R):
                m = fa == j
                clusters.append((fv[m], fi[m]))
            store.write_partitions(list(rows), [c[0] for c in clusters],
                                   [c[1] for c in clusters], new_cents)
            self.index.parent.modify(np.asarray(rows, dtype=np.int64),
                                     new_cents)
            return
        vec_list, id_list = [], []
        for r in rows:
            v, i = store.get_partition(int(r))
            vec_list.append(v)
            id_list.append(i)
        cents = np.asarray(store.state.centroids)[np.asarray(rows, dtype=np.int64)]
        new_cents, clusters = lloyd_refine_np(
            vec_list, id_list, cents, self.index.metric, iterations
        )
        flags_list = None
        if spill:
            # Ownership per written copy. lloyd pools the neighborhood, so
            # per-copy provenance is lost for ids with BOTH copies pooled —
            # being identical, designating first-occurrence-primary is
            # exact. For single-copy ids, ownership = which map points into
            # the refine set.
            row_set = set(int(r) for r in rows)
            vecs_c = [c[0] for c in clusters]
            ids_c = [list(map(int, c[1])) for c in clusters]
            all_ids = [i for c in ids_c for i in c]
            uniq, counts = np.unique(np.asarray(all_ids, np.int64),
                                     return_counts=True)
            dup_ids = set(uniq[counts > 1].tolist())
            # Separate same-cluster twins: bump the 2nd occurrence to its
            # second-nearest refined centroid.
            for j, cid in enumerate(ids_c):
                seen = set()
                kept_i, moved = [], []
                for pos, vid in enumerate(cid):
                    if vid in seen:
                        moved.append(pos)
                    else:
                        seen.add(vid)
                        kept_i.append(pos)
                for pos in sorted(moved, reverse=True):
                    v = vecs_c[j][pos]
                    d2 = ((new_cents - v) ** 2).sum(axis=1)
                    d2[j] = np.inf
                    tgt = int(np.argmin(d2))
                    vecs_c[tgt] = np.concatenate([vecs_c[tgt], v[None]])
                    ids_c[tgt].append(cid[pos])
                    vecs_c[j] = np.delete(vecs_c[j], pos, axis=0)
                    del ids_c[j][pos]
            flags_list = []
            seen_primary = set()
            for cid in ids_c:
                arr = np.asarray(cid, np.int64)
                prim = store.id_map.get_batch(arr) if len(cid) else arr
                fl = np.empty(len(cid), bool)
                for pos, vid in enumerate(cid):
                    if vid in dup_ids:
                        fl[pos] = vid in seen_primary  # 1st primary, 2nd spill
                        seen_primary.add(vid)
                    else:
                        # primary residency outside the pool -> this is spill
                        fl[pos] = int(prim[pos]) not in row_set
                flags_list.append(fl)
            clusters = list(zip(vecs_c, [np.asarray(c, np.int64) for c in ids_c]))
        store.write_partitions(
            list(rows),
            [c[0] for c in clusters],
            [c[1] for c in clusters],
            new_cents,
            spill_flags_list=flags_list,
        )
        self.index.parent.modify(np.asarray(rows, dtype=np.int64), new_cents)
