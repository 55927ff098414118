"""SOAR spilled assignment (IndexBuildParams.spill — beyond the reference):
two-residency invariants, dedup'd search quality, mutations, persistence."""

import tempfile

import numpy as np
import pytest

from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
from quake_tpu.utils import compute_recall, knn


@pytest.fixture(scope="module")
def spill_index():
    rng = np.random.default_rng(11)
    n, d = 6000, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32, metric="l2", spill=True))
    return idx, x, ids


def test_spill_two_residency_and_logical_ntotal(spill_index):
    idx, x, ids = spill_index
    n = len(ids)
    assert idx.ntotal() == n  # logical, not physical
    assert idx.validate()
    sizes = np.asarray(idx.store.state.sizes)
    assert sizes.sum() == 2 * n
    # Each id appears exactly twice, in two DIFFERENT partitions.
    sid = np.asarray(idx.store.state.ids)
    rows, _ = np.nonzero(sid >= 0)
    flat = sid[sid >= 0]
    by_id = {}
    for r, i in zip(rows, flat):
        by_id.setdefault(int(i), []).append(int(r))
    assert all(len(v) == 2 and v[0] != v[1] for v in by_id.values())


def test_spill_search_no_dups_and_better_recall_per_probe(spill_index):
    idx, x, ids = spill_index
    rng = np.random.default_rng(12)
    q = rng.standard_normal((64, x.shape[1])).astype(np.float32)
    gt, _ = knn(q, x, 10, "l2")

    res = idx.search(q, SearchParams(k=10, nprobe=6))
    rid = np.asarray(res.ids)
    for b in range(rid.shape[0]):
        valid = rid[b][rid[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
    r_spill = compute_recall(rid, gt, 10)

    # Single-assignment baseline at the same nprobe (same data/nlist).
    base = QuakeIndex()
    base.build(x, ids, IndexBuildParams(nlist=32, metric="l2"))
    r_base = compute_recall(
        np.asarray(base.search(q, SearchParams(k=10, nprobe=6)).ids), gt, 10)
    assert r_spill > r_base  # the point of spilling
    # Full probe stays exact.
    r_full = compute_recall(
        np.asarray(idx.search(q, SearchParams(k=10, nprobe=32)).ids), gt, 10)
    assert r_full >= 0.999


def test_spill_add_remove_both_copies():
    rng = np.random.default_rng(13)
    n, d = 4000, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=16, metric="l2", spill=True))
    x2 = rng.standard_normal((100, d)).astype(np.float32)
    idx.add(x2, np.arange(n, n + 100, dtype=np.int64))
    assert idx.ntotal() == n + 100
    assert np.asarray(idx.store.state.sizes).sum() == 2 * (n + 100)
    assert idx.validate()

    idx.remove(np.arange(50, dtype=np.int64))
    assert idx.ntotal() == n + 100 - 50
    sid = np.asarray(idx.store.state.ids)
    assert not np.isin(sid[sid >= 0], np.arange(50)).any()  # both copies gone
    assert idx.validate()

    # Removed ids are re-addable; duplicates still rejected.
    idx.add(x[:10], np.arange(10, dtype=np.int64))
    with pytest.raises(ValueError):
        idx.add(x[:1], np.array([100], dtype=np.int64))
    # get() returns the vector.
    np.testing.assert_allclose(idx.get(np.array([100]))[0], x[100], rtol=1e-6)


def test_spill_save_load_roundtrip(spill_index):
    idx, x, ids = spill_index
    rng = np.random.default_rng(14)
    q = rng.standard_normal((16, x.shape[1])).astype(np.float32)
    before = idx.search(q, SearchParams(k=10, nprobe=6))
    with tempfile.TemporaryDirectory() as d:
        idx.save(d)
        idx2 = QuakeIndex()
        idx2.load(d)
        assert idx2.spill and idx2.ntotal() == idx.ntotal()
        after = idx2.search(q, SearchParams(k=10, nprobe=6))
        np.testing.assert_array_equal(np.asarray(before.ids),
                                      np.asarray(after.ids))
        # remove through the reloaded maps kills both copies
        idx2.remove(np.asarray(before.ids)[0, :3])
        sid = np.asarray(idx2.store.state.ids)
        assert not np.isin(sid[sid >= 0], np.asarray(before.ids)[0, :3]).any()


def test_spill_aps_adherence_and_maintenance(spill_index):
    idx, x, ids = spill_index
    rng = np.random.default_rng(15)
    q = rng.standard_normal((32, x.shape[1])).astype(np.float32)
    gt, _ = knn(q, x, 10, "l2")
    res = idx.search(q, SearchParams(k=10, recall_target=0.8,
                                     initial_search_fraction=0.5))
    rid = np.asarray(res.ids)
    for b in range(rid.shape[0]):
        valid = rid[b][rid[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
    assert compute_recall(rid, gt, 10) >= 0.75
    info = idx.maintenance()  # runs; uniform traffic -> no deletes here
    assert info.n_deletes == 0


def _two_residency_ok(idx, n_expected):
    sid = np.asarray(idx.store.state.ids)
    rows, _ = np.nonzero(sid >= 0)
    flat = sid[sid >= 0]
    by_id = {}
    for r, i in zip(rows, flat):
        by_id.setdefault(int(i), []).append(int(r))
    assert len(by_id) == n_expected
    assert all(len(v) == 2 and v[0] != v[1] for v in by_id.values())
    # maps agree with the slabs
    ids_arr = np.fromiter(by_id.keys(), np.int64)
    prim = idx.store.id_map.get_batch(ids_arr)
    spl = idx.store.spill_map.get_batch(ids_arr)
    for i, p, s in zip(ids_arr, prim, spl):
        assert sorted((int(p), int(s))) == sorted(by_id[int(i)]), int(i)


def test_spill_maintenance_split_preserves_residency():
    """Skewed traffic triggers policy splits (partitions above the split
    break-even size, same recipe as test_maintenance): every vector must
    still have exactly two residencies, each tracked by the right map, and
    full-probe search must stay dup-free and exact."""
    from quake_tpu import MaintenancePolicyParams

    rng = np.random.default_rng(18)
    n, d = 30_000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=4, metric="l2", spill=True))
    idx.initialize_maintenance_policy(
        MaintenancePolicyParams(window_size=50, split_threshold_ns=0.0,
                                delete_threshold_ns=1e9))
    rows = idx.store.active_rows()[:2].tolist()
    for _ in range(60):
        idx.maintenance_policy.record_query_hits(rows)
    nlist0 = idx.nlist()
    info = idx.maintenance()
    assert info.n_splits > 0 and idx.nlist() > nlist0
    _two_residency_ok(idx, n)
    assert idx.validate()
    q = rng.standard_normal((16, d)).astype(np.float32)
    gt, _ = knn(q, x, 10, "l2")
    res = idx.search(q, SearchParams(k=10, nprobe=idx.nlist()))
    rid = np.asarray(res.ids)
    for b in range(rid.shape[0]):
        valid = rid[b][rid[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
    assert compute_recall(rid, gt, 10) >= 0.999


def test_spill_overflow_split_isolated():
    """Flooding one region with adds must trigger the capacity-isolation
    split, not a global C blowup, and keep the two-residency invariant."""
    rng = np.random.default_rng(19)
    n, d = 4000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=16, metric="l2", spill=True))
    C0, nlist0 = idx.store.C, idx.nlist()
    # A tight cluster near one existing point: all primaries land together.
    flood = x[0] + 0.01 * rng.standard_normal((1500, d)).astype(np.float32)
    idx.add(flood, np.arange(n, n + 1500, dtype=np.int64))
    assert idx.ntotal() == n + 1500
    assert idx.nlist() > nlist0  # the hot partition split
    _two_residency_ok(idx, n + 1500)
    assert idx.validate()


def test_spill_sharded_matches_single_device():
    """Sharded spilled search (local 2k dedup + dedup'd ICI merge) returns
    the same ids as single-device; APS on a sharded spilled index raises
    (documented limit)."""
    rng = np.random.default_rng(17)
    n, d = 4000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((24, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=16, metric="l2", spill=True))
    before = idx.search(q, SearchParams(k=10, nprobe=5))
    idx.shard(4)
    after = idx.search(q, SearchParams(k=10, nprobe=5))
    for b in range(q.shape[0]):
        assert (set(np.asarray(before.ids)[b].tolist())
                == set(np.asarray(after.ids)[b].tolist())), b
        valid = np.asarray(after.ids)[b][np.asarray(after.ids)[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
    # Recall-target on the sharded spilled index: the loop runs at 2k with
    # a dedup tail — results must be dup-free and adhere.
    gt, _ = knn(q, x, 10, "l2")
    res_aps = idx.search(q, SearchParams(k=10, recall_target=0.8,
                                         initial_search_fraction=0.5))
    rid = np.asarray(res_aps.ids)
    for b in range(rid.shape[0]):
        valid = rid[b][rid[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
    assert compute_recall(rid, gt, 10) >= 0.75


def test_spill_requires_ivf():
    rng = np.random.default_rng(16)
    x = rng.standard_normal((100, 8)).astype(np.float32)
    with pytest.raises(ValueError):
        QuakeIndex().build(x, np.arange(100, dtype=np.int64),
                           IndexBuildParams(nlist=0, spill=True))


def test_spill_maintenance_delete_rehomes_away_from_twin():
    """Cold-partition deletes on a spilled index: orphan copies re-home to a
    partition different from their twin's, keeping exactly two residencies."""
    from quake_tpu import MaintenancePolicyParams

    rng = np.random.default_rng(20)
    n, d = 12_000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=12, metric="l2", spill=True))
    idx.initialize_maintenance_policy(
        MaintenancePolicyParams(window_size=50, delete_threshold_ns=0.0,
                                split_threshold_ns=1e9,
                                enable_delete_rejection=False))
    hot = idx.store.active_rows()[:2].tolist()
    for _ in range(60):
        idx.maintenance_policy.record_query_hits(hot)  # others look cold
    nlist0 = idx.nlist()
    info = idx.maintenance()
    assert info.n_deletes > 0 and idx.nlist() < nlist0
    _two_residency_ok(idx, n)
    assert idx.ntotal() == n
    assert idx.validate()


def test_spill_refinement_separates_twins():
    """Local refinement pools neighboring partitions (which can contain both
    copies of an id); after refinement every id must still be in two
    DIFFERENT partitions with consistent maps, and full probe stays exact."""
    rng = np.random.default_rng(21)
    n, d = 9000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=12, metric="l2", spill=True))
    rows = idx.store.active_rows().tolist()
    idx.maintenance_policy.refine_partitions(rows, iterations=2)
    _two_residency_ok(idx, n)
    assert idx.validate()
    q = rng.standard_normal((16, d)).astype(np.float32)
    gt, _ = knn(q, x, 10, "l2")
    res = idx.search(q, SearchParams(k=10, nprobe=idx.nlist()))
    assert compute_recall(np.asarray(res.ids), gt, 10) >= 0.999
