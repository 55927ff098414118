"""Storage-layer tests (mirror test/cpp/index_partition.cpp,
dynamic_inverted_list.cpp: CRUD, growth, compaction invariants)."""

import numpy as np
import pytest

from quake_tpu.storage.store import PartitionStore


def make_store(n=256, d=8, nlist=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    cents = rng.standard_normal((nlist, d)).astype(np.float32)
    assigns = rng.integers(0, nlist, n).astype(np.int32)
    store = PartitionStore(d)
    store.init_from_assignments(x, ids, cents, assigns)
    return store, x, ids, assigns


def test_init_sizes_and_ids():
    store, x, ids, assigns = make_store()
    sizes = store.partition_sizes()
    np.testing.assert_array_equal(
        sizes[:4], np.bincount(assigns, minlength=4)
    )
    assert store.ntotal() == 256
    assert store.nlist() == 4


def test_compact_prefix_invariant():
    store, *_ = make_store()
    ids = np.asarray(store.state.ids)
    sizes = np.asarray(store.state.sizes)
    for r in range(store.P):
        sz = sizes[r]
        assert (ids[r, :sz] >= 0).all()
        assert (ids[r, sz:] == -1).all()


def test_append_and_get():
    store, x, ids, assigns = make_store()
    newv = np.random.default_rng(7).standard_normal((5, 8)).astype(np.float32)
    newids = np.arange(1000, 1005, dtype=np.int64)
    rows = np.array([0, 0, 1, 2, 3], dtype=np.int32)
    store.append(rows, newv, newids)
    assert store.ntotal() == 261
    vecs, found = store.get_vectors(newids)
    assert found.all()
    np.testing.assert_allclose(vecs, newv, rtol=1e-6)


def test_append_duplicate_rows_in_batch():
    store, *_ = make_store()
    n0 = int(store.partition_sizes()[0])
    newv = np.ones((10, 8), np.float32)
    newids = np.arange(2000, 2010, dtype=np.int64)
    rows = np.zeros(10, dtype=np.int32)
    store.append(rows, newv, newids)
    assert int(store.partition_sizes()[0]) == n0 + 10
    vecs, found = store.get_vectors(newids)
    assert found.all()


def test_remove_and_compaction():
    store, x, ids, assigns = make_store()
    to_remove = ids[::10]
    n = store.remove(to_remove)
    assert n == len(to_remove)
    assert store.ntotal() == 256 - len(to_remove)
    # Compact prefix invariant still holds.
    ids_dev = np.asarray(store.state.ids)
    sizes = np.asarray(store.state.sizes)
    for r in range(store.P):
        sz = sizes[r]
        assert (ids_dev[r, :sz] >= 0).all()
        assert (ids_dev[r, sz:] == -1).all()
    # Removed ids truly gone.
    _, found = store.get_vectors(to_remove)
    assert not found.any()
    # Survivors intact.
    keep = np.setdiff1d(ids, to_remove)
    vecs, found = store.get_vectors(keep)
    assert found.all()
    np.testing.assert_allclose(vecs, x[keep], rtol=1e-6)


def test_remove_nonexistent_is_noop():
    store, *_ = make_store()
    assert store.remove(np.array([999999], dtype=np.int64)) == 0
    assert store.ntotal() == 256


def test_capacity_growth():
    store, *_ = make_store(n=16, d=8, nlist=2)
    C0 = store.C
    n_new = C0 * 2
    newv = np.zeros((n_new, 8), np.float32)
    newids = np.arange(10_000, 10_000 + n_new, dtype=np.int64)
    store.append(np.zeros(n_new, np.int32), newv, newids)
    assert store.C > C0
    _, found = store.get_vectors(newids)
    assert found.all()


def test_partition_lifecycle():
    store, *_ = make_store()
    rows = store.allocate_rows(2)
    cents = np.ones((2, 8), np.float32)
    vecs = [np.full((3, 8), i, np.float32) for i in range(2)]
    vids = [np.arange(5000 + 10 * i, 5003 + 10 * i, dtype=np.int64) for i in range(2)]
    store.write_partitions(rows, vecs, vids, cents)
    assert store.nlist() == 6
    v, found = store.get_vectors(vids[1])
    assert found.all()
    np.testing.assert_allclose(v, vecs[1])
    store.delete_partitions([rows[0]])
    assert store.nlist() == 5
    _, found = store.get_vectors(vids[0])
    assert not found.any()
    _, found = store.get_vectors(vids[1])
    assert found.all()


def test_update_vectors():
    store, x, ids, _ = make_store()
    upd_ids = ids[:3]
    upd = np.full((3, 8), 42.0, np.float32)
    store.update_vectors(upd_ids, upd)
    v, found = store.get_vectors(upd_ids)
    assert found.all()
    np.testing.assert_allclose(v, upd)
    assert store.ntotal() == 256


def test_row_growth():
    store, *_ = make_store()
    P0 = store.P
    rows = store.allocate_rows(P0 + 1)
    assert store.P > P0
    assert len(set(rows)) == P0 + 1
