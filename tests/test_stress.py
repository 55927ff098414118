"""Stress tests mirroring reference test/cpp/quake_index.cpp: repeated
build-search (:322), rapid add/remove (:400), high-dim (:448), mixed
search+add+remove+maintenance (:482)."""

import numpy as np
import pytest

from quake_tpu import IndexBuildParams, MaintenancePolicyParams, QuakeIndex, SearchParams
from quake_tpu.utils import compute_recall, knn


def test_repeated_build_search():
    rng = np.random.default_rng(0)
    for trial in range(3):
        x = rng.standard_normal((2000, 16)).astype(np.float32)
        ids = np.arange(2000, dtype=np.int64)
        idx = QuakeIndex()
        idx.build(x, ids, IndexBuildParams(nlist=8))
        res = idx.search(x[:20], SearchParams(k=1, nprobe=8))
        np.testing.assert_array_equal(res.ids[:, 0], ids[:20])


def test_rapid_add_remove_cycles():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5000, 16)).astype(np.float32)
    ids = np.arange(5000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x[:3000], ids[:3000], IndexBuildParams(nlist=16))
    extra_x, extra_ids = x[3000:], ids[3000:]
    for cycle in range(5):
        idx.add(extra_x, extra_ids)
        assert idx.ntotal() == 5000
        idx.remove(extra_ids)
        assert idx.ntotal() == 3000
    assert idx.validate()
    res = idx.search(x[:30], SearchParams(k=10, nprobe=16))
    gt, _ = knn(x[:30], x[:3000], 10)
    assert compute_recall(res.ids, gt, 10) >= 0.99


def test_high_dimensional():
    """960-d (GIST-like) build/search (quake_index.cpp:448)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3000, 960)).astype(np.float32)
    ids = np.arange(3000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=8))
    res = idx.search(x[:10], SearchParams(k=1, nprobe=8))
    np.testing.assert_array_equal(res.ids[:, 0], ids[:10])


def test_mixed_operations_with_maintenance():
    """Interleaved search/add/remove/maintenance (quake_index.cpp:482)."""
    rng = np.random.default_rng(3)
    n, d = 8000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x[:4000], ids[:4000], IndexBuildParams(nlist=16))
    idx.initialize_maintenance_policy(
        MaintenancePolicyParams(window_size=30, split_threshold_ns=0.0,
                                refinement_radius=4)
    )
    resident = set(range(4000))
    next_add = 4000
    for step in range(6):
        q = rng.standard_normal((20, d)).astype(np.float32)
        idx.search(q, SearchParams(k=5, nprobe=8))
        if next_add < n:
            batch = ids[next_add : next_add + 500]
            idx.add(x[next_add : next_add + 500], batch)
            resident |= set(batch.tolist())
            next_add += 500
        rm = sorted(resident)[: 200]
        idx.remove(np.array(rm, dtype=np.int64))
        resident -= set(rm)
        idx.maintenance()
        assert idx.ntotal() == len(resident)
    assert idx.validate()
    # Final correctness: full probe equals brute force over residents.
    rid = np.array(sorted(resident), dtype=np.int64)
    q = rng.standard_normal((20, d)).astype(np.float32)
    res = idx.search(q, SearchParams(k=10, nprobe=idx.nlist()))
    gt, _ = knn(q, x[rid], 10, ids=rid)
    assert compute_recall(res.ids, gt, 10) >= 0.99


def test_empty_and_tiny_indices():
    """Edge sizes (query_coordinator.cpp empty-partition handling)."""
    x = np.random.default_rng(4).standard_normal((3, 8)).astype(np.float32)
    ids = np.arange(3, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=0))
    res = idx.search(x, SearchParams(k=5))
    assert (res.ids[:, 0] == ids).all()
    assert (res.ids[:, 3:] == -1).all()
    # Remove everything; search still returns padded results.
    idx.remove(ids)
    assert idx.ntotal() == 0
    res = idx.search(x[:1], SearchParams(k=3))
    assert (res.ids == -1).all()
    assert np.isinf(res.distances).all()


def test_concurrent_searches():
    """Concurrent reads are safe (mirror of ConcurrentFindIdTest /
    concurrent-read coverage, test/cpp/index_partition.cpp:605,
    dynamic_inverted_list.cpp:481): searches from multiple threads return
    the same results as serial execution."""
    import threading

    rng = np.random.default_rng(5)
    x = rng.standard_normal((3000, 16)).astype(np.float32)
    ids = np.arange(3000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=8))
    q = rng.standard_normal((40, 16)).astype(np.float32)
    expected = idx.search(q, SearchParams(k=5, nprobe=8)).ids

    results = [None] * 8
    def worker(i):
        results[i] = idx.search(q, SearchParams(k=5, nprobe=8)).ids

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r in results:
        np.testing.assert_array_equal(r, expected)
