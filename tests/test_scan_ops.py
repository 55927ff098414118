"""Kernel-level parity vs brute force (mirrors test/cpp/list_scanning.cpp,
topk_buffer.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quake_tpu.ops.scan import (
    NEG_INF,
    flat_scan,
    ivf_scan,
    merge_topk,
    scores_to_distances,
    topk_from_scores,
)
from quake_tpu.utils import knn


def brute(q, x, k, metric):
    return knn(q, x, k, metric)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_flat_scan_matches_bruteforce(metric):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 16), dtype=np.float32)
    q = rng.standard_normal((7, 16), dtype=np.float32)
    ids = np.arange(500, dtype=np.int32)
    scores, out_ids = flat_scan(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids), 10, metric)
    gt_ids, gt_d = brute(q, x, 10, metric)
    d = np.asarray(scores_to_distances(scores, out_ids, metric))
    np.testing.assert_allclose(np.sort(d, axis=1), np.sort(gt_d, axis=1), rtol=1e-2, atol=1e-2)
    # id sets should match except for distance ties
    for r in range(q.shape[0]):
        assert len(set(out_ids[r].tolist()) & set(gt_ids[r].tolist())) >= 9


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_flat_scan_chunked_equals_unchunked(metric):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3000, 8), dtype=np.float32)
    q = rng.standard_normal((5, 8), dtype=np.float32)
    ids = np.arange(3000, dtype=np.int32)
    s1, i1 = flat_scan(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids), 10, metric, chunk_size=512)
    s2, i2 = flat_scan(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids), 10, metric, chunk_size=100000)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)


def test_flat_scan_invalid_slots_masked():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 8), dtype=np.float32)
    ids = np.arange(100, dtype=np.int32)
    ids[50:] = -1  # invalidate second half
    q = x[:3]
    scores, out_ids = flat_scan(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids), 5, "l2")
    assert np.asarray(out_ids).max() < 50


def test_k_larger_than_n_pads_with_minus_one():
    """k > list size behavior (reference query_coordinator.cpp:447-456)."""
    x = np.eye(4, dtype=np.float32)
    ids = np.arange(4, dtype=np.int32)
    q = x[:1]
    scores, out_ids = flat_scan(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids), 4, "l2")
    d = np.asarray(scores_to_distances(scores, out_ids, "l2"))
    assert np.isfinite(d).all()
    # With padding slots:
    ids_p = np.concatenate([ids, np.full(4, -1, np.int32)])
    x_p = np.concatenate([x, np.zeros((4, 4), np.float32)])
    scores, out_ids = flat_scan(jnp.asarray(q), jnp.asarray(x_p), jnp.asarray(ids_p), 8, "l2")
    out_ids = np.asarray(out_ids)
    d = np.asarray(scores_to_distances(scores, out_ids, "l2"))
    assert (out_ids[0, 4:] == -1).all()
    assert np.isinf(d[0, 4:]).all()


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_ivf_scan_matches_bruteforce_full_probe(metric):
    """Scanning every partition must equal exact search."""
    rng = np.random.default_rng(3)
    P, C, D = 8, 64, 16
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.full(P, C, np.int32)
    q = rng.standard_normal((6, D)).astype(np.float32)
    pids = np.tile(np.arange(P, dtype=np.int32), (6, 1))
    scores, out_ids, scanned = ivf_scan(
        jnp.asarray(q), jnp.asarray(pids), jnp.asarray(codes), jnp.asarray(ids),
        jnp.asarray(sizes), 10, metric,
    )
    gt_ids, gt_d = brute(q, codes.reshape(-1, D), 10, metric)
    d = np.asarray(scores_to_distances(scores, out_ids, metric))
    np.testing.assert_allclose(np.sort(d, 1), np.sort(gt_d, 1), rtol=1e-2, atol=1e-2)
    assert (np.asarray(scanned) == P).all()


def test_ivf_scan_skips_invalid_pids():
    rng = np.random.default_rng(4)
    P, C, D = 4, 32, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    q = rng.standard_normal((2, D)).astype(np.float32)
    pids = np.array([[0, -1, -1, -1], [1, 2, -1, -1]], dtype=np.int32)
    scores, out_ids, scanned = ivf_scan(
        jnp.asarray(q), jnp.asarray(pids), jnp.asarray(codes), jnp.asarray(ids),
        None, 5, "l2",
    )
    out_ids = np.asarray(out_ids)
    assert set(out_ids[0]) <= set(ids[0].tolist())
    assert set(out_ids[1]) <= set(ids[1].tolist()) | set(ids[2].tolist())
    assert np.asarray(scanned).tolist() == [1, 2]


def test_merge_topk_ordering():
    """Mirror of topk_buffer ordering tests (test/cpp/topk_buffer.cpp)."""
    a_s = jnp.asarray([[3.0, 1.0]])
    a_i = jnp.asarray([[10, 11]], dtype=jnp.int32)
    b_s = jnp.asarray([[2.0, 0.5]])
    b_i = jnp.asarray([[20, 21]], dtype=jnp.int32)
    s, i = merge_topk(a_s, a_i, b_s, b_i, 3)
    assert np.asarray(s)[0].tolist() == [3.0, 2.0, 1.0]
    assert np.asarray(i)[0].tolist() == [10, 20, 11]


def test_topk_neg_inf_squashed_to_minus_one():
    s = jnp.asarray([[1.0, float("-inf")]])
    i = jnp.asarray([[5, 7]], dtype=jnp.int32)
    ts, ti = topk_from_scores(s, i, 2)
    assert np.asarray(ti)[0].tolist() == [5, -1]
