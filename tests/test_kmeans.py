"""k-means tests (mirror reference clustering semantics, clustering.cpp:13-97)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quake_tpu.kmeans import kmeans_fit_assign, kmeans_np, lloyd_refine_np


def clustered_data(n_clusters=8, per=200, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 10
    x = np.concatenate(
        [c + rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    labels = np.repeat(np.arange(n_clusters), per)
    return x, labels, centers


def test_kmeans_recovers_separated_clusters():
    x, labels, _ = clustered_data()
    cents, assigns = kmeans_fit_assign(jnp.asarray(x), 8, niter=10)
    assigns = np.asarray(assigns)
    # Each true cluster maps to exactly one k-means cluster.
    for c in range(8):
        vals, counts = np.unique(assigns[labels == c], return_counts=True)
        assert counts.max() / counts.sum() > 0.95


def test_kmeans_all_points_assigned_in_range():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1000, 8)).astype(np.float32)
    cents, assigns = kmeans_fit_assign(jnp.asarray(x), 16)
    assigns = np.asarray(assigns)
    assert assigns.shape == (1000,)
    assert assigns.min() >= 0 and assigns.max() < 16
    assert np.asarray(cents).shape == (16, 8)
    assert np.isfinite(np.asarray(cents)).all()


def test_kmeans_ip_normalizes_centroids():
    """Spherical k-means for inner product (clustering.cpp:25-26)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    cents, _ = kmeans_fit_assign(jnp.asarray(x), 4, metric="ip")
    norms = np.linalg.norm(np.asarray(cents), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_kmeans_chunked_matches_unchunked():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2000, 8)).astype(np.float32)
    c1, a1 = kmeans_fit_assign(jnp.asarray(x), 8, chunk_size=256)
    c2, a2 = kmeans_fit_assign(jnp.asarray(x), 8, chunk_size=100_000)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_kmeans_np_two_way_split():
    x, labels, _ = clustered_data(n_clusters=2, per=100, d=8)
    ids = np.arange(200, dtype=np.int64)
    cents, clusters = kmeans_np(x, ids, 2, niter=10)
    sizes = sorted(len(c[1]) for c in clusters)
    assert sizes[0] >= 80  # balanced split of two true clusters
    assert sum(len(c[1]) for c in clusters) == 200
    all_ids = np.sort(np.concatenate([c[1] for c in clusters]))
    np.testing.assert_array_equal(all_ids, ids)


def test_lloyd_refine_preserves_vectors():
    rng = np.random.default_rng(4)
    vec_list = [rng.standard_normal((50, 8)).astype(np.float32) for _ in range(3)]
    id_list = [np.arange(i * 100, i * 100 + 50, dtype=np.int64) for i in range(3)]
    cents = np.stack([v.mean(0) for v in vec_list])
    new_cents, clusters = lloyd_refine_np(vec_list, id_list, cents, iterations=3)
    assert new_cents.shape == cents.shape
    total_ids = np.sort(np.concatenate([c[1] for c in clusters]))
    np.testing.assert_array_equal(total_ids, np.sort(np.concatenate(id_list)))
