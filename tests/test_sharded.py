"""Shard-parity tests: sharded results == single-device results
(the analog of WorkerScanCorrectnessTest, test/cpp/query_coordinator.cpp:201)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
from quake_tpu.parallel.mesh import make_mesh, shard_store_state
from quake_tpu.parallel.sharded import (
    sharded_flat_search,
    sharded_ivf_search,
    sharded_kmeans_step,
)
from quake_tpu.utils import compute_recall, knn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) platform"
)


def test_sharded_ivf_matches_single_device(small_data):
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    res_single = idx.search(q, SearchParams(k=10, nprobe=8))

    idx.shard(len(jax.devices()))
    res_sharded = idx.search(q, SearchParams(k=10, nprobe=8))
    np.testing.assert_array_equal(res_single.ids, res_sharded.ids)
    np.testing.assert_allclose(
        res_single.distances, res_sharded.distances, rtol=1e-5, atol=1e-5
    )


def test_sharded_flat_matches_single_device(small_data):
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x[:4096], ids[:4096], IndexBuildParams(nlist=0))
    res_single = idx.search(q, SearchParams(k=10))
    idx.shard(len(jax.devices()))
    res_sharded = idx.search(q, SearchParams(k=10))
    np.testing.assert_array_equal(res_single.ids, res_sharded.ids)


def test_sharded_partition_strategy_matches(small_data):
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    state = idx.store.state
    qd = jnp.asarray(q)
    pids = np.tile(np.arange(32, dtype=np.int32), (len(q), 1))
    from quake_tpu.coordinator import ivf_search

    s0, i0, _ = ivf_search(state.codes, state.ids, qd, jnp.asarray(pids), 10, "l2")

    mesh = make_mesh()
    sharded = shard_store_state(state, mesh, strategy="partition")
    s1, i1, scanned = sharded_ivf_search(
        mesh, sharded.codes, sharded.ids, qd, jnp.asarray(pids), 10, "l2",
        strategy="partition",
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-5)
    assert (np.asarray(scanned) == 32).all()


def test_sharded_aps_matches_single_device(small_data):
    """Recall-target (APS) search on a mesh == single-device APS: the
    termination state is replicated-identical, so scanned counts and results
    match exactly (the worker path honors recall_target in the reference,
    query_coordinator.cpp:243-469)."""
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    sp = SearchParams(k=10, recall_target=0.9, initial_search_fraction=0.5)
    res_single = idx.search(q, sp)
    scanned_single = res_single.timing_info.partitions_scanned

    idx.shard(len(jax.devices()))
    res_sharded = idx.search(q, sp)
    np.testing.assert_array_equal(res_single.ids, res_sharded.ids)
    np.testing.assert_allclose(
        res_single.distances, res_sharded.distances, rtol=1e-5, atol=1e-5
    )
    assert res_sharded.timing_info.partitions_scanned == scanned_single


def test_sharded_aps_planned_matches_single_device(small_data):
    """Planned (two-phase) APS on a mesh == single-device planned APS: both
    scans merge to replicated-identical state before the plan is computed,
    so every device derives the same tail mask and results match exactly."""
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    sp = SearchParams(k=10, recall_target=0.9, initial_search_fraction=0.5,
                      aps_mode="planned")
    res_single = idx.search(q, sp)
    scanned_single = res_single.timing_info.partitions_scanned

    idx.shard(len(jax.devices()))
    res_sharded = idx.search(q, sp)
    np.testing.assert_array_equal(res_single.ids, res_sharded.ids)
    np.testing.assert_allclose(
        res_single.distances, res_sharded.distances, rtol=1e-5, atol=1e-5
    )
    assert res_sharded.timing_info.partitions_scanned == scanned_single


def test_sharded_aps_oneshot_matches_single_device():
    """Oneshot APS on a mesh == single-device oneshot: the plan is computed
    from replicated inputs (centroids + calibrated radius model), so every
    device derives the same mask and results match exactly. Clustered data:
    on isotropic corpora the 25% candidate set caps achievable recall below
    the calibration goal and the predictor (correctly) declines."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((32, 32)).astype(np.float32) * 6.0
    assign = rng.integers(0, 32, 10_000)
    x = centers[assign] + rng.standard_normal((10_000, 32)).astype(np.float32)
    q = centers[rng.integers(0, 32, 64)] + rng.standard_normal(
        (64, 32)).astype(np.float32)
    ids = np.arange(10_000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    if idx.aps_radius_ab is None:
        pytest.skip("radius predictor declined calibration on this corpus")
    sp = SearchParams(k=10, recall_target=0.9, initial_search_fraction=0.5,
                      aps_mode="oneshot")
    res_single = idx.search(q, sp)
    scanned_single = res_single.timing_info.partitions_scanned

    idx.shard(len(jax.devices()))
    res_sharded = idx.search(q, sp)
    np.testing.assert_array_equal(res_single.ids, res_sharded.ids)
    # Shards assemble different group packings, so matmul reduction order
    # (and the sqrt'd distances) differ by float noise.
    np.testing.assert_allclose(
        res_single.distances, res_sharded.distances, rtol=1e-4, atol=1e-4
    )
    assert res_sharded.timing_info.partitions_scanned == scanned_single


def test_sharded_aps_partition_strategy(small_data):
    """APS with partition-axis (block ownership) sharding returns correct
    top-k and meets the recall target."""
    from quake_tpu.parallel.sharded import sharded_aps_search

    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    state = idx.store.state
    qd = jnp.asarray(q)
    from quake_tpu.ops.scan import flat_scan

    _, pids = flat_scan(
        qd, state.centroids, jnp.arange(state.centroids.shape[0], dtype=jnp.int32),
        16, "l2",
    )
    mesh = make_mesh()
    sharded = shard_store_state(state, mesh, strategy="partition")
    s, i, scanned = sharded_aps_search(
        mesh, sharded.codes, sharded.ids, state.centroids, qd, pids,
        jnp.float32(0.9), jnp.float32(0.0), k=10, metric="l2",
        dimension=idx.aps_dimension or idx.d(), strategy="partition",
    )
    # Parity with the single-device APS on identical candidates.
    from quake_tpu.coordinator import aps_search

    s0, i0, scanned0 = aps_search(
        state.codes, state.ids, state.centroids, qd, pids,
        jnp.float32(0.9), jnp.float32(0.0), k=10, metric="l2",
        dimension=idx.aps_dimension or idx.d(),
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i))
    np.testing.assert_array_equal(np.asarray(scanned0), np.asarray(scanned))


def test_sharded_mutation_after_sharding(small_data):
    """Add/remove still work on a sharded store (sharding propagates
    through the functional update programs)."""
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x[:5000], ids[:5000], IndexBuildParams(nlist=16, num_shards=len(jax.devices())))
    idx.add(x[5000:6000], ids[5000:6000])
    idx.remove(ids[:500])
    assert idx.ntotal() == 5500
    res = idx.search(q, SearchParams(k=10, nprobe=16))
    keep = np.concatenate([ids[500:5000], ids[5000:6000]])
    gt_ids, _ = knn(q, x[keep], 10, "l2", ids=keep)
    assert compute_recall(res.ids, gt_ids, 10) >= 0.99


def test_sharded_kmeans_step_matches_replicated():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4096, 16)).astype(np.float32)
    cents = x[:8].copy()
    mesh = make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_sharded = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("shard")))
    c_rep = jax.device_put(jnp.asarray(cents), NamedSharding(mesh, P()))
    new_c, assigns = sharded_kmeans_step(mesh, x_sharded, c_rep)

    # Reference: single-device numpy Lloyd step.
    d2 = (x**2).sum(1)[:, None] - 2 * x @ cents.T + (cents**2).sum(1)[None, :]
    a = np.argmin(d2, axis=1)
    expected = np.stack([
        x[a == c].mean(0) if (a == c).any() else cents[c] for c in range(8)
    ])
    np.testing.assert_allclose(np.asarray(new_c), expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(assigns), a)


def test_sharded_maintenance_and_validate(small_data):
    """Maintenance (split/delete/refine) operates correctly on a sharded
    store: host policy code + donated functional updates with sharding
    propagation."""
    from quake_tpu import MaintenancePolicyParams

    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=16, num_shards=len(jax.devices())))
    idx.initialize_maintenance_policy(
        MaintenancePolicyParams(window_size=20, split_threshold_ns=0.0,
                                refinement_radius=4)
    )
    for _ in range(25):
        idx.maintenance_policy.record_query_hits([0, 1])
    ntotal = idx.ntotal()
    idx.maintenance()
    assert idx.ntotal() == ntotal
    assert idx.validate()
    res = idx.search(q, SearchParams(k=10, nprobe=idx.nlist()))
    gt_ids, _ = knn(q, x, 10, "l2")
    assert compute_recall(res.ids, gt_ids, 10) >= 0.99


def test_sharded_fused_parent_sharding_parity(small_data):
    """Parent-sharded fused search (round 3: the centroid scan splits across
    the mesh, one all_gather + [B, ndev*nprobe] merge restores the exact
    global candidate ranking) must return the same results as the replicated
    parent scan AND as the single-device search."""
    from quake_tpu.parallel.sharded import sharded_fused_search

    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=128))
    res_single = idx.search(q, SearchParams(k=10, nprobe=8))

    idx.shard(len(jax.devices()))
    state = idx.store.state
    pstate = idx.parent.store.state
    N = pstate.codes.shape[0] * pstate.codes.shape[1]
    assert N % len(jax.devices()) == 0 and N // len(jax.devices()) >= 8, N

    out = {}
    for sp in (True, False):
        s, i, d, scanned, probe = sharded_fused_search(
            idx.mesh, state.codes, state.ids, state.norms,
            pstate.codes, pstate.ids, jnp.asarray(q),
            k=10, nprobe=8, metric="l2", qt=8, group_chunk=16,
            shard_parents=sp,
        )
        out[sp] = (np.asarray(i), np.asarray(d), np.asarray(probe))
    np.testing.assert_array_equal(out[True][0], out[False][0])
    np.testing.assert_allclose(out[True][1], out[False][1], rtol=1e-5, atol=1e-5)
    # probe SETS match (order may differ at equal-score ties)
    for b in range(len(q)):
        assert set(out[True][2][b].tolist()) == set(out[False][2][b].tolist())
    np.testing.assert_array_equal(out[True][0], np.asarray(res_single.ids))


def test_sharded_aps_dequantized_matches_single_device(small_data):
    """exact_distances=False threads through the sharded APS variants:
    sharded results == single-device results for the same params (on the
    xla backend dequantization is a no-op; the wiring — shard_map closure
    capture + jit static args — is what this exercises)."""
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    params = [SearchParams(k=10, recall_target=0.9,
                           initial_search_fraction=0.5, aps_mode=mode,
                           exact_distances=False)
              for mode in ("loop", "planned")]
    singles = [idx.search(q, sp) for sp in params]
    idx.shard(len(jax.devices()))
    for sp, res_single in zip(params, singles):
        res_sharded = idx.search(q, sp)
        np.testing.assert_array_equal(res_single.ids, res_sharded.ids)


def test_shard_rebuckets_capacity_to_local_tile_multiple(small_data):
    """Post-build shard() re-buckets C to a multiple of 128*ndev so each
    device's slot-sharded slice is itself a 128-multiple (the Pallas fold
    kernels require it; otherwise a real TPU slice silently falls back to
    the v3pn backend — STATUS r3 gap #4). Results must be unchanged, and
    subsequent capacity growth must preserve the granularity."""
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    sp = SearchParams(k=10, nprobe=8)
    res_single = idx.search(q, sp)

    ndev = len(jax.devices())
    idx.shard(ndev)
    assert idx.store.C % (128 * ndev) == 0
    assert (idx.store.C // ndev) % 128 == 0
    res_sharded = idx.search(q, sp)
    np.testing.assert_array_equal(res_single.ids, res_sharded.ids)

    # Growth keeps the multiple.
    st = idx.store
    st.cap_multiple = 128 * ndev
    old_c = st.C
    import numpy as _np
    counts = _np.zeros(st.P, dtype=_np.int64)
    counts[0] = old_c + 1  # force a growth past the current capacity
    # ensure_capacity operates on the (sharded) state; growth itself is a
    # pad, valid on a replicated-or-sharded array in this test env.
    st.ensure_capacity(counts)
    assert st.C > old_c and st.C % (128 * ndev) == 0
