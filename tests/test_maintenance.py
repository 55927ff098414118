"""Maintenance subsystem tests (mirror test/cpp/maintenance.cpp,
maintenance_cost_estimator.cpp, latency_estimator.cpp, hit_count_tracker.cpp)."""

import numpy as np
import pytest

from quake_tpu import IndexBuildParams, MaintenancePolicyParams, QuakeIndex, SearchParams
from quake_tpu.maintenance.cost_estimator import MaintenanceCostEstimator
from quake_tpu.maintenance.hit_tracker import HitCountTracker
from quake_tpu.maintenance.latency_estimator import ListScanLatencyEstimator


# --------------------------- hit tracker ------------------------------------


def test_hit_tracker_window_cycling():
    t = HitCountTracker(window_size=5, total_vectors=100)
    for i in range(8):
        t.add_query_data(np.array([i % 3]), scanned_size=10)
    assert t.get_num_queries_recorded() == 5
    hits = t.get_per_query_hits()
    assert len(hits) == 5


def test_hit_tracker_scan_fraction():
    t = HitCountTracker(window_size=4, total_vectors=100)
    for _ in range(4):
        t.add_query_data(np.array([0]), scanned_size=25)
    assert abs(t.get_current_scan_fraction() - 0.25) < 1e-6


def test_hit_tracker_device_batches():
    import jax.numpy as jnp

    t = HitCountTracker(window_size=10, total_vectors=100)
    pids = jnp.asarray(np.tile(np.arange(4, dtype=np.int32), (6, 1)))
    scanned = jnp.asarray(np.full(6, 2, np.int32))
    t.add_batch_device(pids, scanned)
    assert t.get_num_queries_recorded() == 6
    hits = t.get_per_query_hits(np.full(4, 10))
    assert len(hits) == 6
    assert hits[0].tolist() == [0, 1]  # only first `scanned` ranks counted


def test_hit_tracker_device_overflow_keeps_circular_window():
    """Device batches totaling > window_size behave as a true circular
    window (hit_count_tracker.cpp:43-66): exactly the newest window_size
    entries survive, in order."""
    import jax.numpy as jnp

    t = HitCountTracker(window_size=10, total_vectors=100)
    # 5 batches of 4 queries each = 20 > window 10; batch b's queries hit
    # partition b so survivors are identifiable.
    for b in range(5):
        pids = jnp.full((4, 2), b, dtype=jnp.int32)
        scanned = jnp.ones(4, dtype=jnp.int32)
        t.add_batch_device(pids, scanned)
    assert t.get_num_queries_recorded() <= 12  # retained batches < window + batch
    hits = t.get_per_query_hits(np.full(8, 10))
    assert len(hits) == 10
    # Newest entries win: last 2 batches (8 queries) fully present plus 2
    # from batch 2.
    got = [int(h[0]) for h in hits]
    assert got == [2, 2, 3, 3, 3, 3, 4, 4, 4, 4]


def test_hit_tracker_interleaved_host_device_keeps_host_entries():
    """Interleaving host recording with device batches must not discard
    still-in-window host entries (round-1 advisor finding)."""
    import jax.numpy as jnp

    t = HitCountTracker(window_size=10, total_vectors=100)
    for _ in range(4):
        t.add_query_data(np.array([7]), scanned_size=10)
    for _ in range(3):  # 3 device batches of 3 = 9; total 13 > 10
        t.add_batch_device(jnp.zeros((3, 1), jnp.int32), jnp.ones(3, jnp.int32))
    hits = t.get_per_query_hits(np.full(8, 10))
    assert len(hits) == 10
    # 1 host entry (the newest of the 4) must survive ahead of the 9 device ones.
    assert [int(h[0]) for h in hits] == [7] + [0] * 9


# --------------------------- latency estimator -------------------------------


def test_profile_grouped_latency_and_roundtrip(tmp_path):
    """The production grouped kernel can be profiled over a small (n, k)
    grid (quake_index.cpp:81-82 -> maintenance_cost_estimator.cpp:59-94) and
    the CSV cache round-trips through index save/load."""
    est = ListScanLatencyEstimator(d=16, n_values=[64, 512], k_values=[1, 8],
                                   n_trials=2)
    est.profile_grouped_latency(kernel="xla", n_queries=64)
    grid = est.latency_grid
    assert (grid > 0).all()
    p = str(tmp_path / "prof.csv")
    est.save(p)
    est2 = ListScanLatencyEstimator.from_csv(p)
    np.testing.assert_allclose(est2.latency_grid, grid, rtol=1e-5)  # %.6g CSV
    assert est2.n_values == [64, 512] and est2.k_values == [1, 8]


def test_profiled_grid_changes_maintenance_decisions():
    """Split/delete deltas must follow the measured grid: a profile where
    large partitions are disproportionately expensive makes splits
    beneficial; a flat profile does not."""
    flat = ListScanLatencyEstimator(d=16)
    flat.latency_grid = np.full_like(flat.latency_grid, 1000.0)
    steep = ListScanLatencyEstimator(d=16)
    steep.latency_grid = np.array(
        [[n * 100.0 + k for k in steep.k_values] for n in steep.n_values]
    )
    est_flat = MaintenanceCostEstimator(16, alpha=0.9, k=10, latency_estimator=flat)
    est_steep = MaintenanceCostEstimator(16, alpha=0.9, k=10, latency_estimator=steep)
    d_flat = est_flat.compute_split_delta(4096, hit_rate=1.0, total_partitions=64)
    d_steep = est_steep.compute_split_delta(4096, hit_rate=1.0, total_partitions=64)
    # Flat grid: splitting only adds overhead (2*alpha > 1). Steep grid:
    # halving the partition saves ~(2*alpha - 1)*L(n)/... => negative delta.
    assert d_flat > 0 > d_steep


def test_build_flag_profiles_and_persists(tmp_path, small_data):
    """profile_latency() wires the grid into the live policy and save/load
    restores it."""
    x, ids, _ = small_data
    idx = QuakeIndex()
    idx.build(x[:3000], ids[:3000], IndexBuildParams(nlist=8))
    est = idx.profile_latency(n_values=[64, 256], k_values=[1, 8])
    assert idx.maintenance_policy.cost_estimator.latency_estimator is est
    d = str(tmp_path / "idx")
    idx.save(d)
    idx2 = QuakeIndex().load(d)
    assert idx2.latency_profile is not None
    np.testing.assert_allclose(
        idx2.latency_profile.latency_grid, est.latency_grid, rtol=1e-5
    )
    assert idx2.maintenance_policy.cost_estimator.latency_estimator is idx2.latency_profile


def test_packaged_grid_provenance_and_d_scaling():
    """Maintenance decisions must be auditable about which cost model they
    use (VERDICT r3 #7): on a TPU backend the committed MEASURED v5e grid is
    active for ANY dimension — d-scaled by the two-component law (slab-DMA
    linear in d, selection d-independent) — never the ~7x-off analytic
    model. Reference analog: per-instance profiling,
    maintenance_cost_estimator.cpp:59-94."""
    # CPU default: analytic (packaged grids are v5e-measured, meaningless
    # for CPU-backend latency).
    est_cpu = ListScanLatencyEstimator(d=960)
    assert est_cpu.grid_source == "analytic"
    # Forced packaged (what a TPU backend auto-selects).
    est128 = ListScanLatencyEstimator(d=128, packaged=True)
    assert est128.grid_source == "packaged(d=128,scale=1.000)"
    est960 = ListScanLatencyEstimator(d=960, packaged=True)
    assert est960.grid_source == "packaged(d=128,scale=4.575)"
    scale = 0.45 + 0.55 * 960 / 128
    np.testing.assert_allclose(
        est960.latency_grid, est128.latency_grid * scale, rtol=1e-6
    )
    # Explicit profile / CSV load still override the packaged grid.
    est = ListScanLatencyEstimator(d=16, n_values=[64, 512], k_values=[1, 8],
                                   n_trials=2, packaged=True)
    est.profile_grouped_latency(kernel="xla", n_queries=64)
    assert est.grid_source == "profiled"


def test_index_960d_uses_packaged_grid_on_tpu(monkeypatch):
    """A 960-d (gist-like) index built on a TPU backend makes split/delete
    decisions with the measured/scaled grid — the estimator the policy holds
    says so (VERDICT r3 #7 'done' criterion)."""
    monkeypatch.setattr(ListScanLatencyEstimator, "_backend_is_tpu",
                        staticmethod(lambda: True))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 960)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(512, dtype=np.int64),
              IndexBuildParams(nlist=2, niter=1))
    src = idx.maintenance_policy.cost_estimator.latency_estimator.grid_source
    assert src == "packaged(d=128,scale=4.575)"


def test_latency_estimator_monotone_in_n():
    est = ListScanLatencyEstimator(d=64)
    l1 = est.estimate_scan_latency(100, 10)
    l2 = est.estimate_scan_latency(10_000, 10)
    assert l2 > l1 > 0


def test_latency_estimator_interpolation_between_grid_points():
    est = ListScanLatencyEstimator(d=32)
    lo = est.estimate_scan_latency(1024, 16)
    hi = est.estimate_scan_latency(4096, 16)
    mid = est.estimate_scan_latency(2048, 16)
    assert lo <= mid <= hi


def test_latency_estimator_extrapolation_beyond_grid():
    est = ListScanLatencyEstimator(d=32)
    inside = est.estimate_scan_latency(65536, 256)
    outside = est.estimate_scan_latency(200_000, 256)
    assert outside > inside


def test_latency_estimator_csv_roundtrip(tmp_path):
    est = ListScanLatencyEstimator(d=16)
    est.latency_grid *= 2.0
    p = str(tmp_path / "profile.csv")
    est.save(p)
    est2 = ListScanLatencyEstimator(d=16)
    assert est2.load(p)
    np.testing.assert_allclose(est2.latency_grid, est.latency_grid, rtol=1e-5)


def test_latency_estimator_grid_mismatch_rejected(tmp_path):
    """Mismatched-grid rejection (test/cpp/latency_estimator.cpp:116)."""
    est = ListScanLatencyEstimator(d=16)
    p = str(tmp_path / "profile.csv")
    est.save(p)
    other = ListScanLatencyEstimator(d=32)
    with pytest.raises(ValueError):
        other.load(p)


# --------------------------- cost estimator ----------------------------------


def test_split_delta_sign_behavior():
    """Hot+large partitions want splitting; cold ones don't
    (maintenance_cost_estimator.cpp:384-394 invariants)."""
    est = MaintenanceCostEstimator(d=64, alpha=0.9, k=10)
    hot_large = est.compute_split_delta(65536, hit_rate=1.0, total_partitions=100)
    cold = est.compute_split_delta(65536, hit_rate=0.0, total_partitions=100)
    assert hot_large < cold
    assert cold > 0 or abs(cold) < 1e3  # no benefit without hits


def test_delete_delta_sign_behavior():
    """Cold partitions get negative (beneficial) delete deltas."""
    est = MaintenanceCostEstimator(d=64, alpha=0.9, k=10)
    cold = est.compute_delete_delta(
        1000, hit_rate=0.0, total_partitions=100,
        avg_partition_hit_rate=0.5, avg_partition_size=1000,
    )
    hot = est.compute_delete_delta(
        1000, hit_rate=1.0, total_partitions=100,
        avg_partition_hit_rate=0.5, avg_partition_size=1000,
    )
    assert cold < hot
    assert est.compute_delete_delta(1000, 0.0, 1, 0.5, 1000) == 0.0


def test_invalid_estimator_params_rejected():
    with pytest.raises(ValueError):
        MaintenanceCostEstimator(d=8, alpha=0.0, k=10)
    with pytest.raises(ValueError):
        MaintenanceCostEstimator(d=8, alpha=0.9, k=0)


# --------------------------- end-to-end policy -------------------------------


def build_skewed_index(n=20_000, d=16, nlist=32, window=100,
                       delete_threshold=10.0, split_threshold=10.0):
    """The reference's own trigger tests set thresholds to ~0
    (test/cpp/maintenance.cpp:112-127); mirror that knob here."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=nlist))
    params = MaintenancePolicyParams(
        window_size=window,
        refinement_radius=8,
        delete_threshold_ns=delete_threshold,
        split_threshold_ns=split_threshold,
    )
    idx.initialize_maintenance_policy(params)
    return idx, x, ids


def test_maintenance_noop_without_full_window():
    """No maintenance before the window fills (maintenance_policies.cpp:36-41,
    test/cpp/maintenance.cpp:59)."""
    idx, *_ = build_skewed_index()
    info = idx.maintenance()
    assert info.n_splits == 0 and info.n_deletes == 0
    nlist_before = idx.nlist()
    assert idx.nlist() == nlist_before


def test_maintenance_splits_hot_partitions():
    """Skewed traffic on few partitions triggers splits
    (test/cpp/maintenance.cpp:112-152). Partitions must exceed the split
    break-even size (~8 HBM tiles, see latency_estimator.py)."""
    idx, x, ids = build_skewed_index(
        n=30_000, nlist=4, window=50, split_threshold=0.0, delete_threshold=1e9
    )
    policy = idx.maintenance_policy
    # Simulate heavily skewed traffic: every query hits partitions 0 and 1.
    for _ in range(60):
        policy.record_query_hits([0, 1])
    nlist_before = idx.nlist()
    ntotal_before = idx.ntotal()
    info = idx.maintenance()
    assert info.n_splits > 0
    assert idx.nlist() > nlist_before - info.n_deletes
    assert idx.ntotal() == ntotal_before  # no vectors lost
    assert idx.validate()


def test_maintenance_deletes_cold_partitions():
    idx, x, ids = build_skewed_index(
        n=20_000, d=4, nlist=200, window=50,
        delete_threshold=0.0, split_threshold=1e9,
    )
    policy = idx.maintenance_policy
    # Hit only partition 0; everything else is cold.
    for _ in range(60):
        policy.record_query_hits([0])
    ntotal_before = idx.ntotal()
    info = idx.maintenance()
    assert info.n_deletes > 0
    assert idx.ntotal() == ntotal_before  # deleted partitions reassigned
    assert idx.validate()


def test_search_feeds_hit_window():
    """The search path wires record_query_hits automatically (SURVEY §2.1
    fix)."""
    idx, x, ids = build_skewed_index(window=20)
    q = x[:10]
    idx.search(q, SearchParams(k=5, nprobe=4))
    idx.search(q, SearchParams(k=5, nprobe=4))
    assert idx.maintenance_policy.hit_count_tracker.get_num_queries_recorded() >= 20


def test_search_correct_after_maintenance():
    from quake_tpu.utils import compute_recall, knn

    idx, x, ids = build_skewed_index(
        n=30_000, nlist=4, window=50, split_threshold=0.0
    )
    policy = idx.maintenance_policy
    for _ in range(60):
        policy.record_query_hits([0, 1])
    idx.maintenance()
    q = x[:50]
    res = idx.search(q, SearchParams(k=10, nprobe=idx.nlist()))
    gt, _ = knn(q, x, 10, "l2")
    assert compute_recall(res.ids, gt, 10) >= 0.99


def test_packaged_latency_profile_on_tpu(monkeypatch):
    """On TPU backends the default latency grid anchors to the committed
    MEASURED v5e profile (round-3 validation: analytic was ~7x off with
    shape errors big enough to flip split/delete decisions), scaled by the
    two-component law 0.45 + 0.55*d/128 (slab DMA linear in d; selection
    d-independent). CPU backends keep the analytic model (hermetic tests)."""
    import jax as _jax

    from quake_tpu.maintenance.latency_estimator import ListScanLatencyEstimator

    cpu_est = ListScanLatencyEstimator(128)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    tpu_est = ListScanLatencyEstimator(128)
    # measured grid differs from analytic
    assert not np.allclose(cpu_est.latency_grid, tpu_est.latency_grid)
    # monotone in n at fixed k (required by the delta formulas)
    g = tpu_est.latency_grid
    assert (np.diff(g, axis=0) >= -1e-6).all()
    # d-scaling: doubling d scales by 0.45 + 0.55*2 = 1.55 (the DMA share
    # doubles; the selection share does not)
    tpu_est2 = ListScanLatencyEstimator(256)
    np.testing.assert_allclose(tpu_est2.latency_grid, 1.55 * g, rtol=1e-6)
