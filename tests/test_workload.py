"""Workload generator/evaluator tests
(mirror test/python/test_workload_generator.py:26-114)."""

import json

import numpy as np
import pytest

from quake_tpu.params import MaintenancePolicyParams
from quake_tpu.workload.generator import (
    DynamicWorkloadGenerator,
    StratifiedClusterSampler,
    UniformSampler,
)
from quake_tpu.workload.evaluator import WorkloadEvaluator
from quake_tpu.wrappers.quake import QuakeWrapper


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("workload")
    rng = np.random.default_rng(0)
    base = rng.standard_normal((10_000, 16)).astype(np.float32)
    gen = DynamicWorkloadGenerator(
        workload_dir=tmp,
        base_vectors=base,
        metric="l2",
        insert_ratio=0.3,
        delete_ratio=0.2,
        query_ratio=0.5,
        update_batch_size=100,
        query_batch_size=20,
        number_of_operations=20,
        initial_size=2000,
        cluster_size=100,
        cluster_sample_distribution="uniform",
        queries=None,
        seed=42,
    )
    gen.generate_workload()
    return tmp, base


def test_workload_files_exist(workload):
    tmp, base = workload
    assert (tmp / "runbook.json").exists()
    assert (tmp / "initial_indices.npy").exists()
    assert (tmp / "base_vectors.npy").exists()
    runbook = json.loads((tmp / "runbook.json").read_text())
    assert runbook["summary"]["n_operations"] > 0
    ops = runbook["operations"]
    assert len(ops) == runbook["summary"]["n_operations"]
    # Every op has a saved ids file; queries also have gt.
    for op_id, op in ops.items():
        assert (tmp / "operations" / f"{op_id}.npy").exists()
        if op["type"] == "query":
            assert (tmp / "operations" / f"{op_id}_gt_ids.npy").exists()


def test_evaluator_runs_and_reports_recall(workload, tmp_path):
    tmp, base = workload
    ev = WorkloadEvaluator(workload_dir=tmp, output_dir=tmp_path / "out")
    results = ev.evaluate_workload(
        name="quake",
        index=QuakeWrapper(),
        build_params={"nc": 32, "metric": "l2"},
        search_params={"k": 10, "nprobe": 16},
        do_maintenance=True,
        m_params=MaintenancePolicyParams(window_size=50),
    )
    assert len(results) > 0
    recalls = [r["recall"] for r in results if r["operation_type"] == "query"]
    assert recalls, "workload contained no queries"
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert np.mean(recalls) > 0.5
    # index_state is reported per op (n_list/n_total).
    assert all("n_list" in r and "n_total" in r for r in results)


def test_uniform_sampler_no_duplicates():
    s = UniformSampler(np.random.default_rng(0))
    pool = np.arange(100, dtype=np.int64)
    out = s.sample(pool, 10)
    assert len(out) == 10
    assert len(np.unique(out)) == 10


def test_stratified_sampler_draws_from_clusters():
    rng = np.random.default_rng(1)
    centroids = rng.standard_normal((8, 4)).astype(np.float32)
    assignments = rng.integers(0, 8, 200)
    s = StratifiedClusterSampler(assignments, centroids, rng)
    pool = np.arange(200, dtype=np.int64)
    out = s.sample(pool, 50)
    assert 0 < len(out) <= 50
    # Skewed: samples concentrate in few clusters.
    clusters_hit = np.unique(assignments[out])
    assert len(clusters_hit) < 8


def test_regression_compare_gates(tmp_path):
    """5%/1% regression thresholds (compare_results.py:178-181 analog)."""
    import csv
    import sys

    sys.path.insert(0, "regression")
    from compare_results import compare

    def write(path, lat, rec, maint=None):
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(
                f,
                fieldnames=[
                    "method", "operation_type", "latency_ms", "recall",
                    "maintenance_ms",
                ],
            )
            w.writeheader()
            w.writerow(
                {"method": "m", "operation_type": "query", "latency_ms": lat,
                 "recall": rec, "maintenance_ms": maint}
            )

    base = tmp_path / "base.csv"
    write(base, 10.0, 0.95, maint=100.0)
    ok = tmp_path / "ok.csv"
    write(ok, 10.4, 0.945, maint=104.0)  # within +5% latency, -1% recall
    bad_lat = tmp_path / "bad_lat.csv"
    write(bad_lat, 11.0, 0.95, maint=100.0)
    bad_rec = tmp_path / "bad_rec.csv"
    write(bad_rec, 10.0, 0.93, maint=100.0)
    bad_maint = tmp_path / "bad_maint.csv"
    write(bad_maint, 10.0, 0.95, maint=120.0)

    assert compare(str(base), str(ok)) == []
    assert any("latency" in f for f in compare(str(base), str(bad_lat)))
    assert any("recall" in f for f in compare(str(base), str(bad_rec)))
    assert any("maintenance" in f for f in compare(str(base), str(bad_maint)))


def test_faiss_ivf_wrapper_smoke():
    """Exercise the FaissIVF baseline wrapper end-to-end (build/search/add/
    remove + one evaluator-style recall check). Skips where faiss-cpu is not
    installed (it is in the CPU CI image; reference wrappers are CI-tested
    the same way)."""
    pytest.importorskip("faiss")
    from quake_tpu.utils import compute_recall, knn
    from quake_tpu.wrappers.faiss_ivf import FaissIVF

    rng = np.random.default_rng(0)
    x = rng.standard_normal((5000, 16)).astype(np.float32)
    ids = np.arange(5000, dtype=np.int64)
    q = rng.standard_normal((50, 16)).astype(np.float32)
    w = FaissIVF()
    w.build(x, nc=16, metric="l2", ids=ids)
    assert w.n_total() == 5000
    res = w.search(q, k=10, nprobe=16)
    gt_ids, _ = knn(q, x, 10, "l2")
    assert compute_recall(res.ids, gt_ids, 10) >= 0.95
    w.add(x[:0], np.array([], dtype=np.int64))  # empty add is a no-op
    new = rng.standard_normal((100, 16)).astype(np.float32)
    w.add(new, np.arange(10_000, 10_100, dtype=np.int64))
    w.remove(ids[:100])
    assert w.n_total() == 5000


def test_faiss_ivfpq_wrapper_smoke():
    """PQ variant matrix of the FaissIVF wrapper (reference
    faiss_ivf.py:96-160): PQ (nc=0, m/b set) and IVFPQ (nc>0, m/b set) with
    the IndexRefineFlat re-ranking factor. Skips without faiss-cpu."""
    pytest.importorskip("faiss")
    from quake_tpu.utils import compute_recall, knn
    from quake_tpu.wrappers.faiss_ivf import FaissIVF

    rng = np.random.default_rng(1)
    x = rng.standard_normal((5000, 16)).astype(np.float32)
    ids = np.arange(5000, dtype=np.int64)
    q = rng.standard_normal((50, 16)).astype(np.float32)
    gt_ids, _ = knn(q, x, 10, "l2")

    w = FaissIVF()
    with pytest.raises(ValueError):
        w.build(x, nc=16, m=4, b=0, ids=ids)  # m xor b

    # PQ (flat + refine)
    w.build(x, nc=0, m=4, b=8, ids=ids)
    assert w.index_state()["index_type"] == "pq"
    res = w.search(q, k=10, rf=4)
    assert compute_recall(res.ids, gt_ids, 10) >= 0.8

    # IVFPQ (+ refine)
    w2 = FaissIVF()
    w2.build(x, nc=16, m=4, b=8, ids=ids)
    assert w2.index_state()["index_type"] == "ivfpq"
    assert w2.centroids() is not None and len(w2.centroids()) == 16
    res2 = w2.search(q, k=10, nprobe=16, rf=4)
    assert compute_recall(res2.ids, gt_ids, 10) >= 0.8
    w2.remove(ids[:100])
    assert w2.n_total() == 4900


def test_numpy_ivf_wrapper_executes():
    """The ALWAYS-executed competitor baseline (no optional deps): build/
    search/add/remove/save/load with recall checks vs the oracle — the analog
    of the reference's Faiss-IVF smoke (test_basic.py:1-51), guaranteed to
    run in the zero-egress image."""
    import tempfile

    from quake_tpu.utils import compute_recall, knn
    from quake_tpu.wrappers.numpy_ivf import NumpyIVF
    from quake_tpu.wrappers.wrapper import get_index_class

    assert get_index_class("NumpyIVF") is NumpyIVF
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5000, 16)).astype(np.float32)
    ids = np.arange(5000, dtype=np.int64)
    q = rng.standard_normal((50, 16)).astype(np.float32)
    gt_ids, _ = knn(q, x, 10, "l2")

    w = NumpyIVF()
    w.build(x, nc=16, metric="l2", ids=ids)
    assert w.n_total() == 5000 and w.d() == 16
    res = w.search(q, k=10, nprobe=16)  # full probe -> exact
    assert compute_recall(res.ids, gt_ids, 10) >= 0.999
    res4 = w.search(q, k=10, nprobe=4)
    r4 = compute_recall(res4.ids, gt_ids, 10)
    assert 0.3 < r4 <= 1.0

    new = rng.standard_normal((100, 16)).astype(np.float32)
    w.add(new, np.arange(10_000, 10_100, dtype=np.int64))
    w.remove(ids[:100])
    assert w.n_total() == 5000
    with tempfile.TemporaryDirectory() as td:
        w.save(td)
        w2 = NumpyIVF()
        w2.load(td)
        assert w2.n_total() == 5000
        a = w.search(q, k=5, nprobe=16)
        b = w2.search(q, k=5, nprobe=16)
        np.testing.assert_array_equal(a.ids, b.ids)


def test_numpy_ivf_ip_metric():
    from quake_tpu.utils import compute_recall, knn
    from quake_tpu.wrappers.numpy_ivf import NumpyIVF

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3000, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((40, 16)).astype(np.float32)
    gt_ids, _ = knn(q, x, 10, "ip")
    w = NumpyIVF()
    w.build(x, nc=8, metric="ip")
    res = w.search(q, k=10, nprobe=8)
    assert compute_recall(res.ids, gt_ids, 10) >= 0.999
