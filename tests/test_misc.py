"""Coverage for auxiliary modules: file formats, registries, profiling,
datasets (SURVEY §2.2 utility surface)."""

import numpy as np
import pytest

from quake_tpu.utils import (
    fbin_read,
    fvecs_read,
    fvecs_write,
    ibin_read,
    ivecs_read,
    ivecs_write,
    next_pow2,
)


def test_fvecs_ivecs_roundtrip(tmp_path):
    """fvecs/ivecs readers/writers (reference utils.py:139-164)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 7)).astype(np.float32)
    p = str(tmp_path / "a.fvecs")
    fvecs_write(p, x)
    np.testing.assert_array_equal(fvecs_read(p), x)

    iv = rng.integers(0, 100, (5, 3)).astype(np.int32)
    p2 = str(tmp_path / "a.ivecs")
    ivecs_write(p2, iv)
    np.testing.assert_array_equal(ivecs_read(p2), iv)


def test_fbin_ibin_read(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 4)).astype(np.float32)
    p = str(tmp_path / "a.fbin")
    with open(p, "wb") as f:
        np.array([6, 4], dtype=np.int32).tofile(f)
        x.tofile(f)
    np.testing.assert_array_equal(fbin_read(p), x)

    iv = rng.integers(0, 50, (3, 2)).astype(np.int32)
    p2 = str(tmp_path / "a.ibin")
    with open(p2, "wb") as f:
        np.array([3, 2], dtype=np.int32).tofile(f)
        iv.tofile(f)
    np.testing.assert_array_equal(ibin_read(p2), iv)


def test_next_pow2():
    assert next_pow2(1) == 1
    assert next_pow2(3) == 4
    assert next_pow2(1024) == 1024
    assert next_pow2(1025) == 2048
    assert next_pow2(0, floor=8) == 8


def test_dataset_registry():
    from quake_tpu.datasets import load_dataset

    base, queries, gt = load_dataset("random", n=500, d=8, nq=10)
    assert base.shape == (500, 8)
    assert gt.shape[0] == 10
    with pytest.raises(ValueError):
        load_dataset("nonexistent")


def test_dataset_component_loaders(tmp_path):
    """Reference per-component API (ann_datasets.py:28-40): load_vectors/
    load_queries/load_ground_truth agree with load(), and the Sift1m offline
    layout detection accepts both <dir>/sift/ and a flat file drop."""
    from quake_tpu.datasets import RandomDataset, Sift1m
    from quake_tpu.utils import fvecs_write, ivecs_write

    ds = RandomDataset(n=200, d=8, nq=5)
    base, queries, gt = ds.load()
    np.testing.assert_array_equal(ds.load_vectors(), base)
    np.testing.assert_array_equal(ds.load_queries(), queries)
    np.testing.assert_array_equal(ds.load_ground_truth(), gt)

    # Flat-drop offline layout: three files directly in the directory.
    rng = np.random.default_rng(0)
    fvecs_write(str(tmp_path / "sift_base.fvecs"),
                rng.standard_normal((20, 4), dtype=np.float32))
    fvecs_write(str(tmp_path / "sift_query.fvecs"),
                rng.standard_normal((3, 4), dtype=np.float32))
    ivecs_write(str(tmp_path / "sift_groundtruth.ivecs"),
                rng.integers(0, 20, (3, 2)).astype(np.int32))
    s = Sift1m(str(tmp_path))
    assert s.is_downloaded()
    v, q, g = s.load()
    assert v.shape == (20, 4) and q.shape == (3, 4)
    assert g.dtype == np.int64 and g.shape == (3, 2)
    np.testing.assert_array_equal(s.load_ground_truth(), g)


def test_wrapper_registry():
    from quake_tpu.wrappers.wrapper import get_index_class

    assert get_index_class("Quake").__name__ == "QuakeWrapper"
    assert get_index_class("BruteForce").__name__ == "BruteForceWrapper"
    with pytest.raises(ValueError):
        get_index_class("NoSuchIndex")


def test_brute_force_wrapper_roundtrip(tmp_path):
    from quake_tpu.wrappers.brute import BruteForceWrapper

    rng = np.random.default_rng(2)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    w = BruteForceWrapper()
    w.build(x, metric="l2")
    res = w.search(x[:5], k=1)
    np.testing.assert_array_equal(res.ids[:, 0], np.arange(5))
    w.add(x[:3] + 100.0)
    assert w.n_total() == 203
    w.remove(np.array([0, 1], dtype=np.int64))
    assert w.n_total() == 201
    w.save(str(tmp_path / "bf"))
    w2 = BruteForceWrapper()
    w2.load(str(tmp_path / "bf"))
    assert w2.n_total() == 201
    assert w2.index_state()["n_total"] == 201


def test_flatten_timing():
    from quake_tpu.profiling import flatten_timing
    from quake_tpu.timing import SearchTimingInfo

    ti = SearchTimingInfo(n_queries=4, total_time_ns=100)
    ti.parent_info = SearchTimingInfo(n_queries=4, total_time_ns=10)
    flat = flatten_timing(ti)
    assert flat["total_time_ns"] == 100
    assert flat["parent.total_time_ns"] == 10


def test_evaluator_non_batched_path(tmp_path):
    """Per-query (non-batched) evaluation path (workload_generator.py:497-506)."""
    from quake_tpu.workload.generator import DynamicWorkloadGenerator
    from quake_tpu.workload.evaluator import WorkloadEvaluator
    from quake_tpu.wrappers.quake import QuakeWrapper

    rng = np.random.default_rng(3)
    base = rng.standard_normal((2000, 8)).astype(np.float32)
    gen = DynamicWorkloadGenerator(
        workload_dir=tmp_path / "w",
        base_vectors=base,
        metric="l2",
        insert_ratio=0.0,
        delete_ratio=0.0,
        query_ratio=1.0,
        update_batch_size=10,
        query_batch_size=4,
        number_of_operations=3,
        initial_size=1000,
        cluster_size=100,
        cluster_sample_distribution="uniform",
    )
    gen.generate_workload()
    ev = WorkloadEvaluator(workload_dir=tmp_path / "w", output_dir=tmp_path / "o")
    results = ev.evaluate_workload(
        name="q",
        index=QuakeWrapper(),
        build_params={"nc": 8, "metric": "l2"},
        search_params={"k": 5, "nprobe": 8},
        batch=False,
    )
    recalls = [r["recall"] for r in results if r["operation_type"] == "query"]
    assert recalls and all(r >= 0.99 for r in recalls)


def test_debug_mode_traps_nans():
    """Sanitizer-analog (reference: opt-in TSAN/ASAN, CMakeLists.txt:186-196):
    debug mode fails loudly when a NaN is produced instead of silently
    poisoning results; the production search path stays clean under it."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.debug import disable_debug_mode, enable_debug_mode

    enable_debug_mode()
    try:
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2000, 16)).astype(np.float32)
        idx = QuakeIndex()
        idx.build(x, np.arange(2000, dtype=np.int64), IndexBuildParams(nlist=8))
        res = idx.search(x[:8], SearchParams(k=5, nprobe=8))
        assert (res.ids[:, 0] == np.arange(8)).all()  # clean under debug mode

        with pytest.raises(Exception):  # NaN producer trips the check
            jax.block_until_ready(jax.jit(lambda a: a / a)(jnp.zeros(4)))
    finally:
        disable_debug_mode()
