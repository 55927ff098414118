"""bf16 storage-precision mode: memory halves, quality stays reasonable."""

import jax.numpy as jnp
import numpy as np

from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
from quake_tpu.utils import compute_recall, knn


def test_bf16_build_and_search(small_data):
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32, precision="bf16"))
    assert idx.store.state.codes.dtype == jnp.bfloat16
    res = idx.search(q, SearchParams(k=10, nprobe=32))
    gt_ids, _ = knn(q, x, 10, "l2")
    # Full probe with bf16 codes: small ranking perturbations only.
    assert compute_recall(res.ids, gt_ids, 10) >= 0.9


def test_bf16_mutation_and_save_load(tmp_path, small_data):
    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x[:2000], ids[:2000], IndexBuildParams(nlist=8, precision="bf16"))
    idx.add(x[2000:2100], ids[2000:2100])
    idx.remove(ids[:100])
    assert idx.ntotal() == 2000
    idx.save(str(tmp_path / "b"))
    idx2 = QuakeIndex().load(str(tmp_path / "b"))
    assert idx2.store.state.codes.dtype == jnp.bfloat16
    r1 = idx.search(q, SearchParams(k=5, nprobe=8))
    r2 = idx2.search(q, SearchParams(k=5, nprobe=8))
    np.testing.assert_array_equal(r1.ids, r2.ids)


def test_bf16_recall_parity_with_f32():
    """bf16-built index matches the f32 index's recall within 1% at a
    realistic scale/config (50k x 64, nlist=64, nprobe=8) — the storage
    precision only perturbs near-tie rankings (VERDICT r1: recall-parity
    assertion required before bf16 ships as a default)."""
    rng = np.random.default_rng(7)
    n, d = 50_000, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    q = rng.standard_normal((256, d)).astype(np.float32)
    gt_ids, _ = knn(q, x, 10, "l2")
    recalls = {}
    for prec in ("f32", "bf16"):
        idx = QuakeIndex()
        idx.build(x, ids, IndexBuildParams(nlist=64, precision=prec,
                                           calibrate_aps=False))
        res = idx.search(q, SearchParams(k=10, nprobe=8))
        recalls[prec] = compute_recall(res.ids, gt_ids, 10)
    assert recalls["bf16"] >= recalls["f32"] - 0.01, recalls


def test_bf16_checkpoint_is_half_size(tmp_path, small_data):
    """bf16 checkpoints store codes natively (uint16 bit view), not an f32
    upcast (round-1 advisor finding)."""
    import os

    x, ids, _ = small_data
    for prec in ("f32", "bf16"):
        idx = QuakeIndex()
        idx.build(x[:4000], ids[:4000], IndexBuildParams(nlist=8, precision=prec))
        idx.save(str(tmp_path / prec))
    f32_sz = os.path.getsize(tmp_path / "f32" / "codes.npy")
    bf16_sz = os.path.getsize(tmp_path / "bf16" / "codes.npy")
    assert bf16_sz <= f32_sz / 2 + 4096
