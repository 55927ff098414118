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
