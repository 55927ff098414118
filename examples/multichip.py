#!/usr/bin/env python
"""Multi-chip example: build, shard over a device mesh, search, mutate.

Runs on real TPU slices or on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py
"""

import os

import numpy as np


def main():
    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((50_000, 64)).astype(np.float32)
    ids = np.arange(len(x), dtype=np.int64)
    q = rng.standard_normal((256, 64)).astype(np.float32)

    # Build sharded: partitions' slot axis splits across the mesh — every
    # device scans a 1/n_dev slice of each probed partition.
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=128, num_shards=n_dev))
    print(f"built nlist={idx.nlist()}, sharded over {n_dev} devices")

    res = idx.search(q, SearchParams(k=10, nprobe=32))
    gt, _ = knn(q, x, 10)
    print(f"recall@10 (nprobe=32): {compute_recall(res.ids, gt, 10):.3f}")

    # Mutations work on the sharded store (sharding propagates through the
    # functional update programs).
    extra = rng.standard_normal((1000, 64)).astype(np.float32)
    extra_ids = np.arange(100_000, 101_000, dtype=np.int64)
    idx.add(extra, extra_ids)
    idx.remove(ids[:1000])
    print(f"after add/remove: ntotal={idx.ntotal()}")

    res = idx.search(q, SearchParams(k=10, nprobe=32))
    resident_x = np.concatenate([x[1000:], extra])
    resident_ids = np.concatenate([ids[1000:], extra_ids])
    gt2, _ = knn(q, resident_x, 10, ids=resident_ids)
    print(f"recall after mutation: {compute_recall(res.ids, gt2, 10):.3f}")


if __name__ == "__main__":
    main()
