"""Balance-factor A/B at bench scale: slab capacity C tracks the largest
partition, and every grouped scan streams + selects over C lanes per probed
partition — so tightening the build-time split threshold (1.5x -> 1.15x the
mean) trades a few % more partitions for proportionally fewer padded lanes.

Builds two 1M x 128 indexes in one process, picks each one's smallest
nprobe reaching 0.9 recall@10, then measures fused throughput interleaved
(A, B, A, B) with amortized windows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/bench_balance.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import make_manifold


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, NLIST, K, B = 1_000_000, 128, 1024, 10, 4096
    x = make_manifold(N, D, 4096, seed=1)
    ids = np.arange(N, dtype=np.int64)
    queries = make_manifold(B * 4, D, 4096, seed=7)
    q_gt = queries[:1024]

    indexes = {}
    for name, factor in [("f1.5", 1.5), ("f1.15", 1.15)]:
        t0 = time.perf_counter()
        idx = QuakeIndex()
        idx.build(x, ids, IndexBuildParams(
            nlist=NLIST, metric="l2", balance_factor=factor))
        print(json.dumps({
            "name": name, "build_s": round(time.perf_counter() - t0, 1),
            "nlist": idx.nlist(), "C": idx.store.C, "P": int(idx.store.P),
        }), flush=True)
        indexes[name] = idx

    state = indexes["f1.5"].store.state
    _, gt_ids = flat_search(state.codes, state.ids, jnp.asarray(q_gt), K, "l2")
    gt_ids = np.asarray(gt_ids).astype(np.int64)

    chosen = {}
    for name, idx in indexes.items():
        for nprobe in (14, 16, 18, 20, 24, 32):
            res = idx.search(q_gt, SearchParams(k=K, nprobe=nprobe))
            r = compute_recall(res.ids, gt_ids, K)
            if r >= 0.90:
                chosen[name] = (nprobe, r)
                break
        else:
            chosen[name] = (32, r)
        print(json.dumps({"name": name, "nprobe": chosen[name][0],
                          "recall": round(chosen[name][1], 4)}), flush=True)

    q_dev = [jnp.asarray(queries[i * B:(i + 1) * B]) for i in range(4)]

    def measure(name):
        idx = indexes[name]
        sp = SearchParams(k=K, nprobe=chosen[name][0])
        out = idx._search_device_full(q_dev[0], sp)
        jax.block_until_ready(out[1])
        _ = np.asarray(out[1]).ravel()[:1]
        t0 = time.perf_counter()
        reps = 24
        for i in range(reps):
            out = idx._search_device_full(q_dev[i % 4], sp)
        _ = np.asarray(out[1]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 2),
                          "qps": round(B / ms * 1e3)}), flush=True)

    for pass_no in (1, 2):
        for name in ("f1.5", "f1.15"):
            measure(name)
    print("done", flush=True)


if __name__ == "__main__":
    main()
