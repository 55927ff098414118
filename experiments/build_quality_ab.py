"""Build-quality vs probe-count A/B: does more Lloyd iteration (or a tighter
balance cap) shift the recall-vs-nprobe curve enough to serve 0.9 recall@10
with fewer probed partitions? nprobe is directly proportional to scan work,
so -4 probes at equal recall is worth more than most kernel tweaks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/build_quality_ab.py
"""

import json
import time

import numpy as np

from bench import make_manifold


def main():
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, NLIST, K = 1_000_000, 128, 1024, 10
    x = make_manifold(N, D, 4096, seed=1)
    ids = np.arange(N, dtype=np.int64)
    q = make_manifold(1024, D, 4096, seed=7)

    gt = None
    for name, bp in (
        ("niter5", IndexBuildParams(nlist=NLIST, niter=5, calibrate_aps=False)),
        ("niter15", IndexBuildParams(nlist=NLIST, niter=15, calibrate_aps=False)),
        ("niter25", IndexBuildParams(nlist=NLIST, niter=25, calibrate_aps=False)),
    ):
        t0 = time.perf_counter()
        idx = QuakeIndex()
        idx.build(x, ids, bp)
        build_s = time.perf_counter() - t0
        if gt is None:
            st = idx.store.state
            _, gt32 = flat_search(st.codes, st.ids, jnp.asarray(q), K, "l2")
            gt = np.asarray(gt32).astype(np.int64)
        recalls = {}
        for nprobe in (8, 10, 12, 14, 16, 20):
            res = idx.search(q, SearchParams(k=K, nprobe=nprobe))
            recalls[nprobe] = round(compute_recall(res.ids, gt, K), 4)
        print(json.dumps({
            "name": name, "build_s": round(build_s, 1),
            "nlist": idx.nlist(), "C": idx.store.C,
            "recall_at_nprobe": recalls,
        }), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
