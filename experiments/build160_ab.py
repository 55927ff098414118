"""Build-quality probe at the nlist=160 operating point: np8 recall sits
0.008 below the 0.90 gate (nlist_sweep7: 0.8922 @ np8 vs 0.9057 @ np9) —
if extra Lloyd iterations or a looser balance cap buy those 8 thousandths,
the serving nprobe drops 9 -> 8 and the headline gains ~11%. Round-2
build-quality sweep measured +0.004-0.009 recall from niter 5 -> 15; this
probes 25 (production) vs 50, and balance_factor 1.5 (production) vs 2.0
(less forced splitting of natural clusters; C grows, so a np8 win must be
re-timed — the slab is ~1/3 deeper at bf2.0 if fill drops).

Recall only (1024 GT queries); timing decided separately if any np8 build
crosses the gate.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/build160_ab.py
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.ops.scan import flat_scan
    from quake_tpu.utils import compute_recall

    N, D, K = 1_000_000, 128, 10
    x = make_manifold(N, D, 4096, seed=1)
    qgt = make_manifold(1024, D, 4096, seed=7)

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    cfgs = {
        "niter25_bf1.5": dict(niter=25, balance_factor=1.5),
        "niter50_bf1.5": dict(niter=50, balance_factor=1.5),
        "niter25_bf2.0": dict(niter=25, balance_factor=2.0),
        "niter50_bf2.0": dict(niter=50, balance_factor=2.0),
    }
    for name, kw in cfgs.items():
        t0 = time.perf_counter()
        idx = QuakeIndex()
        idx.build(x, np.arange(N, dtype=np.int64),
                  IndexBuildParams(nlist=160, metric="l2", precision="bf16",
                                   calibrate_aps=False, **kw))
        built = round(time.perf_counter() - t0)
        for npb in (8, 9):
            r = idx.search(qgt, SearchParams(k=K, nprobe=npb,
                                             exact_distances=False))
            rec = compute_recall(r.ids, gt, K)
            print(json.dumps({"cfg": name, "C": idx.store.C, "built_s": built,
                              "nprobe": npb, "recall": round(rec, 4)}),
                  flush=True)
        del idx
    print("done", flush=True)


if __name__ == "__main__":
    main()
