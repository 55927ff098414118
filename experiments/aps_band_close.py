"""Close out VERDICT r4 #2: post-fix APS-vs-fixed device cost at B=64 AND
B=8192 (gate: oneshot/planned <= 1.5x equal-recall fixed-nprobe).

The band was per-dispatch host->device transfers (see aps_band_bisect.out
and the geometry/index scalar caches). This is the certification artifact:
same-run two-pass, recall context from 1024 GT queries, production build
(nlist=256 bf16 niter=15 calibrated).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_band_close.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.ops.scan import flat_scan
    from quake_tpu.utils import compute_recall

    N, D, K = 1_000_000, 128, 10
    target = 0.9
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(8192 + 1024, D, 4096, seed=7)
    qgt = queries[:1024]

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=256, metric="l2", precision="bf16",
                               niter=15))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "mcap": idx.aps_oneshot_mcap,
                      "width_clip": idx.aps_width_clip,
                      "dense_w": idx.aps_dense_w}), flush=True)

    modes = [
        ("fixed_np12", SearchParams(k=K, nprobe=12, exact_distances=False)),
        ("fixed_np16", SearchParams(k=K, nprobe=16, exact_distances=False)),
        ("auto_dense", SearchParams(k=K, recall_target=target,
                                    exact_distances=False)),
        # Above-calib auto (round 5): dense scan of the width_clip prefix —
        # recall superset of every clipped oneshot plan, cheaper measured.
        ("auto_above", SearchParams(k=K, recall_target=0.95,
                                    exact_distances=False)),
        ("oneshot", SearchParams(k=K, recall_target=target,
                                 aps_mode="oneshot", exact_distances=False)),
        ("planned", SearchParams(k=K, recall_target=target,
                                 aps_mode="planned", exact_distances=False)),
    ]
    for name, sp in modes:
        res = idx.search(qgt, sp)
        print(json.dumps({"cfg": name,
                          "recall": round(compute_recall(res.ids, gt, K), 4),
                          "scanned": res.timing_info.partitions_scanned}),
              flush=True)

    def step_ms(q_dev, sp):
        last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        return (time.perf_counter() - t0) / reps * 1e3

    for pass_no in (1, 2):
        for B in (64, 8192):
            q_dev = jnp.asarray(queries[1024:1024 + B])
            for name, sp in modes:
                ms = step_ms(q_dev, sp)
                print(json.dumps({"B": B, "cfg": f"{name}_p{pass_no}",
                                  "ms": round(ms, 3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
