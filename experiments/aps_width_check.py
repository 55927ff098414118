"""On-TPU validation of the auto-candidate-width fix at the production
operating point (nlist=256, B=8192, target 0.9).

aps_v11b_ab (r4) exposed that EVERY APS mode under-adhered at nlist=256:
achieved 0.78 @ target 0.9, scanned 5 — exactly the candidate width the
0.02 initial_search_fraction default produced. Plans cannot extend past the
parent ranking's width, so adherence silently capped. The fix: auto
(None) fraction serves the calibration-validated width (aps_plan_width /
oneshot mcap). This script measures, same-run on the real chip:
  - adherence of oneshot/planned/loop under DEFAULT params (the contract);
  - the equal-recall APS tax vs fixed-nprobe anchors np12/np14/np16 now
    that plans actually reach their depth.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_width_check.py
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

    N, D, K, B = 1_000_000, 128, 10, 8192
    target = 0.9
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B, D, 4096, seed=7)
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
                      "aps_dim": idx.aps_dimension, "gamma": idx.aps_gamma,
                      "plan_width": idx.aps_plan_width,
                      "mcap": idx.aps_oneshot_mcap,
                      "width_clip": idx.aps_width_clip,
                      "budget_w": idx.aps_budget_w,
                      "dense_w": getattr(idx, "aps_dense_w", 0),
                      "kernel": idx._grouped_kernel()}), flush=True)

    q_dev = jnp.asarray(queries[:B])

    cases = [
        ("fixed_np12", SearchParams(k=K, nprobe=12, exact_distances=False)),
        ("fixed_np14", SearchParams(k=K, nprobe=14, exact_distances=False)),
        ("fixed_np16", SearchParams(k=K, nprobe=16, exact_distances=False)),
        ("auto_dense", SearchParams(k=K, recall_target=target,
                                    exact_distances=False)),
        ("oneshot", SearchParams(k=K, recall_target=target,
                                 aps_mode="oneshot", exact_distances=False)),
        ("planned", SearchParams(k=K, recall_target=target,
                                 aps_mode="planned", exact_distances=False)),
        ("loop", SearchParams(k=K, recall_target=target, aps_mode="loop",
                              exact_distances=False)),
    ]

    for name, sp in cases:
        res = idx.search(qgt, sp)
        rec = compute_recall(res.ids, gt, K)
        print(json.dumps({"cfg": name, "recall": round(rec, 4),
                          "scanned_mean": res.timing_info.partitions_scanned}),
              flush=True)

    def step_ms(sp):
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

    timed = [c for c in cases if c[0] in
             ("fixed_np12", "fixed_np14", "fixed_np16", "auto_dense",
              "oneshot", "planned")]
    for pass_no in (1, 2):
        for name, sp in timed:
            ms = step_ms(sp)
            print(json.dumps({"cfg": f"{name}_p{pass_no}",
                              "ms": round(ms, 3),
                              "qps": round(B / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
