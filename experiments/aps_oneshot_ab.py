"""A/B: oneshot APS (predicted-radius plan, ONE scan) vs planned (two-phase)
vs loop vs equal-recall fixed-nprobe, at production batch.

The planned path's remaining 1.72x-of-fixed ratio (STATUS r3 #3) is
structural: two full grouped-machinery passes. Oneshot drops the prologue —
its cost is one masked grouped scan at the planned mean nprobe plus the
profile math, so the floor is ~1.1-1.2x of fixed. Adherence moved into the
build-time radius predictor; this script reports achieved recall on REAL
(out-of-sample) queries — the calibration sample is resident vectors, so
this is the honest adherence check.

Round-4 additions (VERDICT r3 #4): oneshot now serves the flat-pair-list
budgeted scan (grouped_scan_pallas_v10b) when the build calibrated
(aps_width_clip, aps_budget_w) — "oneshot" below measures that production
path, "oneshot_nobudget" toggles the fields off same-run to isolate the
budget's contribution; exact_distances=False now reaches the APS pool tail
(round-4 prep f28ee7e), so the dequant win is included in both.

Protocol: build once (niter=15, bf16, calibrated), recall vs f32 oracle on
1024 queries; same-run interleaved timing at B=4096, two passes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_oneshot_ab.py
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

    N, D, K, B = 1_000_000, 128, 10, 4096
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
              IndexBuildParams(nlist=1024, metric="l2", precision="bf16",
                               niter=15))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "aps_dim": idx.aps_dimension,
                      "gamma": idx.aps_gamma,
                      "radius_ab_k10": (None if idx.aps_radius_ab is None
                                        else [round(float(v), 4)
                                              for v in idx.aps_radius_ab[9]]),
                      "mcap": idx.aps_oneshot_mcap,
                      "width_clip": idx.aps_width_clip,
                      "budget_w": idx.aps_budget_w}),
          flush=True)

    q_dev = jnp.asarray(queries[:B])
    qgt_dev = jnp.asarray(qgt)

    def recall_and_scanned(sp):
        res = idx.search(qgt, sp)
        return (compute_recall(res.ids, gt, K),
                res.timing_info.partitions_scanned)

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

    cal_budget = (idx.aps_width_clip, idx.aps_budget_w)

    def set_budget(on: bool):
        idx.aps_width_clip, idx.aps_budget_w = cal_budget if on else (0, 0)

    # (name, params, budget_on): "oneshot" is the production path (budgeted
    # when the calibration accepted it); "oneshot_nobudget" isolates the
    # flat-pair-list machinery's contribution same-run.
    sps = [
        ("fixed_np16",
         SearchParams(k=K, nprobe=16, exact_distances=False), False),
        ("oneshot",
         SearchParams(k=K, recall_target=target, aps_mode="oneshot",
                      exact_distances=False), True),
        ("oneshot_nobudget",
         SearchParams(k=K, recall_target=target, aps_mode="oneshot",
                      exact_distances=False), False),
        ("planned",
         SearchParams(k=K, recall_target=target, aps_mode="planned",
                      exact_distances=False), False),
        ("loop",
         SearchParams(k=K, recall_target=target, aps_mode="loop",
                      exact_distances=False), False),
    ]
    if not cal_budget[1]:
        sps = [c for c in sps if c[0] != "oneshot_nobudget"]
    meta = {}
    for name, sp, bud in sps:
        set_budget(bud)
        rec, scanned = recall_and_scanned(sp)
        meta[name] = (rec, scanned)
        print(json.dumps({"cfg": name, "recall": round(rec, 4),
                          "scanned_mean": scanned}), flush=True)

    for pass_no in (1, 2):
        for name, sp, bud in sps:
            set_budget(bud)
            ms = step_ms(sp)
            rec, scanned = meta[name]
            print(json.dumps({"cfg": f"{name}_p{pass_no}",
                              "recall": round(rec, 4),
                              "scanned": scanned, "ms": round(ms, 3),
                              "qps": round(B / ms * 1e3)}), flush=True)
    set_budget(True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
