"""A/B: oneshot-APS epilogue generations at the PRODUCTION operating point
(nlist=256, B=8192 — nlist_sweep4's round-4 winner).

Round-3/4 history: oneshot cut the batched-APS tax from planned's ~2.2x of
equal-recall fixed to ~1.5x; the flat-pair-list budget (v10b) alone measured
neutral at nlist=1024 (aps_oneshot_ab r4). This script measures the v11b
SORTED-placement budgeted epilogue (one uint32 sort + one row take replacing
the [B*M+1, kk] row scatter — the masked-path analog of the dense v10->v11
-11% win, kernel_ab30) against the scatter variants, same-run, at the
operating point the headline actually serves.

Variants (same build, same-run, two interleaved passes, trust pass 2):
  fixed_np12 / np14 / np16 — fixed-nprobe anchors bracketing oneshot's
    achieved recall, so the EQUAL-RECALL tax is interpolable from one run.
  oneshot_sorted  — production path: v11 kernel, budget on -> v11b sorted.
  oneshot_scatter — same budget, v10 kernel forced -> v10b row scatter.
  oneshot_nobudget — budget off -> unbudgeted v10 masked scan (r3 path).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_v11b_ab.py
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
                      "aps_dim": idx.aps_dimension,
                      "gamma": idx.aps_gamma,
                      "mcap": idx.aps_oneshot_mcap,
                      "width_clip": idx.aps_width_clip,
                      "budget_w": idx.aps_budget_w,
                      "kernel": idx._grouped_kernel()}),
          flush=True)

    q_dev = jnp.asarray(queries[:B])

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
    prod_kernel = idx._grouped_kernel()
    scatter_kernel = "v10" + prod_kernel[3:] if prod_kernel.startswith("v11") \
        else prod_kernel

    def configure(budget_on: bool, kernel: str):
        idx.aps_width_clip, idx.aps_budget_w = \
            cal_budget if budget_on else (0, 0)
        if kernel == prod_kernel:
            idx.__dict__.pop("_grouped_kernel", None)  # restore the method
        else:
            idx._grouped_kernel = lambda: kernel

    osp = SearchParams(k=K, recall_target=target, aps_mode="oneshot",
                       exact_distances=False)
    cases = [
        ("fixed_np12", SearchParams(k=K, nprobe=12, exact_distances=False),
         False, prod_kernel),
        ("fixed_np14", SearchParams(k=K, nprobe=14, exact_distances=False),
         False, prod_kernel),
        ("fixed_np16", SearchParams(k=K, nprobe=16, exact_distances=False),
         False, prod_kernel),
        ("oneshot_sorted", osp, True, prod_kernel),
        ("oneshot_scatter", osp, True, scatter_kernel),
        ("oneshot_nobudget", osp, False, prod_kernel),
    ]
    if not cal_budget[1]:
        print(json.dumps({"note": "budget calibration rejected; "
                                  "sorted/scatter variants skipped"}),
              flush=True)
        cases = [c for c in cases if not c[0].startswith("oneshot_s")]

    meta = {}
    for name, sp, bud, kern in cases:
        configure(bud, kern)
        rec, scanned = recall_and_scanned(sp)
        meta[name] = (rec, scanned)
        print(json.dumps({"cfg": name, "recall": round(rec, 4),
                          "scanned_mean": scanned}), flush=True)

    for pass_no in (1, 2):
        for name, sp, bud, kern in cases:
            configure(bud, kern)
            ms = step_ms(sp)
            rec, scanned = meta[name]
            print(json.dumps({"cfg": f"{name}_p{pass_no}",
                              "recall": round(rec, 4),
                              "scanned": scanned, "ms": round(ms, 3),
                              "qps": round(B / ms * 1e3)}), flush=True)

    # Small-batch decomposition (STATUS r4 gap #3): oneshot device cost
    # measured nearly flat in B (7.9ms at B=64/nlist=512 vs 11.5 at
    # B=4096/nlist=1024) — a large B-independent band. Time the same
    # variants at B=64 to see whether the budget/sorted machinery (grid +
    # tables sized to min(n, P) groups) is that band at the production
    # nlist.
    q64 = jnp.asarray(queries[:64])

    def step_ms_64(sp):
        last = idx._search_device_full(q64, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(20):
            last = idx._search_device_full(q64, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        est = (time.perf_counter() - t0) / 20
        reps = max(int(1.2 / max(est, 1e-4)), 20)
        t0 = time.perf_counter()
        for _ in range(reps):
            last = idx._search_device_full(q64, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        return (time.perf_counter() - t0) / reps * 1e3

    small = [c for c in cases if c[0] in
             ("fixed_np12", "oneshot_sorted", "oneshot_scatter",
              "oneshot_nobudget")]
    for pass_no in (1, 2):
        for name, sp, bud, kern in small:
            configure(bud, kern)
            ms = step_ms_64(sp)
            print(json.dumps({"cfg": f"{name}_B64_p{pass_no}",
                              "ms": round(ms, 3),
                              "qps": round(64 / ms * 1e3)}), flush=True)
    configure(True, prod_kernel)
    print("done", flush=True)


if __name__ == "__main__":
    main()
