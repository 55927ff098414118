"""A/B: planned (two-phase) APS vs while-loop APS vs fixed-nprobe at
production batch (round-3 STATUS #3: the loop re-pays grouping + epilogue +
termination math per chunk — ratio regressed to 1.85x once fixed-nprobe got
faster).

Same-run, two interleaved passes; amortized >=1.2s windows; recall measured
against the on-device exact oracle.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_planned_ab.py
"""

import json
import time

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
    queries = make_manifold(B, D, 4096, seed=7)
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64), IndexBuildParams(nlist=NLIST))
    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(queries[:1024]),
                          K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    q_dev = jnp.asarray(queries)

    def bench(name, sp):
        out = idx._search_device_full(q_dev, sp)
        jax.block_until_ready(out[1])
        t0 = time.perf_counter()
        for _ in range(3):
            out = idx._search_device_full(q_dev, sp)
        _ = np.asarray(out[1]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = idx._search_device_full(q_dev, sp)
        _ = np.asarray(out[1]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        res = idx.search(queries[:1024], sp)
        rec = compute_recall(res.ids, gt, K)
        print(json.dumps({
            "name": name, "ms": round(ms, 3), "qps": round(B / ms * 1e3),
            "recall": round(float(rec), 4),
            "scanned": round(float(res.timing_info.partitions_scanned), 1),
        }), flush=True)

    variants = [
        ("fixed_np16", SearchParams(k=K, nprobe=16)),
        ("aps_loop", SearchParams(k=K, recall_target=0.9, aps_mode="loop")),
        ("aps_planned_m0", SearchParams(k=K, recall_target=0.9,
                                        aps_mode="planned",
                                        aps_plan_margin=0)),
        ("aps_planned_m4", SearchParams(k=K, recall_target=0.9,
                                        aps_mode="planned",
                                        aps_plan_margin=4)),
        ("aps_planned_m8", SearchParams(k=K, recall_target=0.9,
                                        aps_mode="planned",
                                        aps_plan_margin=8)),
        ("aps_planned_c8_m4", SearchParams(k=K, recall_target=0.9,
                                           aps_mode="planned",
                                           aps_chunk_size=8,
                                           aps_plan_margin=4)),
    ]
    for pass_no in (1, 2):
        for name, sp in variants:
            bench(f"{name}_p{pass_no}", sp)
    print("done", flush=True)


if __name__ == "__main__":
    main()
