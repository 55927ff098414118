"""Operating-point sweep with the round-3 serving stack (v10 kernel +
dequantized-score epilogue + bf16 slabs): does finer partitioning win now?

The kernel scans WHOLE slabs (cost per pair ~ C), so doubling nlist halves
per-pair scan cost; at equal recall nprobe grows sub-2x — net win if the
pair-proportional machinery (grouping/scatter/merge) doesn't eat it. The
round-2 balance_factor probe (more partitions via balancing) was negative,
but that shrank C only 25%; this is the direct 2x.

Configs (all bf16, niter=15 to pin build quality):
  flat_1024   nlist=1024 (production config)
  flat_2048   nlist=2048
  soar_2048   nlist=2048 + SOAR spill (dual residency, dedup'd search)

Protocol: recall gate on 1024 queries vs the f32 oracle (min nprobe with
recall@10 >= 0.905); same-run interleaved QPS at B=4096, two passes, with
exact_distances=False (ids unchanged; kernel_ab27).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/nlist_sweep2.py
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
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B * 2, D, 4096, seed=7)
    qgt = queries[:1024]

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    def build(name, **kw):
        t0 = time.perf_counter()
        idx = QuakeIndex()
        idx.build(x, np.arange(N, dtype=np.int64),
                  IndexBuildParams(metric="l2", precision="bf16", niter=15,
                                   calibrate_aps=False, **kw))
        print(json.dumps({"built": name, "s": round(time.perf_counter() - t0),
                          "C": idx.store.C,
                          "mem_mb": int(np.asarray(idx.store.state.codes).nbytes
                                        ) // 2**20}), flush=True)
        return idx

    idxs = {
        "flat_1024": build("flat_1024", nlist=1024),
        "flat_2048": build("flat_2048", nlist=2048),
        "soar_2048": build("soar_2048", nlist=2048, spill=True),
    }

    # recall gate: min nprobe with recall >= 0.905
    chosen = {}
    for name, idx in idxs.items():
        grid = ((6, 7, 8, 9, 10, 12, 14) if name == "soar_2048"
                else (16, 18, 20) if name == "flat_1024"
                else (18, 20, 22, 24, 26, 28, 32))
        for npb in grid:
            r = idx.search(qgt, SearchParams(k=K, nprobe=npb,
                                             exact_distances=False))
            rec = compute_recall(r.ids, gt, K)
            print(json.dumps({"cfg": name, "nprobe": npb,
                              "recall": round(rec, 4)}), flush=True)
            if rec >= 0.905:
                chosen[name] = (npb, rec)
                break
        else:
            chosen[name] = (grid[-1], rec)

    q_dev = jnp.asarray(queries[:B])

    def qps(idx, sp):
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
        ms = (time.perf_counter() - t0) / reps * 1e3
        return ms

    for pass_no in (1, 2):
        for name, idx in idxs.items():
            npb, rec = chosen[name]
            sp = SearchParams(k=K, nprobe=npb, exact_distances=False)
            ms = qps(idx, sp)
            print(json.dumps({"cfg": f"{name}_p{pass_no}", "nprobe": npb,
                              "recall": round(rec, 4), "ms": round(ms, 3),
                              "qps": round(B / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
