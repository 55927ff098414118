"""A/B round 22 (round 3): APS latency-mode device cost at B=64.

The amortized device time of APS (target 0.9) measured 11.3 ms/batch vs
2.2 ms for fixed-nprobe=16 (latency_bench). Candidates: the per-rank gather
path (current small-batch choice), the grouped path, chunk sizes, and the
equal-recall fixed-nprobe reference.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab22.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall
    from quake_tpu.ops.scan import flat_scan

    N, D, K, B = 1_000_000, 128, 10, 64
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B * 32, D, 4096, seed=7)

    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=1024, metric="l2", precision="bf16"))
    print(json.dumps({"build_s": round(time.perf_counter() - t0, 1),
                      "aps_dim": idx.aps_dimension,
                      "aps_gamma": idx.aps_gamma}), flush=True)
    _, gt32 = flat_scan(jnp.asarray(queries[:256]), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    q_dev = [jnp.asarray(queries[r * B:(r + 1) * B]) for r in range(32)]

    def device_ms(sp):
        last = idx._search_device_full(q_dev[0], sp)
        _ = np.asarray(last[1][:1])
        t0 = time.perf_counter()
        for qd in q_dev:
            last = idx._search_device_full(qd, sp)
        _ = np.asarray(last[1][:1])
        return (time.perf_counter() - t0) / len(q_dev) * 1000

    def recall_scanned(sp):
        res = idx.search(queries[:256], sp)
        return (round(float(compute_recall(res.ids, gt, K)), 4),
                res.timing_info.partitions_scanned)

    def aps_sp(chunk):
        return SearchParams(k=K, recall_target=0.9,
                            initial_search_fraction=0.125,
                            aps_chunk_size=chunk)

    import quake_tpu.coordinator as coord

    variants = []
    for npb in (16, 20, 24):
        variants.append((f"fixed_np{npb}", SearchParams(k=K, nprobe=npb), None))
    for chunk in (4, 8):
        variants.append((f"aps_gather_c{chunk}", aps_sp(chunk), True))
        variants.append((f"aps_grouped_c{chunk}", aps_sp(chunk), False))

    # monkeypatch-free: thread small_batch through an env-controlled wrapper
    orig = coord.aps_search

    for pass_no in (1, 2):
        for name, sp, small in variants:
            if small is not None:
                def patched(*a, **kw):
                    kw["small_batch"] = small
                    return orig(*a, **kw)
                coord.aps_search = patched
            try:
                ms = device_ms(sp)
                rec, scanned = recall_scanned(sp)
            finally:
                coord.aps_search = orig
            print(json.dumps({"name": f"{name}_p{pass_no}",
                              "device_ms": round(ms, 3), "recall": rec,
                              "scanned": scanned}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
