"""A/B round 20 (round 3): operating-point selection under same-run timing.

Cross-run bench variance (401k @ np18 vs 379k @ np16 in runs whose build
times differed 3.5x) makes the pool-factor/nprobe choice unreliable across
runs. Same-run, on the REAL bench corpus (manifold data, true fill):
  * v9 pool1 np18 vs pool2 np16 vs pool2 np18 — throughput AND recall
  * parent+fused at both nprobe values

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab20.py
"""

import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.scan import flat_scan
    from quake_tpu.utils import compute_recall

    N, D, K, B = 1_000_000, 128, 10, 4096
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B, D, 4096, seed=7)
    q = jnp.asarray(queries)

    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=1024, metric="l2", precision="bf16",
                               calibrate_aps=False))
    print(json.dumps({"build_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    st = idx.store.state
    pst = idx.parent.store.state

    _, gt32 = flat_scan(jnp.asarray(queries[:1024]), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    def bench(name, fn, recall_out=None):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        rec = None
        if recall_out is not None:
            rec = round(float(compute_recall(
                np.asarray(out[1])[:1024].astype(np.int64), gt, K)), 4)
        print(json.dumps({"name": name, "ms": round(ms, 3),
                          "qps": round(B / ms * 1e3), "recall": rec}),
              flush=True)
        return out, ms

    from quake_tpu.coordinator import rank_parents
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v9
    from quake_tpu.ops.scan import scores_to_distances
    import functools

    @functools.partial(jax.jit, static_argnames=("npb", "pf"))
    def run_fused(codes, ids_a, sizes_a, norms_a, pcodes, pids_a, qq,
                  npb, pf):
        pids = rank_parents(pcodes, pids_a, None, qq, npb, "l2")
        s, i, scanned = grouped_scan_pallas_v9(
            codes, ids_a, sizes_a, norms_a, qq, pids, K, "l2",
            qt=64, gpb=4, pool_factor=pf)
        return s, i, scores_to_distances(s, i, "l2"), scanned, pids

    def fused(npb, pf):
        return lambda: run_fused(st.codes, st.ids, st.sizes, st.norms,
                                 pst.codes, pst.ids, q, npb, pf)

    variants = [
        ("fused_pool2_np16", fused(16, 2), True),
        ("fused_pool1_np16", fused(16, 1), True),
        ("fused_pool1_np18", fused(18, 1), True),
        ("fused_pool2_np18", fused(18, 2), True),
        ("fused_pool2_np17", fused(17, 2), True),
        ("fused_pool3_np16", fused(16, 3), True),
    ]
    for pass_no in (1, 2):
        for name, fn, rc in variants:
            bench(f"{name}_p{pass_no}", fn, recall_out=rc)
    print("done", flush=True)


if __name__ == "__main__":
    main()
