"""A/B round 21 (round 3): recover the in-kernel recall loss at nprobe=16.

ab20 localized the v9 recall gap (0.893 vs v3p-era 0.905 at np16) to the
per-group selection: candidates for recovery are (a) sampled global bounds
(2-4x effective quantization levels -> fewer in-group ties) and (b)
fold=256 (4x fewer max2 column collisions). Same-run on the real bench
corpus, recall against exact f32 ground truth.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab21.py
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
    from quake_tpu import IndexBuildParams, QuakeIndex
    from quake_tpu.coordinator import rank_parents
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v9
    from quake_tpu.ops.scan import flat_scan, scores_to_distances
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

    @functools.partial(jax.jit, static_argnames=("npb", "fold", "bounds"))
    def run_fused(codes, ids_a, sizes_a, norms_a, pcodes, pids_a, qq,
                  npb, fold, bounds):
        pids = rank_parents(pcodes, pids_a, None, qq, npb, "l2")
        s, i, scanned = grouped_scan_pallas_v9(
            codes, ids_a, sizes_a, norms_a, qq, pids, K, "l2",
            qt=64, gpb=4, fold=fold, bounds=bounds)
        return s, i, scores_to_distances(s, i, "l2"), scanned, pids

    def fused(npb, fold, bounds):
        return lambda: run_fused(st.codes, st.ids, st.sizes, st.norms,
                                 pst.codes, pst.ids, q, npb, fold, bounds)

    def bench(name, fn):
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
        rec = round(float(compute_recall(
            np.asarray(out[1])[:1024].astype(np.int64), gt, K)), 4)
        print(json.dumps({"name": name, "ms": round(ms, 3),
                          "qps": round(B / ms * 1e3), "recall": rec}),
              flush=True)

    variants = [
        ("np16_f128_analytic", fused(16, 128, "analytic")),
        ("np16_f128_sampled", fused(16, 128, "sampled")),
        ("np16_f256_analytic", fused(16, 256, "analytic")),
        ("np16_f256_sampled", fused(16, 256, "sampled")),
        ("np18_f128_analytic", fused(18, 128, "analytic")),
        ("np18_f256_sampled", fused(18, 256, "sampled")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
