"""A/B round 4 (same-run comparisons only — cross-run variance on the
tunneled chip reaches ~40%): groups-per-step sweep for v3pn, plus qt and
bf16 interactions at the winner.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab4.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v3p,
        grouped_scan_pallas_v3pn,
    )

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    cent_ids = jnp.arange(P, dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)

    def bench(name, fn, *args, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 2),
                          "qps": round(B / ms * 1e3)}), flush=True)
        return ms

    bench("v3p_gpb1", grouped_scan_pallas_v3p,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=32)
    bench("v3p_gpb2", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=2)
    bench("v3p_gpb4", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)
    bench("v3p_gpb4_k1", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, gpb=4)
    bench("v3p_gpb4_bf16", grouped_scan_pallas_v3pn,
          codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=32, gpb=4)
    bench("v3p_gpb4_qt64", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)
    bench("v3p_gpb8", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=8)
    bench("fused_gpb4", fused_ivf_search,
          codes, ids, sizes, norms,
          cents.reshape(P, 1, D), cent_ids.reshape(P, 1), q,
          k=k, nprobe=16, metric="l2", qt=32, group_chunk=64, kernel="v3p4")
    print("done", flush=True)


if __name__ == "__main__":
    main()
