"""A/B round 2: where do the remaining milliseconds go?

Dissects the 17.2ms end-to-end batch (238.7k qps) vs the 13.0ms v3p kernel:
parent scan, build_groups prologue, merge epilogue, grid-step overhead
(via G scaling), batch-size amortization, and slab capacity (C) sensitivity.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab2.py
"""

import json
import time

import numpy as np


def make_setup(P, C, D, fill=0.64, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    codes_np = rng.standard_normal((P, C, D)).astype(np.float32)
    sizes_np = rng.integers(int((fill - 0.12) * C), C + 1, P).astype(np.int32)
    ids_np = np.arange(P * C, dtype=np.int32).reshape(P, C)
    for p in range(P):
        ids_np[p, sizes_np[p]:] = -1
        codes_np[p, sizes_np[p]:] = 0.0
    codes = jnp.asarray(codes_np)
    ids = jnp.asarray(ids_np)
    sizes = jnp.asarray(sizes_np)
    norms = jnp.sum(codes.astype(jnp.float32) ** 2, axis=2)
    cents = jnp.asarray(
        codes_np.sum(axis=1) / np.maximum(sizes_np[:, None], 1)
    )
    return codes, ids, sizes, norms, cents


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.grouped import build_groups
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3p
    from quake_tpu.ops.scan import flat_scan

    D, k = 128, 10
    rng = np.random.default_rng(1)

    def bench(name, fn, *args, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args, **kw)
        jax.tree_util.tree_leaves(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 2)}), flush=True)
        return ms

    # --- baseline shapes (match bench.py post-build) ---
    P, C = 1024, 1536
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    cent_ids = jnp.arange(P, dtype=jnp.int32)
    B = 4096
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))

    # 1. components
    bench("parent_flat_scan_np16", lambda: flat_scan(
        q, cents, cent_ids, 16, "l2", approx=True))
    bench("build_groups_qt32", lambda: build_groups(pids, P, 32))
    m_kernel = bench("v3p_kernel_np16", grouped_scan_pallas_v3p,
                     codes, ids, sizes, norms, q, pids, k, "l2", qt=32)
    bench("fused_v3p_np16", fused_ivf_search,
          codes, ids, sizes, norms,
          cents.reshape(P, 1, D), cent_ids.reshape(P, 1), q,
          k=k, nprobe=16, metric="l2", qt=32, group_chunk=64, kernel="v3p")

    # 2. grid-overhead fit: k=1 at different G (G ~ unique + B*np/qt)
    for nprobe in (8, 32):
        pp = jnp.asarray(rng.integers(0, P, (B, nprobe)).astype(np.int32))
        bench(f"v3p_k1_np{nprobe}", grouped_scan_pallas_v3p,
              codes, ids, sizes, norms, q, pp, 1, "l2", qt=32)

    # 3. batch amortization
    q8 = jnp.asarray(rng.standard_normal((8192, D)).astype(np.float32))
    bench("fused_v3p_np16_B8192", fused_ivf_search,
          codes, ids, sizes, norms,
          cents.reshape(P, 1, D), cent_ids.reshape(P, 1), q8,
          k=k, nprobe=16, metric="l2", qt=32, group_chunk=64, kernel="v3p")

    # 4. capacity sensitivity: tighter build cap -> C=1280 (fill ~0.76)
    P2, C2 = 1152, 1280
    codes2, ids2, sizes2, norms2, cents2 = make_setup(P2, C2, D, fill=0.76, seed=2)
    pids2 = jnp.asarray(rng.integers(0, P2, (B, 16)).astype(np.int32))
    bench("v3p_kernel_np16_C1280", grouped_scan_pallas_v3p,
          codes2, ids2, sizes2, norms2, q, pids2, k, "l2", qt=32)
    print("done", flush=True)


if __name__ == "__main__":
    main()
