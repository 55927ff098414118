"""A/B round 19 (round 3): packed key-domain merge epilogue for v8/v9.

Replaces the [B, pool] lax.top_k merge (1.5 ms alone at [4096, 160]) with a
fold + k packed rounds in key domain (global quantization scale makes keys
comparable across groups), and drops the dequantize entirely from the
non-dedup path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab19.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v9

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)
    pc = cents.reshape(1, P, D)
    pid_arr = jnp.arange(P, dtype=jnp.int32).reshape(1, P)

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
        print(json.dumps({"name": name, "ms": round(ms, 3),
                          "qps": round(B / ms * 1e3)}), flush=True)
        return out, ms

    ref = None

    def check(name, out):
        same = np.mean([
            len(set(np.asarray(ref[1])[b]) & set(np.asarray(out[1])[b])) / k
            for b in range(0, B, 97)
        ])
        print(json.dumps({"name": name, "id_overlap": round(same, 4)}),
              flush=True)

    variants = [
        ("v9_full_qt64", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)),
        ("v9_full_qt64_bf16", lambda: grouped_scan_pallas_v9(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4)),
        ("fused_v9_qt64_f32", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
        ("fused_v9_qt64_bf16", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v9")),
    ]
    from quake_tpu.ops.grouped import grouped_scan_xla
    oracle = None
    for pass_no in (1, 2):
        for name, fn in variants:
            out, _ = bench(f"{name}_p{pass_no}", fn)
            if name == "v9_full_qt64":
                ref = out
            elif "bf16" not in name and name != "v9_full_qt64":
                check(name, out)
    # correctness vs exact XLA backend
    s1, i1, _ = grouped_scan_xla(codes, ids, q, pids, k, "l2", qt=16,
                                 group_chunk=32, norms=norms)
    ov = np.mean([
        len(set(np.asarray(i1)[b]) & set(np.asarray(ref[1])[b])) / k
        for b in range(0, B, 53)
    ])
    print(json.dumps({"v9_vs_exact_overlap": round(float(ov), 4)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
