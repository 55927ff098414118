"""A/B round 13: v6 (chunked fetch+matmul, single whole-row selection) vs
v3p4+skip. v5's lesson applied: keep v3pn's selection round count, take
v5's chunked-DMA floor (k=1: 8.43 vs 9.13 in ab12). Two passes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab13.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v3pn,
        grouped_scan_pallas_v6,
    )

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
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
        return out, ms

    ref = None

    def check(name, out):
        same = np.mean([
            len(set(np.asarray(ref[1])[b]) & set(np.asarray(out[1])[b])) / k
            for b in range(0, B, 97)
        ])
        if same < 0.999:
            print(json.dumps({"name": name, "WARN_id_overlap": round(same, 4)}),
                  flush=True)

    variants = [
        ("v3p4_skip", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v6_ct512_g4", lambda: grouped_scan_pallas_v6(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, ct=512,
            gpb=4)),
        ("v6_ct256_g4", lambda: grouped_scan_pallas_v6(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, ct=256,
            gpb=4)),
        ("v6_ct512_g4_k1", lambda: grouped_scan_pallas_v6(
            codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, ct=512,
            gpb=4)),
        ("v6_ct512_g4_bf16", lambda: grouped_scan_pallas_v6(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=32, ct=512,
            gpb=4)),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            out, _ = bench(f"{name}_p{pass_no}", fn)
            if name == "v3p4_skip":
                ref = out
            elif "k1" not in name and "bf16" not in name:
                check(name, out)
    print("done", flush=True)


if __name__ == "__main__":
    main()
