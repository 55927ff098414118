"""A/B round 14 (round 3): v7 column-folded max2 selection vs v3p4+skip,
plus the Pallas parent-ranking kernel vs the approx_max_k parent scan.

v7 hypothesis: selection rounds over a [QT, fold] reduced row cut the
round-count-bound selection cost (~2.6-3.4 ms of the 8.9 ms kernel) ~4x;
with selection cheap, bf16 codes (DMA 2.9 -> 1.45 ms) and qt=64 (halves
slab re-reads) may flip from neutral/losing to winning.

Protocol: two interleaved passes, trust pass 2; >=1.2 s amortized windows;
sync via a 1-element transfer of the first (small) output leaf.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab14.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.ops.pallas_flat import parent_rank_pallas
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v3pn,
        grouped_scan_pallas_v7,
    )
    from quake_tpu.ops.scan import flat_scan

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)

    # Parent setup: centroids as a [1, P, D] slab (P % 128 == 0).
    pc = cents.reshape(1, P, D)
    pid_arr = jnp.arange(P, dtype=jnp.int32).reshape(1, P)
    pnorms = jnp.sum(cents.astype(jnp.float32) ** 2, axis=1).reshape(1, P)

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
        if same < 0.995:
            print(json.dumps({"name": name, "WARN_id_overlap": round(same, 4)}),
                  flush=True)

    @jax.jit
    def parent_approx():
        _, cand = flat_scan(q, cents, jnp.arange(P, dtype=jnp.int32), 16,
                            "l2", approx=True)
        return jnp.sum(cand)

    @jax.jit
    def parent_pallas():
        cand = parent_rank_pallas(pc, pid_arr, pnorms, q, 16, "l2")
        return jnp.sum(cand)

    variants = [
        ("v3p4_skip", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v7_g4_f128", lambda: grouped_scan_pallas_v7(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v7_g8_f128", lambda: grouped_scan_pallas_v7(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=8)),
        ("v7_g4_f256", lambda: grouped_scan_pallas_v7(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4,
            fold=256)),
        ("v7_g4_f128_k1", lambda: grouped_scan_pallas_v7(
            codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, gpb=4)),
        ("v3p4_skip_k1", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, gpb=4)),
        ("v7_g4_f128_bf16", lambda: grouped_scan_pallas_v7(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=32, gpb=4)),
        ("v7_g4_f128_qt64", lambda: grouped_scan_pallas_v7(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)),
        ("v7_g4_f128_qt64_bf16", lambda: grouped_scan_pallas_v7(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4)),
        ("parent_approx", parent_approx),
        ("parent_pallas", parent_pallas),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            out, _ = bench(f"{name}_p{pass_no}", fn)
            if name == "v3p4_skip":
                ref = out
            elif name.startswith("v7") and "k1" not in name:
                check(name, out)
    print("done", flush=True)


if __name__ == "__main__":
    main()
