"""A/B round 29: qt/gpb re-sweep at the NEW operating point (nlist=512,
C=2816, nprobe=14, B up to 8192 — nlist_sweep3 flipped the bench config).

The qt=64 cap was set at nlist=1024 shapes where avg pairs/partition ~= 64
and qt=128 would halve group fill. At nlist=512 the avg is 112 (B=4096) /
224 (B=8192) pairs per partition, so qt=128 keeps fill high while HALVING
group count — slab re-reads, per-step overhead, and selection rounds all
drop. VMEM at qt=128/gpb=4: 4 x [2816, 128] bf16 slabs double-buffered
(5.8 MB) + [512, 128] f32 scratch x2 (0.5 MB) — fits.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab29.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops import pallas_grouped as pg

    D, k = 128, 10
    P, C = 512, 2816
    nprobe = 14
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D, fill=0.72)
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)
    pc = cents.reshape(1, P, D)
    pid_arr = jnp.arange(P, dtype=jnp.int32).reshape(1, P)

    qs = {}
    pids_b = {}
    for B in (4096, 8192):
        qs[B] = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        pids_b[B] = jnp.asarray(
            np.stack([rng.choice(P, nprobe, replace=False)
                      for _ in range(B)]).astype(np.int32))

    def bench(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    def v10(B, qt, gpb):
        def run():
            s, i, _ = pg.grouped_scan_pallas_v10(
                codes_bf, ids, sizes, norms_bf, qs[B], pids_b[B], k, "l2",
                qt=qt, gpb=gpb, exact=False)
            return jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
        return run

    def fused(B, qt):
        def run():
            out = fused_ivf_search(
                codes_bf, ids, sizes, norms_bf, pc, pid_arr, qs[B], k=k,
                nprobe=nprobe, metric="l2", qt=qt, group_chunk=64,
                kernel="v10", exact=False)
            return jnp.sum(out[0][:, :1])
        return run

    variants = [
        ("v10_B8192_qt64_g4", v10(8192, 64, 4)),
        ("v10_B8192_qt128_g4", v10(8192, 128, 4)),
        ("v10_B8192_qt128_g2", v10(8192, 128, 2)),
        ("v10_B8192_qt64_g8", v10(8192, 64, 8)),
        ("v10_B4096_qt64_g4", v10(4096, 64, 4)),
        ("v10_B4096_qt128_g4", v10(4096, 128, 4)),
        ("fused_B8192_qt64", fused(8192, 64)),
        ("fused_B8192_qt128", fused(8192, 128)),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
