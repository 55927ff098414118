"""A/B round 30: v11 (sorted-placement epilogue) vs v10 (scatter epilogue)
at the nlist=512 bench shape.

kernel_ab28 costed the placements standalone: place_scatter 1.83 ms vs
sort2_take 0.79 at B=8192 (pidsort 0.49 standalone but at the dispatch
floor). This measures the real kernels end-to-end, standalone + fused,
exact=False (serving mode), two interleaved passes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab30.py
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

    qs, pids_b = {}, {}
    for B in (4096, 8192):
        qs[B] = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        pids_b[B] = jnp.asarray(
            np.stack([rng.choice(P, nprobe, replace=False)
                      for _ in range(B)]).astype(np.int32))

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
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    def standalone(B, variant):
        fn = {"v10": pg.grouped_scan_pallas_v10,
              "v11": pg.grouped_scan_pallas_v11}[variant]

        def run():
            s, i, _ = fn(codes_bf, ids, sizes, norms_bf, qs[B], pids_b[B],
                         k, "l2", qt=64, gpb=4, exact=False)
            return jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
        return run

    def fused(B, kern):
        def run():
            out = fused_ivf_search(
                codes_bf, ids, sizes, norms_bf, pc, pid_arr, qs[B], k=k,
                nprobe=nprobe, metric="l2", qt=64, group_chunk=64,
                kernel=kern, exact=False)
            return jnp.sum(out[0][:, :1])
        return run

    variants = [
        ("v10_B8192", standalone(8192, "v10")),
        ("v11_B8192", standalone(8192, "v11")),
        ("v10_B4096", standalone(4096, "v10")),
        ("v11_B4096", standalone(4096, "v11")),
        ("fused_v10_B8192", fused(8192, "v10")),
        ("fused_v11_B8192", fused(8192, "v11")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)

    # id parity sample (quantization-tie swaps only)
    s0, i0, _ = pg.grouped_scan_pallas_v10(
        codes_bf, ids, sizes, norms_bf, qs[4096], pids_b[4096], k, "l2",
        qt=64, gpb=4, exact=False)
    s1, i1, _ = pg.grouped_scan_pallas_v11(
        codes_bf, ids, sizes, norms_bf, qs[4096], pids_b[4096], k, "l2",
        qt=64, gpb=4, exact=False)
    i0, i1 = np.asarray(i0), np.asarray(i1)
    ov = np.mean([len(set(i0[b]) & set(i1[b])) / k for b in range(256)])
    print(json.dumps({"id_overlap_v10_v11": round(float(ov), 4)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
