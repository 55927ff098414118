"""A/B round 27: dequantized-score epilogue (v10 exact=False).

kernel_ab26 decomposed the fused v10 step: the exact-rescore winner-vector
gather is 1.82 ms of 7.81 ms — and with pool_factor=1 the rescore cannot
change membership, only reorder within quantization ties and restore exact
distances. exact=False reconstructs scores from the kernel's quantized key
((key+0.5)/ginv + gmin - |q|^2) and gathers only the [B, k] id winners.

Probes (same-run, two passes): v10 standalone exact vs dequant; fused exact
vs dequant; membership-diff count between the two (must be ~0).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab27.py
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
        return out

    variants = [
        ("v10_exact", lambda: pg.grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4,
            exact=True)),
        ("v10_dequant", lambda: pg.grouped_scan_pallas_v10(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4,
            exact=False)),
        ("fused_exact", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v10", exact=True)),
        ("fused_dequant", lambda: fused_ivf_search(
            codes_bf, ids, sizes, norms_bf, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=64, group_chunk=64, kernel="v10", exact=False)),
    ]
    outs = {}
    for pass_no in (1, 2):
        for name, fn in variants:
            outs[name] = bench(f"{name}_p{pass_no}", fn)

    i_ex = np.asarray(outs["v10_exact"][1])
    i_dq = np.asarray(outs["v10_dequant"][1])
    diff = sum(len(set(a.tolist()) ^ set(b.tolist()))
               for a, b in zip(i_ex, i_dq)) / 2
    s_ex = np.asarray(outs["v10_exact"][0])
    s_dq = np.asarray(outs["v10_dequant"][0])
    err = float(np.nanmax(np.abs(
        np.where(np.isfinite(s_ex) & np.isfinite(s_dq), s_ex - s_dq, 0.0))))
    print(json.dumps({"membership_diff_rows": diff,
                      "max_score_err_matchedpos": round(err, 5)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
