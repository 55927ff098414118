"""A/B round 15 (round 3): v8 global-scale quantize (no per-row reduces, no
stats output) vs v7; build_groups inverse-permutation variants; fused
end-to-end with the winners.

ab14 found: fold-max2 rounds save only ~0.6 ms (v7 10.88 vs v3p4 11.48 pass
2) because the k=1 floor is 8.44 ms — the quantize prologue, grouping, and
steps dominate, not the rounds. v8 attacks the quantize reduces; the
inv-mode variants attack the one scatter left in build_groups.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab15.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import fused_ivf_search
    from quake_tpu.ops.grouped import _build_groups_sort
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v7,
        grouped_scan_pallas_v8,
    )

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
        if same < 0.99:
            print(json.dumps({"name": name, "WARN_id_overlap": round(same, 4)}),
                  flush=True)

    def bg(mode):
        @jax.jit
        def fn():
            out = _build_groups_sort(pids, P, 32, inv_mode=mode)
            return [jnp.sum(o) for o in out]
        return fn

    variants = [
        ("v7_g4", lambda: grouped_scan_pallas_v7(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v8_g4", lambda: grouped_scan_pallas_v8(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v8_g4_k1", lambda: grouped_scan_pallas_v8(
            codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, gpb=4)),
        ("v7_g4_k1", lambda: grouped_scan_pallas_v7(
            codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, gpb=4)),
        ("v8_g4_qt64", lambda: grouped_scan_pallas_v8(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4)),
        ("v8_g4_bf16", lambda: grouped_scan_pallas_v8(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=32, gpb=4)),
        ("v8_g8", lambda: grouped_scan_pallas_v8(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=8)),
        ("bg_scatter", bg("scatter")),
        ("bg_searchsorted", bg("searchsorted")),
        ("bg_sort", bg("sort")),
        ("fused_v7", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=32, group_chunk=64, kernel="v7")),
        ("fused_v8", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=32, group_chunk=64, kernel="v8")),
        ("fused_v3p4", lambda: fused_ivf_search(
            codes, ids, sizes, norms, pc, pid_arr, q, k=k, nprobe=16,
            metric="l2", qt=32, group_chunk=64, kernel="v3p4")),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            out, _ = bench(f"{name}_p{pass_no}", fn)
            if name == "v7_g4":
                ref = out
            elif name.startswith("v8") and "k1" not in name:
                check(name, out)
    print("done", flush=True)


if __name__ == "__main__":
    main()
