"""A/B round 23 (round 3): Pallas merge kernel vs the unfused XLA merge.

The epilogue's fold+rounds merge is ~40 small XLA ops on [B, 256]/[B, 128]
tiles — op overhead, not bytes. One Pallas call computes winner positions.
Also re-measures build_groups after the scatter-based p_of_g landed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab23.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.ops.grouped import _build_groups_sort
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v9

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)

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
        if same < 0.999:
            print(json.dumps({"name": name, "WARN_id_overlap": round(same, 4)}),
                  flush=True)

    @jax.jit
    def bg_current():
        out = _build_groups_sort(pids, P, 64)
        return sum(jnp.sum(o) for o in out)

    variants = [
        ("v9_qt64_xla_merge", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4,
            merge="xla")),
        ("v9_qt64_pallas_merge", lambda: grouped_scan_pallas_v9(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4,
            merge="pallas")),
        ("v9_qt64_pallas_merge_bf16", lambda: grouped_scan_pallas_v9(
            codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=64, gpb=4,
            merge="pallas")),
        ("bg_qt64_scatterpog", bg_current),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            out, _ = bench(f"{name}_p{pass_no}", fn)
            if name == "v9_qt64_xla_merge":
                ref = out
            elif "bf16" not in name and name.startswith("v9"):
                check(name, out)
    print("done", flush=True)


if __name__ == "__main__":
    main()
