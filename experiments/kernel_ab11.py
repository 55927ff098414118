"""A/B round 11: the scatter-minimal build_groups (sort + searchsorted +
gathers + one scatter) in the full kernel path, and parent-scan variants
(approx vs exact vs bf16 matmul) for the 1.5ms parent ranking.
Two passes; pass 2 is the verdict.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab11.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.coordinator import flat_scan, fused_ivf_search
    from quake_tpu.ops.grouped import _build_groups_matrix, _build_groups_sort
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3pn

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    cent_ids = jnp.arange(P, dtype=jnp.int32)
    cents_bf = cents.astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))

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
        print(json.dumps({"name": name, "ms": round(ms, 2)}), flush=True)
        return ms

    bgm = jax.jit(
        lambda p: sum(jnp.sum(t) for t in _build_groups_matrix(p, P, 32)))
    bgs2 = jax.jit(
        lambda p: sum(jnp.sum(t) for t in _build_groups_sort(p, P, 32)))
    parent_ap = jax.jit(lambda qq: jax.tree_util.tree_map(jnp.sum, flat_scan(
        qq, cents, cent_ids, 16, "l2", approx=True)))
    parent_ex = jax.jit(lambda qq: jax.tree_util.tree_map(jnp.sum, flat_scan(
        qq, cents, cent_ids, 16, "l2", approx=False)))
    parent_bf = jax.jit(lambda qq: jax.tree_util.tree_map(jnp.sum, flat_scan(
        qq.astype(jnp.bfloat16), cents_bf, cent_ids, 16, "l2", approx=True)))

    variants = [
        ("v3p4_skip_sort2", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("fused_sort2", lambda: fused_ivf_search(
            codes, ids, sizes, norms, cents.reshape(P, 1, D),
            cent_ids.reshape(P, 1), q, k=k, nprobe=16, metric="l2",
            qt=32, group_chunk=64, kernel="v3p4")),
        ("build_groups_sort2", lambda: bgs2(pids)),
        ("build_groups_matrix", lambda: bgm(pids)),
        ("parent_approx", lambda: parent_ap(q)),
        ("parent_exact", lambda: parent_ex(q)),
        ("parent_approx_bf16", lambda: parent_bf(q)),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
