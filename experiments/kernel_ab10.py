"""A/B round 10 — decompose the NON-kernel ~6.5ms of the fused 14.7ms
search: parent ranking, build_groups internals, the exact [B,160] merge
(vs the approx tiled reducer), and batch-8192 dispatch amortization.
All probes sum-reduce their outputs inside the jit (ab9's 16MB-output
transfer artifact); two passes, pass 2 is the verdict.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab10.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from quake_tpu.coordinator import flat_scan, fused_ivf_search
    from quake_tpu.ops.grouped import _build_groups_matrix, _build_groups_sort
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3pn

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    cent_ids = jnp.arange(P, dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    q8 = jnp.asarray(rng.standard_normal((2 * B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))
    pids8 = jnp.asarray(rng.integers(0, P, (2 * B, 16)).astype(np.int32))
    safe = jnp.where(pids >= 0, pids, P)
    barange = jnp.arange(B, dtype=jnp.int32)[:, None]
    ms_merge = jnp.asarray(rng.standard_normal((B, 160)).astype(np.float32))
    mi_merge = jnp.asarray(rng.integers(0, 1 << 24, (B, 160)).astype(np.int32))

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

    parent = jax.jit(lambda qq: jax.tree_util.tree_map(
        jnp.sum, flat_scan(qq, cents, cent_ids, 16, "l2", approx=True)))
    merge_exact = jax.jit(lambda s, i: lax.top_k(s, k)[0].sum())

    def _approx(s, i):
        v, idx = lax.approx_max_k(s, k)
        return v.sum() + jnp.take_along_axis(i, idx, axis=1).sum()

    merge_approx = jax.jit(_approx)
    bgm = jax.jit(
        lambda p: sum(jnp.sum(t) for t in _build_groups_matrix(p, P, 32)))
    bgs = jax.jit(
        lambda p: sum(jnp.sum(t) for t in _build_groups_sort(p, P, 32)))
    pres_probe = jax.jit(lambda s: jnp.sum(jnp.zeros(
        (B, P + 1), jnp.int32).at[barange, s].add(1, mode="drop")))
    pres = jnp.zeros((B, P + 1), jnp.int32).at[barange, safe].add(
        1, mode="drop")
    cumsum_probe = jax.jit(lambda m: jnp.sum(jnp.cumsum(m, axis=0)))
    sort_probe = jax.jit(lambda p: jnp.sum(jnp.sort(
        (p.reshape(-1) + 1) * (B * 16) + jnp.arange(B * 16, dtype=jnp.int32))))
    qid = jnp.broadcast_to(barange, (B, 16)).reshape(-1)
    G = P + (B * 16) // 32
    gsc = jnp.asarray(rng.integers(0, G, B * 16).astype(np.int32))
    ssc = jnp.asarray(rng.integers(0, 32, B * 16).astype(np.int32))
    qlist_probe = jax.jit(lambda g_, s_: jnp.sum(jnp.full(
        (G, 32), -1, jnp.int32).at[g_, s_].set(qid, mode="drop")))

    variants = [
        ("v3p4_skip_B4096", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v3p4_skip_B8192", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q8, pids8, k, "l2", qt=32, gpb=4)),
        ("fused_B4096", lambda: fused_ivf_search(
            codes, ids, sizes, norms, cents.reshape(P, 1, D),
            cent_ids.reshape(P, 1), q, k=k, nprobe=16, metric="l2",
            qt=32, group_chunk=64, kernel="v3p4")),
        ("parent_scan", lambda: parent(q)),
        ("merge_exact_topk160", lambda: merge_exact(ms_merge, mi_merge)),
        ("merge_approx_160", lambda: merge_approx(ms_merge, mi_merge)),
        ("build_groups_matrix", lambda: bgm(pids)),
        ("build_groups_sort", lambda: bgs(pids)),
        ("scatter_presence", lambda: pres_probe(safe)),
        ("cumsum_BP", lambda: cumsum_probe(pres)),
        ("sort_packed", lambda: sort_probe(pids)),
        ("scatter_qlist", lambda: qlist_probe(gsc, ssc)),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
