"""A/B round 9 — decompose the remaining v3p4_skip milliseconds
(11.6ms kernel path at B=4096, nprobe=16): build_groups internals
(scatter vs sort vs cumsum), the qg gather, and the merge epilogue.
Two passes; pass 2 is the verdict (ab7/ab8 first-slot penalty).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab9.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.ops.grouped import (
        _build_groups_matrix,
        _build_groups_sort,
        build_groups,
    )
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3pn

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
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

    n = B * 16
    flat_pid = pids.reshape(-1)
    safe = jnp.where(pids >= 0, pids, P)
    barange = jnp.arange(B, dtype=jnp.int32)[:, None]
    G = P + n // 32
    gs = jnp.asarray(rng.integers(0, G, n).astype(np.int32))
    ss = jnp.asarray(rng.integers(0, 32, n).astype(np.int32))
    qid = jnp.broadcast_to(barange, (B, 16)).reshape(-1)

    probes = {
        # presence scatter-add [B, P+1]
        "scatter_presence": jax.jit(lambda s: jnp.zeros(
            (B, P + 1), jnp.int32).at[barange, s].add(1, mode="drop")),
        # cumsum over queries
        "cumsum_BP": jax.jit(lambda m: jnp.cumsum(m, axis=0)),
        # qlist scatter (n updates into [G, qt])
        "scatter_qlist": jax.jit(lambda g_, s_: jnp.full(
            (G, 32), -1, jnp.int32).at[g_, s_].set(qid, mode="drop")),
        # packed single-key sort
        "sort_packed": jax.jit(lambda p: jnp.sort(
            (p + 1) * n + jnp.arange(n, dtype=jnp.int32))),
        # qg gather [G, 32, D]
        "gather_qg": jax.jit(lambda ql: q[jnp.where(ql >= 0, ql, 0)]),
    }
    pres = probes["scatter_presence"](safe)
    group_pid, qlist, pair_group, pair_slot = build_groups(pids, P, 32)

    bgm = jax.jit(lambda p: _build_groups_matrix(p, P, 32))
    bgs = jax.jit(lambda p: _build_groups_sort(p, P, 32))

    variants = [
        ("v3p4_skip", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4,
            skip=True)),
        ("build_groups_matrix", lambda: jax.tree_util.tree_leaves(bgm(pids))),
        ("build_groups_sort", lambda: jax.tree_util.tree_leaves(bgs(pids))),
        ("scatter_presence", lambda: probes["scatter_presence"](safe)),
        ("cumsum_BP", lambda: probes["cumsum_BP"](pres)),
        ("scatter_qlist", lambda: probes["scatter_qlist"](gs, ss)),
        ("sort_packed", lambda: probes["sort_packed"](flat_pid)),
        ("gather_qg", lambda: probes["gather_qg"](qlist)),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
