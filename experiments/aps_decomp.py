"""Decompose the oneshot-APS overhead vs fixed-nprobe at B=4096.

aps_oneshot_ab shows oneshot ~11.8-13.1 ms vs fixed np16 ~7.0 at equal-ish
recall, and NEITHER the candidate-width cap (256->64) NOR the parent-k cap
moved it — so the overhead is somewhere else. Probes (same-run, two
passes):
  1. fixed16_scan       masked v10 scan, width 16 (all valid) — anchor
  2. masked32/64_scan   masked v10 scan, width 32/64, ~16 valid per query
  3. model_only         boundary distances + recall_profile + plan math
  4. parent16/64        approx parent ranking at k=16 / 64
  5. oneshot-shaped sum vs measured fused oneshot

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_decomp.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu import geometry
    from quake_tpu.coordinator import aps_setup, grouped_scan, rank_parents
    from quake_tpu.geometry import beta_table

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)
    pc = cents.reshape(1, P, D)
    pid_arr = jnp.arange(P, dtype=jnp.int32).reshape(1, P)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    cents_dev = jnp.asarray(cents)
    table = beta_table(75, "l2")

    def ranked(width):
        base = np.stack([rng.choice(P, width, replace=False)
                         for _ in range(B)]).astype(np.int32)
        return jnp.asarray(base)

    pids16 = ranked(16)
    pids32 = ranked(32)
    pids64 = ranked(64)

    def masked(pids_w, nvalid):
        w = pids_w.shape[1]
        lane = np.arange(w)[None, :]
        m = np.where(lane < nvalid, np.asarray(pids_w), -1).astype(np.int32)
        return jnp.asarray(m)

    m32 = masked(pids32, 16)
    m64 = masked(pids64, 16)

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

    @jax.jit
    def scan_run(c_in, i_in, sz_in, n_in, q_in, p_in):
        s, i, _ = grouped_scan(c_in, i_in, sz_in, n_in, q_in,
                               p_in, k, "l2", 64, 64, "v10", exact=False)
        return jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])

    def scan_fn(pids_in):
        return lambda: scan_run(codes_bf, ids, sizes, norms_bf, q, pids_in)

    @jax.jit
    def model_only(q_in, p_in):
        boundary, valid, t = aps_setup(q_in, cents_dev, p_in, 75, True, table)
        c0 = cents_dev[jnp.maximum(p_in[:, 0], 0)]
        d1 = jnp.sqrt(jnp.maximum(
            jnp.sum((q_in - c0) ** 2, axis=1), 0.0))
        radius = 6.28 + 0.40 * d1
        probs = geometry.recall_profile(boundary, radius, 75, "l2", True, t,
                                        valid)
        cs = jnp.cumsum(probs, axis=1)
        hit = cs >= 0.9
        first = jnp.argmax(hit, axis=1)
        n_b = jnp.where(jnp.any(hit, axis=1), first + 2, p_in.shape[1])
        return jnp.sum(n_b)

    @jax.jit
    def parent_k_only16(q_in):
        return jnp.sum(rank_parents(pc, pid_arr, None, q_in, 16, "l2")[:, :1])

    @jax.jit
    def parent_k_only64(q_in):
        return jnp.sum(rank_parents(pc, pid_arr, None, q_in, 64, "l2")[:, :1])

    variants = [
        ("fixed16_scan", scan_fn(pids16)),
        ("masked32_scan", scan_fn(m32)),
        ("masked64_scan", scan_fn(m64)),
        ("model_only_w64", lambda: model_only(q, pids64)),
        ("parent16", lambda: parent_k_only16(q)),
        ("parent64", lambda: parent_k_only64(q)),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
