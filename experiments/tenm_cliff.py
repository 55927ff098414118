"""Decompose the np12 -> np13 cost cliff at B=24576 on the 10M-shaped store.

tenm_np_ab measured np13 1.8x SLOWER than np12 at B=24576 (65.0 vs 35.8 ms,
both passes) — adjacent nprobe, only +8% pairs. No static shape in the path
flips between the two (qt=64 both, v11->v10 sort-key fallback both, merge
poolp 128 vs 256 is a small band), so this probe times the components on a
SYNTHETIC store with the production shapes (P=4096, C=3712, D=128, bf16,
fill 2440/3712) — timing depends on shapes, not on trained contents, and
skipping the 10M build turns a 30-min job into ~10.

Variants (two interleaved passes, pass 2 decides; in-jit output reduction):
  fused_np{12,13,16}_k10, fused_np13_k9  — full fused_ivf_search
  parent_pallas_np{12,13}, parent_approx_np{12,13} — rank_parents alone
  grouped_np{12,13}_k10, grouped_np13_k9 — grouped_scan alone (v11g4 entry;
    at this shape the dispatch rides the v10 scatter: uint32 key overflow)
  grouped_arg_np{12,13} — v11 placement="argsort" (no bit budget; candidate
    replacement for the v10 fallback at 10M shapes), + B=32768 arms of both
  groups_np{12,13} — build_groups_scatter alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/tenm_cliff.py
"""

import functools
import json
import time


def main():
    import jax
    import jax.numpy as jnp

    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from quake_tpu import coordinator
    from quake_tpu.ops.grouped import build_groups_scatter

    P, C, D, B = 4096, 3712, 128, 24576
    FILL = 2440
    key = jax.random.PRNGKey(0)
    k_codes, k_q, k_n, k_p = jax.random.split(key, 4)

    codes = jax.random.normal(k_codes, (P, C, D), dtype=jnp.bfloat16)
    ids = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :], (P, C)
    ) + jnp.arange(P, dtype=jnp.int32)[:, None] * C
    valid = jnp.arange(C, dtype=jnp.int32)[None, :] < FILL
    ids = jnp.where(valid, ids, -1)
    sizes = jnp.full((P,), FILL, jnp.int32)
    # Plausible positive squared norms (timing only; contents untrained).
    norms = 128.0 + 16.0 * jax.random.normal(k_n, (P, C), dtype=jnp.float32)
    q = jax.random.normal(k_q, (B, D), dtype=jnp.float32)

    pcodes = jax.random.normal(k_codes, (1, P, D), dtype=jnp.bfloat16)
    pids_flat = jnp.arange(P, dtype=jnp.int32)[None, :]
    pnorms = 128.0 + 16.0 * jax.random.normal(k_n, (1, P), dtype=jnp.float32)

    # Distinct partitions per row: stride 257 is odd => i*257 distinct mod 4096.
    base = jax.random.randint(k_p, (B, 1), 0, P, dtype=jnp.int32)
    def probe_lists(np_):
        return (base + jnp.arange(np_, dtype=jnp.int32)[None, :] * 257) % P
    probe = {np_: jax.device_put(probe_lists(np_)) for np_ in (12, 13, 16)}

    QT, GC = 64, 70  # _grouped_params at B=24576, nlist~4096, C=3712

    # Pass the 4GB store as jit ARGUMENTS: closing over it captures it as
    # lowering constants (4GB MLIR) and the remote compile never returns.
    @functools.partial(jax.jit, static_argnames=("np_", "k"))
    def fused(codes, ids, sizes, norms, pcodes, pnorms, q, np_, k):
        out = coordinator.fused_ivf_search(
            codes, ids, sizes, norms, pcodes, pids_flat, q,
            k=k, nprobe=np_, metric="l2", qt=QT, group_chunk=GC,
            kernel="v11g4", dedup=False, parent_norms=pnorms,
            parent_kernel="pallas", exact=False)
        return out[0][:1, :1], out[1][:1, :1]

    @functools.partial(jax.jit, static_argnames=("np_", "pk"))
    def parent(pcodes, pnorms, q, np_, pk):
        pids = coordinator.rank_parents(pcodes, pids_flat, pnorms, q, np_,
                                        "l2", pk)
        return jnp.sum(pids)[None]

    @functools.partial(jax.jit, static_argnames=("k",))
    def grouped(codes, ids, sizes, norms, q, pr, k):
        out = coordinator.grouped_scan(
            codes, ids, sizes, norms, q, pr, k, "l2", QT, GC,
            "v11g4", dedup=False, exact=False, dense=True)
        return out[0][:1, :1], out[1][:1, :1]

    @jax.jit
    def groups(pr):
        gp, ql, tgt = build_groups_scatter(pr, P, QT)
        return jnp.sum(gp)[None] + jnp.sum(tgt[:1, :1])[None]

    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v11

    @functools.partial(jax.jit, static_argnames=("k",))
    def grouped_arg(codes, ids, sizes, norms, q, pr, k):
        out = grouped_scan_pallas_v11(
            codes, ids, sizes, norms, q, pr, k, "l2", qt=QT, gpb=4,
            dedup=False, exact=False, placement="argsort")
        return out[0][:1, :1], out[1][:1, :1]

    B32 = 32768
    k_q32, k_p32 = jax.random.split(jax.random.PRNGKey(9))
    q32 = jax.random.normal(k_q32, (B32, D), dtype=jnp.float32)
    base32 = jax.random.randint(k_p32, (B32, 1), 0, P, dtype=jnp.int32)
    probe32 = jax.device_put(
        (base32 + jnp.arange(12, dtype=jnp.int32)[None, :] * 257) % P)

    variants = [
        ("fused_np12_k10",
         lambda: fused(codes, ids, sizes, norms, pcodes, pnorms, q, 12, 10)),
        ("fused_np13_k10",
         lambda: fused(codes, ids, sizes, norms, pcodes, pnorms, q, 13, 10)),
        ("fused_np13_k9",
         lambda: fused(codes, ids, sizes, norms, pcodes, pnorms, q, 13, 9)),
        ("fused_np16_k10",
         lambda: fused(codes, ids, sizes, norms, pcodes, pnorms, q, 16, 10)),
        ("parent_pallas_np12", lambda: parent(pcodes, pnorms, q, 12, "pallas")),
        ("parent_pallas_np13", lambda: parent(pcodes, pnorms, q, 13, "pallas")),
        ("parent_approx_np12", lambda: parent(pcodes, pnorms, q, 12, "approx")),
        ("parent_approx_np13", lambda: parent(pcodes, pnorms, q, 13, "approx")),
        ("grouped_np12_k10",
         lambda: grouped(codes, ids, sizes, norms, q, probe[12], 10)),
        ("grouped_np13_k10",
         lambda: grouped(codes, ids, sizes, norms, q, probe[13], 10)),
        ("grouped_np13_k9",
         lambda: grouped(codes, ids, sizes, norms, q, probe[13], 9)),
        ("grouped_arg_np12",
         lambda: grouped_arg(codes, ids, sizes, norms, q, probe[12], 10)),
        ("grouped_arg_np13",
         lambda: grouped_arg(codes, ids, sizes, norms, q, probe[13], 10)),
        ("grouped32_v10_np12",
         lambda: grouped(codes, ids, sizes, norms, q32, probe32, 10)),
        ("grouped32_arg_np12",
         lambda: grouped_arg(codes, ids, sizes, norms, q32, probe32, 10)),
        ("groups_np12", lambda: groups(probe[12])),
        ("groups_np13", lambda: groups(probe[13])),
    ]

    import numpy as onp

    def step_ms(fn):
        last = fn()
        _ = onp.asarray(last[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            last = fn()
        _ = onp.asarray(last[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            last = fn()
        _ = onp.asarray(last[0]).ravel()[:1]
        return (time.perf_counter() - t0) / reps * 1e3

    for pass_no in (1, 2):
        for name, fn in variants:
            ms = step_ms(fn)
            print(json.dumps({"cfg": f"{name}_p{pass_no}",
                              "ms": round(ms, 3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
