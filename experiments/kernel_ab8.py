"""A/B round 8 — order-controlled: ab7 exposed a large first-slot penalty
(anchor 21.9ms at slot 1, 12.3ms repeated at the end of the same run), so
every variant here runs in TWO interleaved passes and the second pass is the
verdict. Also probes:
  * the v4 chunked slowdown hypothesis: the epilogue stage-1 lax.top_k over
    [B, nprobe, maxch*kk] (a full sort) — timed in isolation;
  * matrix vs sort build_groups (the sort was 3.3ms of every kernel call).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab8.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from quake_tpu.ops.grouped import _build_groups_matrix, _build_groups_sort
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v3pn,
        grouped_scan_pallas_v4,
    )

    D, k, B = 128, 10, 4096
    P, C = 1024, 1536
    rng = np.random.default_rng(1)
    codes, ids, sizes, norms, cents = make_setup(P, C, D)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(rng.integers(0, P, (B, 16)).astype(np.int32))

    def bench(name, fn, *args, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 2),
                          "qps": round(B / ms * 1e3)}), flush=True)
        return ms

    # Epilogue stage-1 probe: top_k over [B, nprobe, maxch*kk] (v4 shape).
    maxch = 3
    dummy_s = jnp.asarray(
        rng.standard_normal((B, 16, maxch * k)).astype(np.float32))
    dummy_r = jnp.asarray(
        rng.integers(0, 1 << 24, (B, 16, maxch * k)).astype(np.int32))

    @jax.jit
    def stage1(s, r):
        sv, idx = lax.top_k(s, k)
        return sv, jnp.take_along_axis(r, idx, axis=2)

    @jax.jit
    def stage2_160(s, r):
        sv, idx = lax.top_k(s.reshape(B, -1)[:, :160], k)
        return sv, idx

    bgm = jax.jit(lambda p: _build_groups_matrix(p, P, 32))
    bgs = jax.jit(lambda p: _build_groups_sort(p, P, 32))

    variants = [
        ("v3p4_noskip", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)),
        ("v3p4_skip", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4,
            skip=True)),
        ("v3p8_skip_qt64", lambda: grouped_scan_pallas_v3pn(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=8,
            skip=True)),
        ("v4_ct768_g8_qt64", lambda: grouped_scan_pallas_v4(
            codes, ids, sizes, norms, q, pids, k, "l2", qt=64, ct=768,
            gpb=8)),
        ("epi_stage1_topk30", lambda: stage1(dummy_s, dummy_r)),
        ("epi_stage2_topk160", lambda: stage2_160(
            dummy_s.reshape(B, -1), dummy_r.reshape(B, -1))),
        ("build_groups_matrix", lambda: jax.tree_util.tree_leaves(bgm(pids))),
        ("build_groups_sort", lambda: jax.tree_util.tree_leaves(bgs(pids))),
    ]
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
