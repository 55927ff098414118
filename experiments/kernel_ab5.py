"""A/B round 5 (same-run comparisons only — cross-run variance on the
tunneled chip reaches ~40%): ghost-group skip and the size-aware chunked v4
kernel vs the v3p4 production kernel.

Hypotheses under test:
  * ~25-33% of the worst-case group layout is a ghost tail that v3pn runs
    the full body on — pl.when skip should recover most of it.
  * capacity padding (fill ~0.64 at bench shape) makes every group scan
    C=1536 lanes where ceil(size/ct)*ct would do — chunk-groups cut DMA,
    matmul, quantize and selection proportionally.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab5.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.ops.grouped import build_chunk_groups, build_groups
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
    codes_bf = codes.astype(jnp.bfloat16)
    norms_bf = jnp.sum(codes_bf.astype(jnp.float32) ** 2, axis=2)

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
        return out, ms

    # Correctness cross-check in compiled mode (sets = same candidates).
    ref, _ = bench("v3p4", grouped_scan_pallas_v3pn,
                   codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=4)
    for name, kw in [
        ("v3p4_skip", dict(variant="v3pn", gpb=4, skip=True)),
        ("v4_ct512_g8", dict(variant="v4", ct=512, gpb=8)),
        ("v4_ct512_g4", dict(variant="v4", ct=512, gpb=4)),
        ("v4_ct256_g8", dict(variant="v4", ct=256, gpb=8)),
        ("v4_ct768_g4", dict(variant="v4", ct=768, gpb=4)),
    ]:
        variant = kw.pop("variant")
        if variant == "v3pn":
            out, _ = bench(name, grouped_scan_pallas_v3pn,
                           codes, ids, sizes, norms, q, pids, k, "l2",
                           qt=32, **kw)
        else:
            out, _ = bench(name, grouped_scan_pallas_v4,
                           codes, ids, sizes, norms, q, pids, k, "l2",
                           qt=32, **kw)
        same = np.mean([
            len(set(np.asarray(ref[1])[b]) & set(np.asarray(out[1])[b])) / k
            for b in range(0, B, 97)
        ])
        if same < 0.999:
            print(json.dumps({"name": name, "WARN_id_overlap": round(same, 4)}),
                  flush=True)

    bench("v4_ct512_g8_k1", grouped_scan_pallas_v4,
          codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, ct=512, gpb=8)
    bench("v4_ct512_g8_bf16", grouped_scan_pallas_v4,
          codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=32, ct=512,
          gpb=8)
    bench("v3p4_bf16", grouped_scan_pallas_v3pn,
          codes_bf, ids, sizes, norms_bf, q, pids, k, "l2", qt=32, gpb=4)

    # Prologue costs in isolation (jitted; sync via device->host read).
    bg = jax.jit(lambda p: build_groups(p, P, 32))
    bcg = jax.jit(lambda p, s: build_chunk_groups(p, s, P, 32, 512, C))
    bench("build_groups", lambda p: jax.tree_util.tree_leaves(bg(p)), pids)
    bench("build_chunk_groups",
          lambda p, s: jax.tree_util.tree_leaves(bcg(p, s)), pids, sizes)
    print("done", flush=True)


if __name__ == "__main__":
    main()
