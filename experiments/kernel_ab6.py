"""A/B round 6: isolate WHY chunked v4 measured 2.7x slower than
v3p4+skip in round 5 despite scanning ~33% fewer lanes.

Probes (all same-run):
  * v4 at ct=C (no chunking) — if still slow, the v4 structure
    (scalar-indexed qg specs / bigger layout) is at fault, not chunking.
  * v4 with materialized per-chunk-group query tiles (one grid-indexed
    spec) — tests the scalar-indexed-spec hypothesis.
  * k=1 floors for each to split selection from DMA/matmul/steps.
  * v3pn+skip at qt=64 (halves group count and slab re-reads).
  * the packed single-key build_groups sort (was 3.7ms of every call).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab6.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu.ops.grouped import build_groups
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
        return out, ms

    ref, _ = bench("v3p4_skip", grouped_scan_pallas_v3pn,
                   codes, ids, sizes, norms, q, pids, k, "l2",
                   qt=32, gpb=4, skip=True)
    bench("v3p4_skip_k1", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, 1, "l2", qt=32, gpb=4, skip=True)
    bench("v3p4_skip_qt64", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=4, skip=True)
    bench("v3p8_skip", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=32, gpb=8, skip=True)

    for name, kw in [
        ("v4_ct1536_g4", dict(ct=1536, gpb=4)),
        ("v4_ct1536_g4_k1", dict(ct=1536, gpb=4, k=1)),
        ("v4_ct512_g8_matqg", dict(ct=512, gpb=8, mat_qg=True)),
        ("v4_ct512_g8_matqg_k1", dict(ct=512, gpb=8, mat_qg=True, k=1)),
        ("v4_ct768_g8_matqg", dict(ct=768, gpb=8, mat_qg=True)),
    ]:
        kk = kw.pop("k", k)
        out, _ = bench(name, grouped_scan_pallas_v4,
                       codes, ids, sizes, norms, q, pids, kk, "l2",
                       qt=32, **kw)
        if kk == k:
            same = np.mean([
                len(set(np.asarray(ref[1])[b]) & set(np.asarray(out[1])[b])) / k
                for b in range(0, B, 97)
            ])
            if same < 0.999:
                print(json.dumps({"name": name,
                                  "WARN_id_overlap": round(same, 4)}),
                      flush=True)

    bg = jax.jit(lambda p: build_groups(p, P, 32))
    bench("build_groups_packedsort",
          lambda p: jax.tree_util.tree_leaves(bg(p)), pids)
    print("done", flush=True)


if __name__ == "__main__":
    main()
