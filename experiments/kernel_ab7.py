"""A/B round 7: chunked v4 after the norms-BlockSpec alignment fix
(a (1,1,ct) window over [P,1,C] violated Mosaic's (8,128)-divisibility when
ct < C and lowered to a slow copy — ab5/ab6 measured ~10ms per chunk level),
combined with the qt=64 and gpb=8 wins from ab6. The anchor repeats at the
end to expose in-run drift.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab7.py
"""

import json
import time

import numpy as np

from experiments.kernel_ab2 import make_setup


def main():
    import jax
    import jax.numpy as jnp

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

    ref, _ = bench("v3p8_skip_qt64", grouped_scan_pallas_v3pn,
                   codes, ids, sizes, norms, q, pids, k, "l2",
                   qt=64, gpb=8, skip=True)

    def check(name, out):
        same = np.mean([
            len(set(np.asarray(ref[1])[b]) & set(np.asarray(out[1])[b])) / k
            for b in range(0, B, 97)
        ])
        if same < 0.999:
            print(json.dumps({"name": name, "WARN_id_overlap": round(same, 4)}),
                  flush=True)

    for name, kw in [
        ("v4_ct512_g8_qt32", dict(ct=512, gpb=8, qt=32)),
        ("v4_ct512_g8_qt64", dict(ct=512, gpb=8, qt=64)),
        ("v4_ct768_g8_qt64", dict(ct=768, gpb=8, qt=64)),
        ("v4_ct512_g16_qt64", dict(ct=512, gpb=16, qt=64)),
    ]:
        out, _ = bench(name, grouped_scan_pallas_v4,
                       codes, ids, sizes, norms, q, pids, k, "l2", **kw)
        check(name, out)

    bench("v4_ct512_g8_qt64_k1", grouped_scan_pallas_v4,
          codes, ids, sizes, norms, q, pids, 1, "l2", ct=512, gpb=8, qt=64)
    out, _ = bench("v4_ct512_g8_qt64_bf16", grouped_scan_pallas_v4,
                   codes_bf, ids, sizes, norms_bf, q, pids, k, "l2",
                   ct=512, gpb=8, qt=64)
    bench("v3p8_skip_qt64_again", grouped_scan_pallas_v3pn,
          codes, ids, sizes, norms, q, pids, k, "l2", qt=64, gpb=8, skip=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
