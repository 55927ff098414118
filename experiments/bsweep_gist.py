"""Same-run batch sweep for the GIST-like suite config (1M x 960 bf16).

Cross-run points read 315.3k @ B=8192 -> 440.6k @ 16384 -> 545.3k @ 24576
(gist_b{8192,16384,24576}.out) — monotone, but each is a separate run
through the tunnel (documented cross-run variance up to ~40%), so the knee
needs one build and two interleaved passes over {16384, 24576, 32768}.
Pass 2 decides the run_gist default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/bsweep_gist.py
"""

import json
import time


def main():
    import jax.numpy as jnp
    import numpy as np

    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench_suite import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K = 1_000_000, 960, 10
    BS = [int(b) for b in os.environ.get(
        "BSWEEP_BS", "16384,24576,32768").split(",")]
    Bmax = max(BS)
    x = make_manifold(N, D, 1024, seed=4, zdim=24)
    queries = make_manifold(Bmax, D, 1024, seed=5, zdim=24)
    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=512, precision="bf16", niter=15,
                               calibrate_aps=False))
    print(json.dumps({"built_s": round(time.perf_counter() - t0)}),
          flush=True)
    state = idx.store.state
    q1k = jnp.asarray(queries[:1024])
    _, gt32 = flat_search(state.codes, state.ids, q1k, K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    sp = SearchParams(k=K, nprobe=8, exact_distances=False)
    r = idx.search(queries[:1024], sp)
    print(json.dumps({"nprobe": 8,
                      "recall": round(compute_recall(r.ids, gt, K), 4)}),
          flush=True)

    qdev = {b: jnp.asarray(queries[:b]) for b in BS}

    def step_ms(qb):
        last = idx._search_device_full(qb, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            last = idx._search_device_full(qb, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            last = idx._search_device_full(qb, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        return (time.perf_counter() - t0) / reps * 1e3

    for pass_no in (1, 2):
        for b in BS:
            ms = step_ms(qdev[b])
            print(json.dumps({"cfg": f"B{b}_p{pass_no}", "ms": round(ms, 3),
                              "qps": round(b / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
