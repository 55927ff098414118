"""Re-certify the 10M operating point under the v11 argsort-overflow default.

tenm_cliff named the np13/B=24576 cliff AND the B=32768 regression: both
were the v10 row-scatter epilogue that 10M shapes rode while the v11 uint32
sort key overflowed. With placement="argsort" now the overflow default the
grouped path reads 27.5/29.3 ms at np12/np13 (B=24576) and 33.5 ms at
B=32768/np12 — so the batch knee likely moves past 24576 and np13 is no
longer a cliff. One 10M x 128 bf16 build (nlist=4096, niter=15), recall
gated on 1024 GT queries, then two interleaved passes (pass 2 decides) over
{(24576, np12), (32768, np12), (32768, np13)}.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/tenm_recert.py
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K = 10_000_000, 128, 10
    GRID = ((24576, 12), (32768, 12), (32768, 13))
    Bmax = max(g[0] for g in GRID)
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(Bmax, D, 4096, seed=7)

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=4096, metric="l2", precision="bf16",
                               calibrate_aps=False, niter=15))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "nlist": idx.nlist(), "C": idx.store.C}), flush=True)

    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(queries[:1024]),
                          K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    for nprobe in (12, 13):
        sp = SearchParams(k=K, nprobe=nprobe, exact_distances=False)
        r = idx.search(queries[:1024], sp)
        print(json.dumps({"nprobe": nprobe,
                          "recall": round(compute_recall(r.ids, gt, K), 4)}),
              flush=True)

    qdev = {b: jnp.asarray(queries[:b]) for b in {g[0] for g in GRID}}

    def step_ms(qb, sp):
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
        for b, nprobe in GRID:
            sp = SearchParams(k=K, nprobe=nprobe, exact_distances=False)
            ms = step_ms(qdev[b], sp)
            print(json.dumps({"cfg": f"B{b}_np{nprobe}_p{pass_no}",
                              "ms": round(ms, 3),
                              "qps": round(b / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
