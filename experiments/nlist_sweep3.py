"""Operating-point sweep, COARSER direction: does nlist=512/768 beat the
production nlist=1024 with the round-3 serving stack (v10 + dequantized
scores + bf16)?

Motivation (ab26 decomposition of the 6.75 ms fused step at nlist=1024,
B=4096, nprobe=16): grouping (1.55 ms), row scatter (1.11), pool merge
(0.40) and parent+glue (~1.3) all scale with n = B*nprobe or with group
count G; the kernel's selection rounds scale with G too. Halving nlist at
the same scan FRACTION (nprobe 16 -> 8) halves n and G while C doubles —
DMA/fold/matmul stay flat, everything else halves. The finer direction
(nlist=2048, nlist_sweep2) lost badly; this is the mirror test.

Risk: recall at equal scan fraction may drop with coarser cells; the gate
(min nprobe with recall@10 >= 0.905 on 1024 queries vs the f32 oracle)
decides honestly. Also measures B=8192 for the 512/1024 configs: fixed
per-batch costs are now a larger share, so the round-2 "B=8192 is exactly
2x" finding may have flipped.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/nlist_sweep3.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.ops.scan import flat_scan
    from quake_tpu.utils import compute_recall

    N, D, K, B = 1_000_000, 128, 10, 4096
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B * 4, D, 4096, seed=7)
    qgt = queries[:1024]

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    def build(name, **kw):
        t0 = time.perf_counter()
        idx = QuakeIndex()
        idx.build(x, np.arange(N, dtype=np.int64),
                  IndexBuildParams(metric="l2", precision="bf16", niter=15,
                                   calibrate_aps=False, **kw))
        print(json.dumps({"built": name, "s": round(time.perf_counter() - t0),
                          "C": idx.store.C,
                          "mem_mb": int(np.asarray(idx.store.state.codes).nbytes
                                        ) // 2**20}), flush=True)
        return idx

    idxs = {
        "flat_512": build("flat_512", nlist=512),
        "flat_768": build("flat_768", nlist=768),
        "flat_1024": build("flat_1024", nlist=1024),
    }

    chosen = {}
    for name, idx in idxs.items():
        grid = {"flat_512": (8, 9, 10, 11, 12, 14),
                "flat_768": (11, 12, 13, 14, 16),
                "flat_1024": (16, 18, 20)}[name]
        for npb in grid:
            r = idx.search(qgt, SearchParams(k=K, nprobe=npb,
                                             exact_distances=False))
            rec = compute_recall(r.ids, gt, K)
            print(json.dumps({"cfg": name, "nprobe": npb,
                              "recall": round(rec, 4)}), flush=True)
            if rec >= 0.905:
                chosen[name] = (npb, rec)
                break
        else:
            chosen[name] = (grid[-1], rec)

    q4 = jnp.asarray(queries[:B])
    q8 = jnp.asarray(queries[:2 * B])

    def step_ms(idx, sp, q_dev):
        last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1]).ravel()[:1]
        return (time.perf_counter() - t0) / reps * 1e3

    cases = []
    for name in idxs:
        cases.append((name, q4, B))
    for name in ("flat_512", "flat_1024"):
        cases.append((name + "_B8192", q8, 2 * B))

    for pass_no in (1, 2):
        for label, q_dev, nb in cases:
            name = label.replace("_B8192", "")
            idx = idxs[name]
            npb, rec = chosen[name]
            sp = SearchParams(k=K, nprobe=npb, exact_distances=False)
            ms = step_ms(idx, sp, q_dev)
            print(json.dumps({"cfg": f"{label}_p{pass_no}", "nprobe": npb,
                              "recall": round(rec, 4), "ms": round(ms, 3),
                              "qps": round(nb / ms * 1e3)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
