"""A/B round 32: parent-ranking backend at the PRODUCTION operating point
(nlist=256, np12, B=8192 — nlist_sweep4's round-4 winner).

kernel_ab31 (nlist=512, B=8192, synthetic slabs) reversed the round-3
verdict: the Pallas parent (ops/pallas_flat.parent_rank_pallas) beat the
XLA matmul + approx_max_k parent both standalone (1.2 vs 1.6 ms) and fused
(7.78 vs 8.37 ms, -7%). Before flipping the index default
(index._parent_kernel) this script confirms on a REAL build at nlist=256:
  (a) fused step time, same-run, two interleaved passes;
  (b) recall@10 vs the f32 oracle for BOTH parents (the Pallas kernel's
      quantized rank order can change the probed SET, not just its order);
  (c) probed-pid set overlap at np12.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_ab32.py
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

    N, D, K, B = 1_000_000, 128, 10, 8192
    nprobe = 12
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B, D, 4096, seed=7)
    qgt = queries[:1024]

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=256, metric="l2", precision="bf16",
                               niter=15, calibrate_aps=False))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "C": idx.store.C,
                      "kernel": idx._grouped_kernel()}), flush=True)

    q_dev = jnp.asarray(queries[:B])
    sp = SearchParams(k=K, nprobe=nprobe, exact_distances=False)

    def configure(parent: str):
        if parent == "approx":
            idx.__dict__.pop("_parent_kernel", None)
        else:
            idx._parent_kernel = lambda: parent

    # (b) recall and (c) probed-set overlap for both parents.
    pid_sets = {}
    for parent in ("approx", "pallas"):
        configure(parent)
        res = idx.search(qgt, sp)
        rec = compute_recall(res.ids, gt, K)
        from quake_tpu.coordinator import rank_parents
        pstate = idx.parent.store.state
        pids = rank_parents(pstate.codes, pstate.ids,
                            pstate.norms if parent == "pallas" else None,
                            jnp.asarray(qgt), nprobe, idx.metric, parent)
        pid_sets[parent] = np.sort(np.asarray(pids), axis=1)
        print(json.dumps({"cfg": parent, "recall": round(rec, 4)}),
              flush=True)
    overlap = float(np.mean(pid_sets["approx"] == pid_sets["pallas"]))
    print(json.dumps({"pid_set_overlap_sorted": round(overlap, 4)}),
          flush=True)

    def step_ms(parent):
        configure(parent)
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

    for pass_no in (1, 2):
        for parent in ("approx", "pallas"):
            ms = step_ms(parent)
            print(json.dumps({"cfg": f"fused_{parent}_p{pass_no}",
                              "ms": round(ms, 3),
                              "qps": round(B / ms * 1e3)}), flush=True)
    configure("approx")
    print("done", flush=True)


if __name__ == "__main__":
    main()
