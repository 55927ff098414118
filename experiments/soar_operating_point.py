"""SOAR spill as an equal-memory operating point (round-3 VERDICT #10).

SOAR doubles residency (each vector lives in two partitions); bf16 codes
halve bytes — so spill+bf16 matches the flat-f32 production config's memory
exactly. Question: at >=0.905 recall@10, does the spilled index's lower
nprobe beat the production config's QPS?

Protocol: both indexes built on the bench corpus; same-run interleaved QPS
(two passes, trust pass 2); recall from the flat oracle on 1024 queries.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/soar_operating_point.py
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
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K, B = 1_000_000, 128, 10, 4096
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B * 2, D, 4096, seed=7)
    qd = jnp.asarray(queries[:1024])

    t0 = time.perf_counter()
    prod = QuakeIndex()
    prod.build(x, np.arange(N, dtype=np.int64),
               IndexBuildParams(nlist=1024, metric="l2", calibrate_aps=False))
    print(json.dumps({"built": "prod_f32", "s": round(time.perf_counter() - t0)}),
          flush=True)

    t0 = time.perf_counter()
    soar = QuakeIndex()
    soar.build(x, np.arange(N, dtype=np.int64),
               IndexBuildParams(nlist=2048, metric="l2", spill=True,
                                precision="bf16", calibrate_aps=False))
    print(json.dumps({"built": "soar_bf16", "s": round(time.perf_counter() - t0)}),
          flush=True)

    st = prod.store.state
    _, gt32 = flat_search(st.codes, st.ids, qd, K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    mem_prod = int(np.asarray(st.codes).nbytes)
    mem_soar = int(np.asarray(soar.store.state.codes).nbytes)
    print(json.dumps({"mem_prod_mb": mem_prod // 2**20,
                      "mem_soar_mb": mem_soar // 2**20}), flush=True)

    # Recall sweep: production at nprobe 16 (the bench operating point);
    # SOAR at the smallest nprobe reaching >= that recall.
    r = prod.search(queries[:1024], SearchParams(k=K, nprobe=16))
    rec_prod = compute_recall(np.asarray(r.ids), gt, K)
    soar_probe, rec_soar = None, 0.0
    for npb in (6, 7, 8, 9, 10, 12, 14, 16):
        r = soar.search(queries[:1024], SearchParams(k=K, nprobe=npb))
        rec = compute_recall(np.asarray(r.ids), gt, K)
        print(json.dumps({"soar_nprobe": npb, "recall": round(rec, 4)}),
              flush=True)
        if rec >= rec_prod:
            soar_probe, rec_soar = npb, rec
            break
    if soar_probe is None:
        soar_probe, rec_soar = 16, rec

    def qps(idx, sp):
        q_dev = [jnp.asarray(queries[i * B:(i + 1) * B]) for i in range(2)]
        last = idx._search_device_full(q_dev[0], sp)
        _ = np.asarray(last[1][:1])
        t0 = time.perf_counter()
        _ = np.asarray(idx._search_device_full(q_dev[0], sp)[1][:1])
        est = max(time.perf_counter() - t0, 1e-4)
        reps = max(int(1.2 / (est * 2)), 1)
        t0 = time.perf_counter()
        for _ in range(reps):
            for q in q_dev:
                last = idx._search_device_full(q, sp)
        _ = np.asarray(last[1][:1])
        return reps * 2 * B / (time.perf_counter() - t0)

    sp_prod = SearchParams(k=K, nprobe=16)
    sp_soar = SearchParams(k=K, nprobe=soar_probe)
    for pass_no in (1, 2):
        qp = qps(prod, sp_prod)
        qs = qps(soar, sp_soar)
        print(json.dumps({
            "pass": pass_no,
            "prod_qps": round(qp), "prod_recall": round(rec_prod, 4),
            "soar_qps": round(qs), "soar_recall": round(rec_soar, 4),
            "soar_nprobe": soar_probe,
            "soar_vs_prod": round(qs / qp, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
