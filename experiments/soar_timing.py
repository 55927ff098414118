"""SOAR operating-point timing: the real fused program (parent ranking +
grouped scan + DEDUP epilogue) for a SOAR-spilled nlist=2048 store vs the
production single-assignment nlist=1024 config. soar_prototype.py showed the
spill recall curve (0.92 @ 10 probes) but its timing used qt=32, where 10
probes over 2048 partitions put only ~20 queries in each 32-slot tile —
~40% padded lanes. Sweeps qt and nprobe at the >=0.9 point.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/soar_timing.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import make_manifold
from experiments.soar_prototype import assign_top2, topk_recall_dedup

N, D, K = 1_000_000, 128, 10


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search, fused_ivf_search

    x = make_manifold(N, D, 4096, seed=1)
    ids = np.arange(N, dtype=np.int64)
    q_small = np.asarray(make_manifold(1024, D, 4096, seed=7))
    q_big = make_manifold(8192, D, 4096, seed=7)

    idx1 = QuakeIndex()
    idx1.build(x, ids, IndexBuildParams(nlist=1024, metric="l2",
                                        calibrate_aps=False))
    idx2 = QuakeIndex()
    idx2.build(x, ids, IndexBuildParams(nlist=2048, metric="l2",
                                        calibrate_aps=False))
    state = idx1.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(q_small), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    cents = np.asarray(idx2.store.state.centroids[:idx2.nlist()])
    a1, a2 = assign_top2(x, cents, 1.0)
    soar = QuakeIndex()
    soar.build(x[:2048], ids[:2048], IndexBuildParams(
        nlist=4, metric="l2", calibrate_aps=False))
    soar.store.init_from_assignments(
        np.concatenate([x, x]), np.concatenate([ids, ids]),
        cents, np.concatenate([a1, a2]).astype(np.int64))
    soar.parent = idx2.parent
    print(json.dumps({"soar_store": {"C": soar.store.C,
                                     "P": int(soar.store.P)}}), flush=True)

    def fused(idx, qv, nprobe, qt, dedup):
        st = idx.store.state
        pst = idx.parent.store.state
        return fused_ivf_search(
            st.codes, st.ids, st.sizes, st.norms, pst.codes, pst.ids, qv,
            k=K, nprobe=nprobe, metric="l2", qt=qt, group_chunk=64,
            kernel="v3p4", dedup=dedup)

    # Recall with the REAL dedup program at candidate operating points.
    for nprobe in (9, 10, 11):
        out = fused(soar, jnp.asarray(q_small), nprobe, 16, True)
        r = topk_recall_dedup(np.asarray(out[1]), gt, K)
        print(json.dumps({"name": "soar2048_dedup", "nprobe": nprobe,
                          "recall": round(r, 4)}), flush=True)
    out = fused(idx1, jnp.asarray(q_small), 16, 32, False)
    r = topk_recall_dedup(np.asarray(out[1]), gt, K)
    print(json.dumps({"name": "single1024", "nprobe": 16,
                      "recall": round(r, 4)}), flush=True)

    B = 4096
    q_dev = [jnp.asarray(q_big[i * B:(i + 1) * B]) for i in range(2)]

    def measure(name, idx, nprobe, qt, dedup):
        out = fused(idx, q_dev[0], nprobe, qt, dedup)
        _ = np.asarray(out[1]).ravel()[:1]
        t0 = time.perf_counter()
        reps = 24
        for i in range(reps):
            out = fused(idx, q_dev[i % 2], nprobe, qt, dedup)
        _ = np.asarray(out[1]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 2),
                          "qps": round(B / ms * 1e3)}), flush=True)

    variants = [
        ("single1024_np16_qt32", idx1, 16, 32, False),
        ("soar2048_np10_qt32", soar, 10, 32, True),
        ("soar2048_np10_qt16", soar, 10, 16, True),
        ("soar2048_np10_qt8", soar, 10, 8, True),
        ("soar2048_np11_qt16", soar, 11, 16, True),
    ]
    for pass_no in (1, 2):
        for v in variants:
            measure(f"{v[0]}_p{pass_no}", *v[1:])
    print("done", flush=True)


if __name__ == "__main__":
    main()
