"""SOAR niche search (VERDICT r4 #7): find an operating point where spilled
assignment WINS at equal recall, or demote it to a documented niche.

Round-4 verdict at the production point (nlist=256, target 0.90): spill
lost (np8 9.7-10.1 ms vs flat np11 7.2 ms, r4_runs/soar256_ab.out). SOAR's
value proposition (ScaNN, NeurIPS'23) is recall-per-probe at HIGH recall,
where the flat recall-vs-nprobe curve goes flat: each probe adds fewer new
true neighbors, while the spilled second assignment catches exactly the
boundary vectors the curve's tail is made of.

Same-run A/B, two interleaved passes. Arms sized for EQUAL partition size
(spill doubles resident copies, so it gets 2x nlist): flat nlist=F vs
spill nlist=2F. Each arm sweeps nprobe until it crosses each recall gate;
QPS timed at the gate points. --metric ip covers the MIPS regime SOAR was
designed for.

Run: python experiments/soar_niche_ab.py [--metric l2] [--targets 0.95,0.98]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nlist", type=int, default=512)
    ap.add_argument("--metric", default="l2")
    ap.add_argument("--targets", default="0.95,0.98")
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args()
    targets = [float(t) for t in args.targets.split(",")]

    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_manifold
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.ops.scan import flat_scan
    from quake_tpu.utils import compute_recall

    N, D, K, B = args.n, 128, 10, args.batch
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B, D, 4096, seed=7)
    if args.metric == "ip":
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    qgt = queries[:1024]

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, args.metric)
    gt = np.asarray(gt32).astype(np.int64)

    arms = {}
    for name, nlist, spill in (("flat", args.nlist, False),
                               ("spill", 2 * args.nlist, True)):
        t0 = time.perf_counter()
        idx = QuakeIndex()
        idx.build(x, np.arange(N, dtype=np.int64),
                  IndexBuildParams(nlist=nlist, metric=args.metric,
                                   precision="bf16", niter=15, spill=spill,
                                   calibrate_aps=False))
        arms[name] = idx
        print(json.dumps({"arm": name, "nlist": idx.nlist(),
                          "C": idx.store.C,
                          "built_s": round(time.perf_counter() - t0)}),
              flush=True)

    # Recall curves: smallest nprobe crossing each gate, per arm.
    # Spill scans two copies per probe at HALF the partition size (2x
    # nlist), so equal-nprobe means roughly equal scanned vectors.
    grid = (8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 64, 96, 128)
    gate_np = {}
    for name, idx in arms.items():
        curve = {}
        for nprobe in grid:
            res = idx.search(qgt, SearchParams(k=K, nprobe=nprobe,
                                               exact_distances=False))
            r = compute_recall(res.ids, gt, K)
            curve[nprobe] = r
            print(json.dumps({"arm": name, "nprobe": nprobe,
                              "recall": round(r, 4)}), flush=True)
            if r >= max(targets):
                break
        for t in targets:
            hit = [np_ for np_, r in curve.items() if r >= t]
            gate_np[(name, t)] = (min(hit) if hit else None,
                                  curve[min(hit)] if hit else max(curve.values()))

    q_dev = jnp.asarray(queries)

    def timed(idx, sp):
        last = idx._search_device_full(q_dev, sp)
        _ = np.asarray(last[1][:1])
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < 1.2:
            last = idx._search_device_full(q_dev, sp)
            reps += 1
        _ = np.asarray(last[1][:1])
        return (time.perf_counter() - t0) / reps * 1e3

    for pass_no in (1, 2):
        for t in targets:
            row = {"pass": pass_no, "target": t}
            for name, idx in arms.items():
                np_, r = gate_np[(name, t)]
                if np_ is None:
                    row[name] = {"nprobe": None, "recall": round(r, 4)}
                    continue
                ms = timed(idx, SearchParams(k=K, nprobe=np_,
                                             exact_distances=False))
                row[name] = {"nprobe": np_, "recall": round(r, 4),
                             "ms": round(ms, 3),
                             "qps": round(B / ms * 1e3)}
            print(json.dumps(row), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
