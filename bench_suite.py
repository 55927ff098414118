"""Multi-config benchmark suite (BASELINE.json configs):
  quickstart   10k x 128, nlist=1024, L2, k=10, nprobe=10
  sift1m-like  1M x 128 L2, fixed-nprobe sweep (same as bench.py)
  deep-like    1M x 96 inner-product, unit-norm, APS at 0.9 recall target
  gist-like    200k x 960 high-dim L2
  streaming    workload replay with maintenance (insert/delete/query mix)

Prints one JSON line per config. bench.py remains the single-line headline
benchmark; this suite is for the full BASELINE.json coverage.

Usage: python bench_suite.py [--configs quickstart,deep,gist,streaming]
"""

import argparse
import json
import os
import time

import numpy as np

from bench import make_manifold


def _qps(idx, queries, sp, batch, n_batches):
    import jax
    import jax.numpy as jnp

    q_dev = [jnp.asarray(queries[i * batch : (i + 1) * batch]) for i in range(n_batches)]
    jax.block_until_ready(idx._search_device_full(q_dev[0], sp)[1])
    _ = np.asarray(idx._search_device_full(q_dev[0], sp)[1])
    # >=1s amortized window: short windows measure dispatch spikes through
    # the tunnel, not the engine (see CLAUDE.md timing methodology).
    t0 = time.perf_counter()
    _ = np.asarray(idx._search_device_full(q_dev[0], sp)[1])
    est = max(time.perf_counter() - t0, 1e-4)
    reps = max(int(1.0 / (est * n_batches)), 1)
    t0 = time.perf_counter()
    last = None
    for _ in range(reps):
        for q in q_dev:
            last = idx._search_device_full(q, sp)
    _ = np.asarray(last[1])
    return reps * n_batches * batch / (time.perf_counter() - t0)


def run_quickstart():
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((10_000, 128)).astype(np.float32)
    q = rng.standard_normal((1000, 128)).astype(np.float32)
    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(10_000, dtype=np.int64), IndexBuildParams(nlist=1024))
    build_s = time.perf_counter() - t0
    sp = SearchParams(k=10, nprobe=10)
    res = idx.search(q, sp)
    gt, _ = knn(q, x, 10)
    recall = compute_recall(res.ids, gt, 10)
    qps = _qps(idx, np.tile(q, (2, 1)), sp, 1000, 2)
    return {"metric": f"quickstart 10k x128 nlist=1024 nprobe=10 recall={recall:.3f} build_s={build_s:.1f}",
            "value": round(qps, 1), "unit": "qps"}


def run_deep():
    """DEEP-like at stated scale (BASELINE.json: DEEP10M 96-d inner-product
    with adaptive search at 90% recall target): 10M x 96 unit-norm IP, bf16
    store, APS auto mode (recall_target=0.9) at production batch — a QPS @
    0.9-target headline, with a fixed-nprobe equal-recall anchor from the
    same run. Round 5 supersedes the 1M-scale adherence-only number
    (VERDICT r4 missing #2)."""
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    # B=24576 default since round 5: deep_b24576 measured 518.4k QPS @ 0.904
    # vs 428.3k at B=16384 (+21%) — the per-batch bands keep amortizing at
    # 10M on the 96-d IP corpus too. QUAKE_SUITE_B overrides for A/Bs.
    N, D, K = 10_000_000, 96, 10
    B = int(os.environ.get("QUAKE_SUITE_B", 24576))
    x = make_manifold(N, D, 4096, seed=2)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    queries = make_manifold(B, D, 4096, seed=3)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q = queries[:1024]
    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=2048, metric="ip", precision="bf16",
                               niter=15, calibrate_aps=True))
    build_s = time.perf_counter() - t0
    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(q), K, "ip")
    gt = np.asarray(gt32).astype(np.int64)

    sp = SearchParams(k=K, recall_target=0.9, exact_distances=False)
    res = idx.search(q, sp)  # warm + adherence check on the GT sample
    recall = compute_recall(res.ids, gt, K)
    scanned = res.timing_info.partitions_scanned
    qps = _qps(idx, queries, sp, B, 1)

    # Fixed-nprobe equal-recall anchor (same run, same GT).
    anchor_np, anchor_recall = idx.nlist(), 0.0
    for nprobe in (8, 12, 16, 24, 32, 48):
        r = idx.search(q, SearchParams(k=K, nprobe=nprobe,
                                       exact_distances=False))
        anchor_recall = compute_recall(r.ids, gt, K)
        if anchor_recall >= 0.9:
            anchor_np = nprobe
            break
    anchor_qps = _qps(idx, queries,
                      SearchParams(k=K, nprobe=anchor_np,
                                   exact_distances=False), B, 1)
    return {"metric": (
        f"deep-like 10M x96 ip bf16 APS-auto@0.9 achieved={recall:.3f} "
        f"scanned={scanned} build_s={build_s:.0f} | fixed np={anchor_np} "
        f"recall={anchor_recall:.3f} qps={anchor_qps:.0f}"),
        "value": round(qps, 1), "unit": "qps"}


def run_gist():
    """GIST-like at stated scale (BASELINE.json: GIST1M 960-d): 1M x 960 L2
    in bf16 (~2.5GB slab — fits one chip; VERDICT r4 missing #2 flagged the
    200k stand-in). Fixed-nprobe sweep to the 0.9 gate; B=16384 default
    since round 5 (gist_b16384: 440.6k @ 0.943 vs 315.3k at 8192 vs 188.9k
    at 4096 — the batch bands amortize on the 960-d matmul too)."""
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K = 1_000_000, 960, 10
    B = int(os.environ.get("QUAKE_SUITE_B", 16384))
    x = make_manifold(N, D, 1024, seed=4, zdim=24)
    queries = make_manifold(2 * B, D, 1024, seed=5, zdim=24)
    q = queries[:1024]
    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=512, precision="bf16", niter=15,
                               calibrate_aps=False))
    build_s = time.perf_counter() - t0
    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(q), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    chosen, recall = 128, 0.0
    for nprobe in (8, 12, 16, 24, 32, 48, 64, 128):
        res = idx.search(q, SearchParams(k=K, nprobe=nprobe,
                                         exact_distances=False))
        recall = compute_recall(res.ids, gt, K)
        if recall >= 0.9:
            chosen = nprobe
            break
    qps = _qps(idx, queries,
               SearchParams(k=K, nprobe=chosen, exact_distances=False), B, 2)
    return {"metric": (f"gist-like 1M x960 bf16 nprobe={chosen} "
                       f"recall={recall:.3f} build_s={build_s:.0f}"),
            "value": round(qps, 1), "unit": "qps"}


def run_streaming():
    """Streaming at stated scale (round 5; VERDICT r4 missing #2 flagged the
    100k stand-in): 1M resident vectors, 10 replay steps of (10k add / 10k
    remove / 1k query / maintenance), maintenance timed separately — a
    maintenance-on replay at the headline corpus size. Ends with a
    full-probe recall check on the mutated resident set."""
    from quake_tpu import IndexBuildParams, MaintenancePolicyParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    N, STEP = 1_000_000, 10_000
    x = make_manifold(N + 10 * STEP, 128, 4096, seed=6)
    ids = np.arange(len(x), dtype=np.int64)
    idx = QuakeIndex()
    t0 = time.perf_counter()
    idx.build(x[:N], ids[:N],
              IndexBuildParams(nlist=1024, niter=15, calibrate_aps=False))
    build_s = time.perf_counter() - t0
    idx.initialize_maintenance_policy(
        MaintenancePolicyParams(window_size=1000)
    )
    sp = SearchParams(k=10, nprobe=32)
    next_add = N
    t0 = time.perf_counter()
    n_ops = 0
    maint_s = 0.0
    for step in range(10):
        idx.add(x[next_add : next_add + STEP], ids[next_add : next_add + STEP])
        rm = ids[step * STEP : (step + 1) * STEP]
        idx.remove(rm)
        q = make_manifold(1000, 128, 4096, seed=100 + step)
        idx.search(q, sp)
        tm = time.perf_counter()
        idx.maintenance()
        maint_s += time.perf_counter() - tm
        next_add += STEP
        n_ops += 3
    elapsed = time.perf_counter() - t0
    q = make_manifold(256, 128, 4096, seed=999)
    res = idx.search(q, SearchParams(k=10, nprobe=idx.nlist()))
    rid = np.sort(idx.get_ids())
    gt, _ = knn(q, x[rid], 10, ids=rid)
    recall = compute_recall(res.ids, gt, 10)
    return {"metric": (
        f"streaming 1M+10x(10k add/10k rm/1k q/maint) full-probe "
        f"recall={recall:.3f} nlist={idx.nlist()} build_s={build_s:.0f} "
        f"maint_s_total={maint_s:.1f}"),
        "value": round(n_ops / elapsed, 2), "unit": "ops_per_s"}


def run_aps_batch():
    """Recall-target (APS) search at production batch vs fixed-nprobe at
    equal recall (VERDICT r1 #2: APS must be first-class in the batched path
    too — reference query_coordinator.cpp:675-799 with the termination loop
    at :383-430). Reports the QPS ratio."""
    import jax
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, NLIST, K, B = 1_000_000, 128, 1024, 10, 4096
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B * 4, D, 4096, seed=7)
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64), IndexBuildParams(nlist=NLIST))
    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(queries[:1024]), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    # Fixed-nprobe at >=0.9 recall.
    nprobe, fixed_recall = 16, 0.0
    for np_ in (16, 32, 64):
        r = idx.search(queries[:1024], SearchParams(k=K, nprobe=np_))
        fixed_recall = compute_recall(r.ids, gt, K)
        if fixed_recall >= 0.9:
            nprobe = np_
            break
    sp_fixed = SearchParams(k=K, nprobe=nprobe)
    qps_fixed = _qps(idx, queries, sp_fixed, B, 4)

    sp_aps = SearchParams(k=K, recall_target=0.9)
    r = idx.search(queries[:1024], sp_aps)
    aps_recall = compute_recall(r.ids, gt, K)
    scanned = r.timing_info.partitions_scanned
    qps_aps = _qps(idx, queries, sp_aps, B, 4)

    return {
        "metric": (
            f"APS@B=4096 target=0.9: recall={aps_recall:.3f} scanned~{scanned} "
            f"qps={qps_aps:.0f} vs fixed nprobe={nprobe} recall={fixed_recall:.3f} "
            f"qps={qps_fixed:.0f}"
        ),
        "value": round(qps_fixed / max(qps_aps, 1.0), 3),
        "unit": "fixed_over_aps_qps_ratio",
    }


def run_10m():
    """Production-scale single-chip demo: 10M x 128 in bf16 (~5GB of codes
    in HBM) — the capacity story for serving deployments. Build uses the
    Faiss-style training subsample; search at >=0.9 recall@10."""
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    # nlist=4096 since round 5 (sweep_10m_r5): at 10M the 1M coarsening
    # trend INVERTS — nlist=1024 needs np48 for 0.9 (C=14720 slabs drown
    # the merge) while 4096/np12 lands 0.9003 at 496k QPS vs 2050/np20
    # 353.4k (r4). nlist=8192 never crossed 0.9 by np14.
    # Serving stack: bf16 + dequantized scores; B=32768 since the v11
    # argsort-overflow default landed (tenm_recert pass-2: 737.1k @ 32768/
    # np12 vs 709.1k @ 24576 — the old "32768 regresses to 452.6k" knee was
    # the v10 row-scatter epilogue's cliff, not the batch's; tenm_cliff).
    N, D, NLIST, K = 10_000_000, 128, 4096, 10
    B = int(os.environ.get("QUAKE_SUITE_B", 32768))
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B, D, 4096, seed=7)
    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=NLIST, metric="l2", precision="bf16",
                               niter=15, calibrate_aps=False))
    build_s = time.perf_counter() - t0
    state = idx.store.state
    # 1024 GT queries: at 512 the 0.9-gate estimate has sigma ~0.0042, so a
    # build whose true recall is 0.904 at np12 flips the chosen nprobe (and
    # a ~8% QPS step) run to run (bench_10m_b24576 chose np13 on a 0.899
    # reading of the same build family).
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(queries[:1024]),
                          K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    chosen, recall = NLIST, 0.0
    for nprobe in (11, 12, 13, 14, 16, 20, 24):
        r = idx.search(queries[:1024], SearchParams(k=K, nprobe=nprobe,
                                                    exact_distances=False))
        recall = compute_recall(r.ids, gt, K)
        if recall >= 0.90:
            chosen = nprobe
            break
    qps = _qps(idx, queries,
               SearchParams(k=K, nprobe=chosen, exact_distances=False), B, 1)
    return {
        "metric": (
            f"10M x128 bf16 single chip (nlist={idx.nlist()}, C={idx.store.C}, "
            f"nprobe={chosen}, recall={recall:.3f}, build_s={build_s:.0f})"
        ),
        "value": round(qps),
        "unit": "qps",
    }


def run_soar():
    """SOAR spilled assignment (IndexBuildParams.spill — beyond the
    reference): recall-per-probe vs single assignment on the 1M bench
    corpus. Spilling + 2x nlist raises recall at 10 probes from ~0.84
    (single, same nlist) to ~0.92 with the dedup'd search program."""
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K, B = 1_000_000, 128, 10, 4096
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(B * 2, D, 4096, seed=7)
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=2048, metric="l2", spill=True,
                               calibrate_aps=False))
    state = idx.store.state
    _, gt32 = flat_search(state.codes, state.ids, jnp.asarray(queries[:1024]),
                          K, "l2")
    gt = np.asarray(gt32).astype(np.int64)
    nprobe = 10
    r = idx.search(queries[:1024], SearchParams(k=K, nprobe=nprobe))
    recall = compute_recall(r.ids, gt, K)
    qps = _qps(idx, queries, SearchParams(k=K, nprobe=nprobe), B, 2)
    return {
        "metric": (
            f"SOAR spill (nlist=2048, nprobe={nprobe}, dedup): "
            f"recall={recall:.3f}"
        ),
        "value": round(qps),
        "unit": "qps",
    }


CONFIGS = {
    "quickstart": run_quickstart,
    "deep": run_deep,
    "gist": run_gist,
    "streaming": run_streaming,
    "aps_batch": run_aps_batch,
    "soar": run_soar,
    "10m": run_10m,
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="quickstart,deep,gist,streaming")
    args = ap.parse_args()
    for name in args.configs.split(","):
        out = CONFIGS[name.strip()]()
        out["config"] = name.strip()
        print(json.dumps(out), flush=True)
