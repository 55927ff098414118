"""Flagship benchmark: batched IVF search QPS at >=0.9 recall@10 on a
SIFT1M-scale corpus (1M x 128, nlist=512), run on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the north-star target of 1M QPS @ 0.9 recall@10
(BASELINE.json). Data is synthetic-clustered (zero-egress environment) with
moderate cluster structure so the recall-vs-nprobe curve behaves like SIFT.

Timing is amortized: the search program is enqueued for all batches and
synced once — per-dispatch round-trip latency through a remote-attached TPU
otherwise dominates and measures the tunnel, not the engine.
"""

import json
import os
import time

import numpy as np


def make_manifold(n, d, n_centers, seed, zdim=16, spread=1.5):
    """SIFT-like synthetic: clustered data on a low-dimensional manifold
    embedded in d dims — gives the gradual recall-vs-nprobe curve real image
    descriptors have (calibrated: ~0.9 recall@10 at ~3% of partitions)."""
    rng = np.random.default_rng(99)  # shared manifold/centers across calls
    A = rng.standard_normal((zdim, d)).astype(np.float32) / np.sqrt(zdim)
    centers = rng.standard_normal((n_centers, zdim)).astype(np.float32) * spread
    r = np.random.default_rng(seed)
    z = centers[r.integers(0, n_centers, n)] + r.standard_normal((n, zdim)).astype(np.float32)
    return (z @ A + 0.05 * r.standard_normal((n, d)).astype(np.float32)).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.coordinator import flat_search
    from quake_tpu.utils import compute_recall

    N, D, K = 1_000_000, 128, 10
    # nlist=512 since round 3 (experiments/nlist_sweep3): the grouping /
    # scatter / merge / parent bands and the kernel's selection rounds all
    # scale with n = B*nprobe or with group count — halving nlist at the
    # same scan fraction halves them while slab DMA stays flat. Measured
    # same-run: nlist=512/np14 738k QPS @ 0.916 vs nlist=1024/np18 476k
    # @ 0.918 (B=4096). B=8192 amortizes the remaining fixed bands
    # (+6.5%: 786k vs 738k same run).
    NLIST = int(os.environ.get("QUAKE_BENCH_NLIST", 512))
    BATCH = int(os.environ.get("QUAKE_BENCH_BATCH", 8192))
    NQ_GT, N_BATCHES = 1024, max(16384 // BATCH, 2)

    x = make_manifold(N, D, 4096, seed=1)
    ids = np.arange(N, dtype=np.int64)
    queries = make_manifold(BATCH * N_BATCHES, D, 4096, seed=7)
    q_gt = queries[:NQ_GT]

    # bf16 slab storage is the serving default since round 3: the v9 kernel
    # is no longer VPU-bound, so halved DMA wins outright (7.73 vs 8.19 ms
    # kernel path, kernel_ab19) and recall parity holds (bf16 parity tests +
    # the recall gate below). QUAKE_BENCH_PRECISION=f32 reverts.
    precision = os.environ.get("QUAKE_BENCH_PRECISION", "bf16")
    # niter=15: +0.004-0.009 recall@10 at nprobe=16 vs the default 5
    # (round-2 build-quality sweep) — with the round-3 kernel the margin at
    # np16 sits exactly at the 0.90 gate, so the extra Lloyd passes decide
    # the serving nprobe (16 vs 18 = ~9% QPS) and damp build-to-build
    # variance. Build cost ~2x; amortized over the index lifetime.
    niter = int(os.environ.get("QUAKE_BENCH_NITER", 15))
    t0 = time.perf_counter()
    idx = QuakeIndex()
    # calibrate_aps=False: the headline measures fixed-nprobe serving; the
    # APS calibration (dimension sweep + gamma + the round-3 oneshot
    # radius predictor) costs several remote-compile minutes per build and
    # is exercised by the APS benches (aps_oneshot_ab, bench_suite)
    # instead.
    idx.build(x, ids, IndexBuildParams(nlist=NLIST, metric="l2",
                                       precision=precision, niter=niter,
                                       calibrate_aps=False))
    build_s = time.perf_counter() - t0

    # Exact ground truth on-device over the ORIGINAL f32 vectors (not the
    # store's possibly-bf16 slabs — recall must be judged against true f32
    # neighbors).
    from quake_tpu.ops.scan import flat_scan as _flat2d

    _, gt_ids = _flat2d(jnp.asarray(q_gt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt_ids = np.asarray(gt_ids).astype(np.int64)

    # Dequantized-score serving default since round 3 (kernel_ab27: fused
    # 6.75 vs 7.92 ms, -15%): membership is identical to exact rescore
    # (pool_factor=1 fixes it before the rescore), only the reported
    # distance VALUES carry ~1 quantization step (range/8k) of error — the
    # recall gate below is computed on ids and judges the same thing either
    # way. QUAKE_BENCH_EXACT=1 reverts to exact distances.
    exact = os.environ.get("QUAKE_BENCH_EXACT", "") == "1"

    # Find the smallest nprobe achieving >= 0.9 recall@10.
    chosen = None
    r = 0.0
    grid = ((12, 13, 14, 16, 20, 32, 64, 128) if NLIST <= 512
            else (16, 18, 20, 24, 32, 64, 128))
    for nprobe in grid:
        res = idx.search(q_gt, SearchParams(k=K, nprobe=nprobe,
                                            exact_distances=exact))
        r = compute_recall(res.ids, gt_ids, K)
        if r >= 0.90:
            chosen = (nprobe, r)
            break
    if chosen is None:
        chosen = (128, r)
    nprobe, recall = chosen

    # Throughput: enqueue all batches on device, sync once.
    sp = SearchParams(k=K, nprobe=nprobe, exact_distances=exact)
    q_dev = [jnp.asarray(queries[i * BATCH : (i + 1) * BATCH]) for i in range(N_BATCHES)]
    # warmup/compile
    jax.block_until_ready(idx._search_device_full(q_dev[0], sp)[1])
    _ = np.asarray(idx._search_device_full(q_dev[0], sp)[1])

    reps = max(int(2_000_000 // (N_BATCHES * BATCH)), 3)  # >=1s timed window
    t0 = time.perf_counter()
    last = None
    for _ in range(reps):
        for q in q_dev:
            last = idx._search_device_full(q, sp)
    _ = np.asarray(last[1])  # single-stream device queue: forces all batches
    elapsed = time.perf_counter() - t0
    qps = reps * N_BATCHES * BATCH / elapsed

    print(
        json.dumps(
            {
                "metric": f"qps@recall>=0.90@10 (1M x128, nlist={idx.nlist()}, nprobe={nprobe}, recall={recall:.3f}, C={idx.store.C}, build_s={build_s:.1f})",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 1_000_000, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
