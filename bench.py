"""Flagship benchmark: batched IVF search QPS at >=0.9 recall@10 on a
SIFT1M-scale corpus (1M x 128, nlist=192 since round 4 wave 4), run on the
attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the north-star target of 1M QPS @ 0.9 recall@10
(BASELINE.json). Data is synthetic-clustered (zero-egress environment) with
moderate cluster structure so the recall-vs-nprobe curve behaves like SIFT.
If real SIFT1M fvecs are present (QUAKE_TPU_DATA_DIR), they are used instead
and the metric line says so (VERDICT r3 #2).

Timing is amortized: the search program is enqueued for all batches and
synced once — per-dispatch round-trip latency through a remote-attached TPU
otherwise dominates and measures the tunnel, not the engine.

Tunnel resilience (VERDICT r3 #1): the axon tunnel has died mid-round twice
(round 3: port 8093 unreachable for hours, burning the round's headline).
The parent process probes `jax.devices()` in a subprocess with a hard
timeout, waits with backoff for a bounded window, then runs the benchmark
body in a watchdog-wrapped child. On child hang/crash it re-probes and
retries. On an unreachable TPU it prints a distinguishable JSON line
({"error": "tpu_unreachable", ...}) instead of hanging or stack-tracing.

Knobs (env):
  QUAKE_BENCH_WAIT_S        total seconds to wait for a reachable TPU (7200)
  QUAKE_BENCH_PROBE_S       per-probe hard timeout (90)
  QUAKE_BENCH_CHILD_S       watchdog timeout for one benchmark attempt (2700)
  QUAKE_BENCH_RETRIES       benchmark attempts before giving up (3)
  QUAKE_BENCH_NLIST / _BATCH / _PRECISION / _NITER / _EXACT  (bench shape)
"""

import json
import os
import subprocess
import sys
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


def make_sift_like(n, d, n_centers, seed, zdim=16, spread=1.5):
    """Second synthetic family (round 5, VERDICT r4 #9): uint8-QUANTIZED
    nonnegative descriptors with a SIFT-like norm spread — real SIFT vectors
    are 0..255 integer histograms with many zero bins and a wide per-vector
    gradient-energy distribution, neither of which the smooth manifold
    family has. Bench cross-check line: the headline operating point must
    hold (within ~10% QPS at the 0.9 gate) on BOTH families, bounding the
    distribution risk of the synthetic headline (real SIFT1M still loads
    via QUAKE_TPU_DATA_DIR when present, docs/SIFT1M.md)."""
    base = make_manifold(n, d, n_centers, seed, zdim=zdim, spread=spread)
    rng = np.random.default_rng(seed + 777)
    v = np.maximum(base + 0.3, 0.0)  # half-rectified: many zero bins
    gain = rng.lognormal(0.0, 0.35, size=(n, 1)).astype(np.float32)
    return np.clip(np.round(v * gain * 64.0), 0, 255).astype(np.float32)


def load_sift1m():
    """Real SIFT1M (base + queries) when the offline drop is present, else
    None. Mirrors the reference's SIFT1M baseline regime
    (test/python/regression/configs/sift1m_balanced.yaml:14-27)."""
    try:
        from quake_tpu.datasets import Sift1m

        ds = Sift1m()
        if not ds.is_downloaded():
            return None
        x, queries, _ = ds.load()
        return np.asarray(x, np.float32), np.asarray(queries, np.float32)
    except Exception:
        return None


def run_bench():
    import jax

    if os.environ.get("QUAKE_BENCH_FORCE_CPU") == "1":
        # Harness smoke tests: the sitecustomize pre-imports jax, so the
        # env var alone can't force CPU (see tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall

    # QUAKE_BENCH_N: corpus-size override for harness smoke tests (CPU) and
    # scale variants; the headline shape is the 1M default.
    N = int(os.environ.get("QUAKE_BENCH_N", 1_000_000))
    D, K = 128, 10
    # nlist=160 since round 5 (experiments/nlist_sweep7): at the actual
    # >=0.90 gate points, 160/np9 1192.6k QPS @ 0.9057 beats 192/np10
    # 1178.6k @ 0.9040 same-run pass-2 — and carries a wider recall
    # margin above the gate; 128/np9 lands below gate (0.8868). Round 4
    # wave 4 (nlist_sweep6): 192/np10 beat 256/np11 1137-1142k @ 0.9015
    # same-run both passes. Earlier round-4 sweeps: the
    # grouping / scatter / merge / parent bands and the kernel's selection
    # rounds all scale with n = B*nprobe or with group count — coarsening
    # at ~equal scan fraction keeps paying while slab DMA stays flat
    # (nlist_sweep4: 256/np12 1017.5k > 384/np12 986.5k > 512/np13 927.8k;
    # B=16384 does NOT amortize further; round-3: 512/np14 738k vs
    # 1024/np18 476k, nlist_sweep3).
    NLIST = int(os.environ.get("QUAKE_BENCH_NLIST", 160))
    # BATCH=16384 since the v11 argsort-overflow default (bsweep_160_argsort
    # pass-2, same-run: 8192: 1195k < 12288: 1210k < 16384: 1247k > 24576:
    # 1166k). The earlier "16384 regresses to 1114k" (bsweep_160) rode the
    # packed-key overflow fallback; at B>=16384 the uint32 key can't fit and
    # the argsort placement now serves those shapes cliff-free (tenm_cliff).
    BATCH = int(os.environ.get("QUAKE_BENCH_BATCH", 16384))
    NQ_GT, N_BATCHES = 1024, max(16384 // BATCH, 2)

    sift = load_sift1m()
    if sift is not None:
        x, q_all = sift
        N, D = x.shape
        reps_q = BATCH * N_BATCHES // len(q_all) + 1
        queries = np.tile(q_all, (reps_q, 1))[: BATCH * N_BATCHES]
        dataset_tag = "SIFT1M"
    else:
        family = os.environ.get("QUAKE_BENCH_FAMILY", "manifold")
        gen = make_sift_like if family == "sift_like" else make_manifold
        x = gen(N, D, 4096, seed=1)
        queries = gen(BATCH * N_BATCHES, D, 4096, seed=7)
        dataset_tag = ("synth-sift-u8" if family == "sift_like"
                       else "synth-manifold")
    ids = np.arange(N, dtype=np.int64)
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
    # Round 4: 25 at nlist=256 — np11 recall 0.9015 vs 0.9007 at niter=15
    # (nlist_sweep5), and the np11 gate decides ~12% QPS (1142k vs 1017k);
    # every extra thousandth of margin de-risks the capture.
    niter = int(os.environ.get("QUAKE_BENCH_NITER", 25))
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
    print(f"[bench] build done in {build_s:.1f}s", file=sys.stderr, flush=True)

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
    grid = ((9, 10, 11, 12, 14, 16, 24, 48) if NLIST <= 192
            else (11, 12, 13, 14, 16, 20, 32, 64) if NLIST <= 256
            else (12, 13, 14, 16, 20, 32, 64, 128) if NLIST <= 512
            else (16, 18, 20, 24, 32, 64, 128))
    for nprobe in grid:
        res = idx.search(q_gt, SearchParams(k=K, nprobe=nprobe,
                                            exact_distances=exact))
        r = compute_recall(res.ids, gt_ids, K)
        print(f"[bench] nprobe={nprobe} recall={r:.4f}", file=sys.stderr, flush=True)
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
                "metric": f"qps@recall>=0.90@10 ({dataset_tag} {N}x{D}, nlist={idx.nlist()}, nprobe={nprobe}, recall={recall:.3f}, C={idx.store.C}, build_s={build_s:.1f})",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 1_000_000, 4),
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------------------
# Tunnel-resilient parent harness
# ---------------------------------------------------------------------------

PROBE_SNIPPET = (
    "import os, sys, jax; "
    "os.environ.get('QUAKE_BENCH_FORCE_CPU') == '1' and "
    "jax.config.update('jax_platforms', 'cpu'); "
    "d = jax.devices(); sys.exit(0 if len(d) > 0 else 1)"
)


def probe_tpu(timeout_s: float) -> bool:
    """True iff `jax.devices()` returns within timeout_s in a subprocess.
    A dead axon tunnel makes backend init hang indefinitely (observed 1h+,
    round 3), so the probe MUST be out-of-process with a hard timeout."""
    try:
        rc = subprocess.run(
            [sys.executable, "-c", PROBE_SNIPPET],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def wait_for_tpu(window_s: float, probe_s: float) -> bool:
    deadline = time.monotonic() + window_s
    delay = 30.0
    first = True
    while True:
        t = time.monotonic()
        if probe_tpu(probe_s):
            return True
        if not first:
            print(f"[bench] TPU unreachable; retrying (deadline in "
                  f"{deadline - time.monotonic():.0f}s)", file=sys.stderr, flush=True)
        first = False
        if time.monotonic() + delay >= deadline:
            return False
        # probe itself consumes up to probe_s; keep total cadence ~delay
        time.sleep(max(0.0, delay - (time.monotonic() - t)))
        delay = min(delay * 1.5, 300.0)


def emit_error(kind: str, detail: str) -> None:
    print(json.dumps({
        "error": kind,
        "detail": detail,
        "metric": "qps@recall>=0.90@10",
        "value": 0.0,
        "unit": "qps",
        "vs_baseline": 0.0,
    }), flush=True)


def parent_main() -> int:
    wait_s = float(os.environ.get("QUAKE_BENCH_WAIT_S", 7200))
    probe_s = float(os.environ.get("QUAKE_BENCH_PROBE_S", 90))
    child_s = float(os.environ.get("QUAKE_BENCH_CHILD_S", 2700))
    retries = int(os.environ.get("QUAKE_BENCH_RETRIES", 3))
    t_start = time.monotonic()

    if not wait_for_tpu(wait_s, probe_s):
        emit_error("tpu_unreachable",
                   f"no TPU backend within {wait_s:.0f}s wait window")
        return 3

    env = dict(os.environ, QUAKE_BENCH_CHILD="1")
    last_err = ""
    for attempt in range(1, retries + 1):
        print(f"[bench] attempt {attempt}/{retries} (watchdog {child_s:.0f}s)",
              file=sys.stderr, flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                timeout=child_s, env=env, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt}: watchdog timeout after {child_s:.0f}s"
            print(f"[bench] {last_err}", file=sys.stderr, flush=True)
        else:
            sys.stderr.write(proc.stderr or "")
            result = None
            for line in (proc.stdout or "").splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        obj = json.loads(line)
                    except ValueError:
                        continue
                    if "value" in obj and "error" not in obj:
                        result = line
            if proc.returncode == 0 and result:
                print(result, flush=True)
                return 0
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            last_err = (f"attempt {attempt}: rc={proc.returncode}; "
                        + " | ".join(tail))
            print(f"[bench] child failed: {last_err}", file=sys.stderr, flush=True)

        # Re-probe before burning another attempt: distinguish a dead tunnel
        # (wait for it within the remaining window) from a real bench bug.
        remaining = wait_s - (time.monotonic() - t_start)
        if attempt < retries and remaining > probe_s:
            if not wait_for_tpu(remaining, probe_s):
                emit_error("tpu_unreachable",
                           f"tunnel died mid-round; {last_err}")
                return 3

    emit_error("bench_failed", last_err)
    return 4


if __name__ == "__main__":
    if os.environ.get("QUAKE_BENCH_CHILD") == "1":
        run_bench()
    else:
        sys.exit(parent_main())
