"""On-chip sharded-path correctness: shard_map + Mosaic v11 composition.

The TPU analog of the reference's WorkerScanCorrectnessTest
(test/cpp/query_coordinator.cpp:201): the sharded fused / APS paths must
return the SAME results as the unsharded path on the real TPU backend.
Round-3 gap: this composition (shard_map around pl.pallas_call, shard-aware
C-bucketing) had only ever compiled/run on the virtual CPU mesh — Mosaic
kernels do not lower on CPU, so the CPU suite exercises the xla backend.
A 1-device mesh still exercises the full composition: shard_map tracing,
in/out specs, the all_gather tournament merge, and the v11/v10 kernels
inside the mapped body.

Run (real TPU, expect minutes of remote-compile silence):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_sharded_parity.py

Writes experiments/tpu_sharded_parity.json and prints one JSON line.
"""

import json
import os
import signal
import sys
import time

OUT = os.path.join(os.path.dirname(__file__), "..", "experiments",
                   "tpu_sharded_parity.json")


def _probe_tpu(timeout_s: int = 60):
    def _to(signum, frame):
        raise TimeoutError

    old = signal.signal(signal.SIGALRM, _to)
    signal.alarm(timeout_s)
    try:
        import jax

        devs = jax.devices()
        return devs
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    try:
        devs = _probe_tpu()
    except Exception as e:  # tunnel dead — distinguishable failure
        line = {"error": "tpu_unreachable", "detail": repr(e)}
        print(json.dumps(line))
        return 1
    import jax
    import numpy as np

    plat = devs[0].platform
    import jax.numpy as jnp  # noqa: F401  (backend init)

    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(42)
    N = int(os.environ.get("QUAKE_PARITY_N", 200_000))
    D = int(os.environ.get("QUAKE_PARITY_D", 128))
    NLIST = int(os.environ.get("QUAKE_PARITY_NLIST", 256))
    # Clustered manifold data (same generator family as bench.py) so the
    # APS calibration engages realistically.
    centers = rng.standard_normal((512, D)).astype(np.float32) * 1.5
    assign = rng.integers(0, 512, N)
    x = (centers[assign]
         + rng.standard_normal((N, D)).astype(np.float32)).astype(np.float32)
    ids = np.arange(N, dtype=np.int64)
    q = (centers[rng.integers(0, 512, 256)]
         + rng.standard_normal((256, D)).astype(np.float32)).astype(np.float32)

    t0 = time.time()
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=NLIST))
    kernel = idx._grouped_kernel()
    gt, _ = knn(q, x, 10, "l2")

    cases = {
        "fused_np16": SearchParams(k=10, nprobe=16),
        "fused_np16_dequant": SearchParams(k=10, nprobe=16,
                                           exact_distances=False),
        "aps_oneshot": SearchParams(k=10, recall_target=0.9,
                                    aps_mode="oneshot",
                                    initial_search_fraction=0.25),
        "aps_planned": SearchParams(k=10, recall_target=0.9,
                                    aps_mode="planned",
                                    initial_search_fraction=0.25),
    }

    single = {}
    for name, sp in cases.items():
        r = idx.search(q, sp)
        single[name] = (np.asarray(r.ids), np.asarray(r.distances),
                        r.timing_info.partitions_scanned)

    idx.shard(1)  # 1-device mesh on the real chip
    report = {"platform": plat, "kernel": kernel, "n": N, "d": D,
              "nlist": NLIST, "mesh_devices": 1, "cases": {}}
    ok = True
    for name, sp in cases.items():
        r = idx.search(q, sp)
        s_ids, s_dists, s_scanned = single[name]
        ids_match = bool(np.array_equal(s_ids, np.asarray(r.ids)))
        try:
            np.testing.assert_allclose(s_dists, np.asarray(r.distances),
                                       rtol=1e-4, atol=1e-4)
            dists_match = True
        except AssertionError:
            dists_match = False
        rec = compute_recall(np.asarray(r.ids), gt, 10)
        report["cases"][name] = {
            "ids_match": ids_match, "dists_match": dists_match,
            "recall": float(rec),
            "scanned_single": int(s_scanned),
            "scanned_sharded": int(r.timing_info.partitions_scanned),
        }
        ok = ok and ids_match and dists_match
        if name.startswith("aps"):
            ok = ok and rec >= 0.9 - 0.02

    report["ok"] = ok
    report["elapsed_s"] = round(time.time() - t0, 1)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"ok": ok, "platform": plat, "kernel": kernel,
                      "cases": {k: v["ids_match"]
                                for k, v in report["cases"].items()}}))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
