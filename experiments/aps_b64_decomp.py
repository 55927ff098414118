"""Decompose the small-batch (B=64) oneshot-APS device cost.

latency_b64 (r4, nlist=512): oneshot device 7.93 ms vs fixed np16 1.86 ms
— a ~6 ms band that can't be pair-count (64 queries x ~20 ranks is tiny).
STATUS gap #3 says decompose before optimizing. Probes, same-run two
passes at the nlist=256 production build (calibrated, serving config
matched exactly: qt from _grouped_params, kernel from _grouped_kernel,
budget fields from calibration):

  anchors (fused serving programs via _search_device_full):
    fixed_np12 / fixed_np16 / oneshot / planned / loop
  probes (jitted pieces, outputs reduced INSIDE the jit):
    oneshot_jit   aps_search_oneshot with a precomputed pid matrix
                  (serving minus the parent dispatch)
    model_only    aps_setup + recall_profile + plan math at [B, W]
    masked_scan   budgeted masked grouped scan, width W, ~12 valid
    dense_scan12  dense grouped scan width 12 (the fixed kernel config)
    parent16      parent ranking alone (serving parent_sp path)

Probes rank hypotheses only (stage sums overstate fused programs —
aps_decomp r3); the anchors decide.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_b64_decomp.py
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
    from quake_tpu import coordinator, geometry
    from quake_tpu.ops.scan import flat_scan
    from quake_tpu.utils import compute_recall

    N = int(os.environ.get("APS_DECOMP_N", 1_000_000))
    D, K, B = 128, 10, 64
    target = 0.9
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(2048, D, 4096, seed=7)
    qgt = queries[:1024]

    _, gt32 = flat_scan(jnp.asarray(qgt), jnp.asarray(x),
                        jnp.arange(N, dtype=jnp.int32), K, "l2")
    gt = np.asarray(gt32).astype(np.int64)

    t0 = time.perf_counter()
    idx = QuakeIndex()
    idx.build(x, np.arange(N, dtype=np.int64),
              IndexBuildParams(nlist=256, metric="l2", precision="bf16",
                               niter=15))
    print(json.dumps({"built_s": round(time.perf_counter() - t0),
                      "mcap": idx.aps_oneshot_mcap,
                      "width_clip": idx.aps_width_clip,
                      "budget_w": idx.aps_budget_w,
                      "kernel": idx._grouped_kernel()}), flush=True)

    q64 = jnp.asarray(queries[1024:1024 + B])

    # Context: achieved recall + scanned for each mode at B=64-shaped plans.
    for name, sp in (
        ("fixed_np12", SearchParams(k=K, nprobe=12, exact_distances=False)),
        ("fixed_np16", SearchParams(k=K, nprobe=16, exact_distances=False)),
        ("oneshot", SearchParams(k=K, recall_target=target,
                                 aps_mode="oneshot", exact_distances=False)),
        ("planned", SearchParams(k=K, recall_target=target,
                                 aps_mode="planned", exact_distances=False)),
        ("loop", SearchParams(k=K, recall_target=target, aps_mode="loop",
                              exact_distances=False)),
    ):
        res = idx.search(qgt, sp)
        print(json.dumps({"cfg": name,
                          "recall": round(compute_recall(res.ids, gt, K), 4),
                          "scanned_mean":
                          res.timing_info.partitions_scanned}), flush=True)

    # ---- serving anchors at B=64 ----
    anchors = [
        ("fixed_np12", SearchParams(k=K, nprobe=12, exact_distances=False)),
        ("fixed_np16", SearchParams(k=K, nprobe=16, exact_distances=False)),
        ("oneshot", SearchParams(k=K, recall_target=target,
                                 aps_mode="oneshot", exact_distances=False)),
        ("planned", SearchParams(k=K, recall_target=target,
                                 aps_mode="planned", exact_distances=False)),
        ("loop", SearchParams(k=K, recall_target=target, aps_mode="loop",
                              exact_distances=False)),
    ]

    def bench(name, fn):
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        est = (time.perf_counter() - t0) / 3
        reps = max(int(1.2 / max(est, 1e-4)), 5)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    # ---- probe setup: exact serving config ----
    state = idx.store.state
    kernel = idx._grouped_kernel()
    W = idx.aps_oneshot_mcap or 16
    qt, _gc = idx._grouped_params(B, W)
    wclip, bw = int(idx.aps_width_clip), int(idx.aps_budget_w)
    ra, rb = idx._radius_coef(K)
    table = geometry.beta_table(idx.aps_dimension or D, "l2")
    dim = idx.aps_dimension or D

    # Precompute a realistic ranked candidate matrix via the parent.
    psp = SearchParams(k=W, batched_scan=True, recall_target=0.0)
    _, p_ids32, _ = idx.parent._search_device(q64, psp, approx_flat=True)
    pids = jnp.asarray(np.asarray(p_ids32[:, :W], np.int32))

    def oneshot_jit():
        s, i, sc = coordinator.aps_search_oneshot(
            state.codes, state.ids, state.centroids, q64, pids,
            jnp.float32(target), k=K, metric="l2", dimension=dim,
            radius_a=jnp.float32(ra), radius_b=jnp.float32(rb),
            use_precomputed=True, table=table, qt=qt, kernel=kernel,
            sizes=state.sizes, norms=state.norms, gamma=None,
            plan_margin=4, exact=False, width_clip=wclip, budget_w=bw)
        return jnp.sum(s[:, :1]) + jnp.sum(i[:, :1]) + jnp.sum(sc[:1])

    @jax.jit
    def model_only(q_in, p_in):
        boundary, valid, t = coordinator.aps_setup(
            q_in, state.centroids, p_in, dim, True, table)
        c0 = state.centroids[jnp.maximum(p_in[:, 0], 0)].astype(jnp.float32)
        d1 = jnp.sqrt(jnp.maximum(
            jnp.sum((q_in.astype(jnp.float32) - c0) ** 2, axis=1), 0.0))
        radius = jnp.maximum(ra + rb * d1, 0.0)
        probs = geometry.recall_profile(boundary, radius, dim, "l2", True, t,
                                        valid)
        cs = jnp.cumsum(probs, axis=1)
        hit = cs >= target
        first = jnp.argmax(hit, axis=1)
        n_b = jnp.where(jnp.any(hit, axis=1), first + 2, p_in.shape[1])
        return jnp.sum(n_b)

    lane = np.arange(W)[None, :]
    eff_np = np.where(lane < 12, np.asarray(pids), -1).astype(np.int32)
    eff = jnp.asarray(eff_np)
    pb = B * max(bw, 4) if (wclip and bw) else 0

    # NB: the store tensors MUST be jit arguments, not closure captures —
    # closed-over device arrays are baked into the program as constants
    # and the ~330 MB codes slab blows the remote-compile payload limit
    # (HTTP 413, first run of this script).
    @jax.jit
    def masked_scan(c_in, i_in, sz_in, n_in, eff_in):
        s, i, _ = coordinator.grouped_scan(
            c_in, i_in, sz_in, n_in, q64, eff_in,
            K, "l2", qt, 64, kernel, exact=False, pair_budget=pb)
        return jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])

    dense12 = pids[:, :12]

    @jax.jit
    def dense_scan12(c_in, i_in, sz_in, n_in, p_in):
        s, i, _ = coordinator.grouped_scan(
            c_in, i_in, sz_in, n_in, q64, p_in,
            K, "l2", qt, 64, kernel, exact=False, dense=True)
        return jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])

    def parent16():
        s, i, _ = idx.parent._search_device(q64, psp, approx_flat=True)
        return i

    probes = [
        ("oneshot_jit", oneshot_jit),
        ("model_only", lambda: model_only(q64, pids)),
        ("masked_scan", lambda: masked_scan(
            state.codes, state.ids, state.sizes, state.norms, eff)),
        ("dense_scan12", lambda: dense_scan12(
            state.codes, state.ids, state.sizes, state.norms, dense12)),
        ("parent16", parent16),
    ]

    def anchor_fn(sp):
        return lambda: idx._search_device_full(q64, sp)[1]

    variants = [(n, anchor_fn(sp)) for n, sp in anchors] + probes
    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
