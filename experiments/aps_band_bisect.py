"""Bisect the masked-APS composition band (VERDICT r4 #2).

aps_b64_decomp (r4): composed oneshot serving = 6.95 ms @ B=64 while its
pieces sum to ~1.5 ms (model 0.34 + masked scan 0.75 + parent 0.45) and
fixed_np12 = 0.75 ms. The band is B-independent (CLAUDE.md: 11.5 ms @
B=4096/nlist=1024 vs 7.9 @ B=64/nlist=512) — so it is NOT the B*M grids.

Hypotheses, each isolated as a same-run probe (two interleaved passes,
pass 2 decides; outputs reduced inside the jit):

  H1 scalar-transfer stall: serving creates jnp.float32(recall_target),
     jnp.float32(ra), jnp.float32(rb) PER CALL — three host->device scalar
     transfers through the tunnel per dispatch, which the fixed-nprobe
     program doesn't pay. Probes: scan_const (no fresh scalar) vs
     scan_fresh_scalar (same program + one fresh jnp.float32 arg per call)
     vs scan_cached_scalar (scalar created once).
  H2 a stage of the oneshot pipeline (setup/radius/profile/plan/budget):
     inline replica with cumulative stage stubs; the stub that collapses
     the time names the band.
  H3 the budgeted v10b kernel vs plain masked vs dense prefix in the
     SAME composed program.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aps_band_bisect.py
"""

import functools
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

    N = int(os.environ.get("APS_BAND_N", 1_000_000))
    D, K = 128, 10
    B = int(os.environ.get("APS_BAND_B", 64))
    target = 0.9
    x = make_manifold(N, D, 4096, seed=1)
    queries = make_manifold(1024 + max(B, 1024), D, 4096, seed=7)

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
    state = idx.store.state
    kernel = idx._grouped_kernel()
    W = idx.aps_oneshot_mcap or 16
    qt, _gc = idx._grouped_params(B, W)
    wclip, bw = int(idx.aps_width_clip), int(idx.aps_budget_w)
    ra, rb = idx._radius_coef(K)
    dim = idx.aps_dimension or D
    table = geometry.beta_table(dim, "l2")
    pb = B * max(bw, 4) if (wclip and bw) else 0

    psp = SearchParams(k=W, batched_scan=True, recall_target=0.0)
    _, p_ids32, _ = idx.parent._search_device(q64, psp, approx_flat=True)
    pids = jnp.asarray(np.asarray(p_ids32[:, :W], np.int32))

    # Precomputed stage products (device-resident, created once).
    boundary0, valid0, _ = coordinator.aps_setup(q64, state.centroids, pids,
                                                 dim, True, table)
    boundary0 = jax.block_until_ready(boundary0)
    c0 = state.centroids[jnp.maximum(pids[:, 0], 0)].astype(jnp.float32)
    d1 = jnp.sqrt(jnp.maximum(
        jnp.sum((q64.astype(jnp.float32) - c0) ** 2, axis=1), 0.0))
    radius0 = jax.block_until_ready(jnp.maximum(ra + rb * d1, 0.0))
    probs0 = jax.block_until_ready(geometry.recall_profile(
        boundary0, radius0, dim, "l2", True, table, valid0))
    cs = jnp.cumsum(probs0, axis=1)
    hit = cs >= target
    first = jnp.argmax(hit, axis=1)
    n_b0 = jnp.where(jnp.any(hit, axis=1), first + 2, W) + 4
    n_b0 = jnp.clip(-(-n_b0 // 4) * 4, 4, min(wclip or W, W))
    n_b0 = jax.block_until_ready(n_b0.astype(jnp.int32))
    lane = jnp.arange(min(wclip or W, W), dtype=jnp.int32)[None, :]
    eff0 = jax.block_until_ready(
        jnp.where(lane < n_b0[:, None], pids[:, :min(wclip or W, W)], -1))
    tgt_dev = jax.block_until_ready(jnp.float32(target))
    ra_dev = jax.block_until_ready(jnp.float32(ra))
    rb_dev = jax.block_until_ready(jnp.float32(rb))

    # ---------- inline oneshot replica with cumulative stage stubs -------
    # stub levels: 0=full, 1=setup stubbed, 2=+radius, 3=+profile, 4=+plan,
    # 5=+eff (pure scan).
    @functools.partial(jax.jit, static_argnames=("stub", "pair_budget",
                                                 "dense"))
    def inline(codes, ids_t, sizes, norms, q, p_in, tgt, ra_in, rb_in,
               boundary_in, radius_in, probs_in, n_b_in, eff_in,
               stub: int = 0, pair_budget: int = 0, dense: bool = False):
        Wl = eff_in.shape[1]
        if stub < 1:
            boundary_in, valid, _ = coordinator.aps_setup(
                q, state.centroids, p_in, dim, True, table)
        else:
            valid = p_in >= 0
        if stub < 2:
            c0l = state.centroids[jnp.maximum(p_in[:, 0], 0)].astype(jnp.float32)
            d1l = jnp.sqrt(jnp.maximum(
                jnp.sum((q.astype(jnp.float32) - c0l) ** 2, axis=1), 0.0))
            radius_in = jnp.maximum(ra_in + rb_in * d1l, 0.0)
        if stub < 3:
            probs_in = geometry.recall_profile(
                boundary_in, radius_in, dim, "l2", True, table, valid)
        if stub < 4:
            csl = jnp.cumsum(probs_in, axis=1)
            hitl = csl >= tgt
            firstl = jnp.argmax(hitl, axis=1)
            n_b_in = jnp.where(jnp.any(hitl, axis=1), firstl + 2,
                               p_in.shape[1]) + 4
            n_b_in = jnp.clip(-(-n_b_in // 4) * 4, 4, Wl)
            if wclip and bw:
                n_bud = B * max(bw, 4)
                total = jnp.sum(n_b_in)
                base = B * 4
                avail = jnp.maximum(n_bud - base, 0)
                denom = jnp.maximum(total - base, 1)
                scaled = 4 + ((n_b_in - 4) * avail) // denom
                n_b_in = jnp.where(total > n_bud, scaled, n_b_in)
        if stub < 5:
            lanel = jnp.arange(Wl, dtype=jnp.int32)[None, :]
            eff_in = jnp.where(lanel < n_b_in[:, None], p_in[:, :Wl], -1)
        s, i, _ = coordinator.grouped_scan(
            codes, ids_t, sizes, norms, q, eff_in, K, "l2", qt, 64, kernel,
            exact=False, dense=dense, pair_budget=pair_budget)
        return jnp.sum(s[:, :1]) + jnp.sum(i[:, :1].astype(jnp.float32))

    args = (state.codes, state.ids, state.sizes, state.norms, q64, pids)

    def mk(stub, pair_budget=pb, dense=False):
        return lambda: inline(*args, tgt_dev, ra_dev, rb_dev, boundary0,
                              radius0, probs0, n_b0, eff0, stub=stub,
                              pair_budget=pair_budget, dense=dense)

    # H1 probes: same pure-scan program, scalar freshness varies.
    def scan_fresh_scalar():
        return inline(*args, jnp.float32(target), jnp.float32(ra),
                      jnp.float32(rb), boundary0, radius0, probs0, n_b0,
                      eff0, stub=5, pair_budget=pb)

    # Serving anchors.
    def anchor(sp):
        return lambda: idx._search_device_full(q64, sp)[1]

    variants = [
        ("fixed_np12", anchor(SearchParams(k=K, nprobe=12,
                                           exact_distances=False))),
        ("oneshot_serving", anchor(SearchParams(
            k=K, recall_target=target, aps_mode="oneshot",
            exact_distances=False))),
        ("planned_serving", anchor(SearchParams(
            k=K, recall_target=target, aps_mode="planned",
            exact_distances=False))),
        ("inline_full", mk(0)),
        ("stub_setup", mk(1)),
        ("stub_radius", mk(2)),
        ("stub_profile", mk(3)),
        ("stub_plan", mk(4)),
        ("scan_cached_scalar", mk(5)),
        ("scan_fresh_scalar", scan_fresh_scalar),
        ("inline_full_nobudget", mk(0, pair_budget=0)),
        ("inline_full_densescan", mk(5, pair_budget=0, dense=True)),
        # Budget sizing: the calibrated budget_w oversizes the machinery
        # relative to realized plans (mean ~12 ranks vs budget_w=20) — is
        # the masked-mode residual at production batch just that ratio?
        ("inline_full_budget12", mk(0, pair_budget=B * 12)),
        ("scan_budget12", mk(5, pair_budget=B * 12)),
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

    for pass_no in (1, 2):
        for name, fn in variants:
            bench(f"{name}_p{pass_no}", fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
