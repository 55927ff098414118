"""APS geometry + recall-target adherence tests
(mirror test/cpp/search_recall_tests.cpp:284-339 and geometry.h math)."""

import jax.numpy as jnp
import numpy as np
import pytest


def _lentz_betainc(a, b, x, iters=500):
    """Host oracle: Lentz continued-fraction incomplete beta, the reference
    algorithm (geometry.h:115-161), implemented independently in numpy."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    if x > (a + 1.0) / (a + b + 2.0):
        return 1.0 - _lentz_betainc(b, a, 1.0 - x, iters)
    lbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    front = math.exp(math.log(x) * a + math.log(1.0 - x) * b - lbeta) / a
    f, c, d = 1.0, 1.0, 0.0
    TINY = 1e-30
    for i in range(iters):
        m = i // 2
        if i == 0:
            num = 1.0
        elif i % 2 == 0:
            num = (m * (b - m) * x) / ((a + 2 * m - 1) * (a + 2 * m))
        else:
            num = -((a + m) * (a + b + m) * x) / ((a + 2 * m) * (a + 2 * m + 1))
        d = 1.0 + num * d
        if abs(d) < TINY:
            d = TINY
        d = 1.0 / d
        c = 1.0 + num / c
        if abs(c) < TINY:
            c = TINY
        f *= c * d
        if abs(1.0 - c * d) < 1e-8:
            return front * (f - 1.0)
    return front * (f - 1.0)


def test_betainc_matches_lentz_oracle():
    from quake_tpu.geometry import beta_table

    d = 32
    tbl = np.asarray(beta_table(d, "l2"))
    a = (d + 1.0) / 2.0
    xs = np.linspace(0, 1, 1001)
    oracle = np.array([_lentz_betainc(a, 0.5, float(x)) for x in xs[::100]])
    np.testing.assert_allclose(tbl[::100], oracle, rtol=1e-3, atol=1e-5)


def test_boundary_distances_l2_oracle():
    """Bisector-distance formula vs a direct geometric computation
    (geometry.h:57-95)."""
    from quake_tpu.geometry import boundary_distances

    rng = np.random.default_rng(0)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    cents = rng.standard_normal((3, 5, 8)).astype(np.float32)
    out = np.asarray(boundary_distances(jnp.asarray(q), jnp.asarray(cents), "l2"))
    for b in range(3):
        c0 = cents[b, 0]
        r = q[b] - c0
        for j in range(1, 5):
            v = cents[b, j] - c0
            a2 = float(v @ v)
            expected = abs(float(r @ v) - 0.5 * a2) / np.sqrt(a2)
            np.testing.assert_allclose(out[b, j], expected, rtol=1e-4)
    assert (out[:, 0] == -1.0).all()


def test_recall_profile_properties():
    """Profile sums to 1, rank-0 heuristic (geometry.h:379), zero beyond
    radius (geometry.h:363)."""
    from quake_tpu.geometry import recall_profile

    rng = np.random.default_rng(1)
    M = 10
    boundary = np.sort(rng.uniform(0.5, 3.0, (4, M)).astype(np.float32), axis=1)
    boundary[:, 0] = -1.0
    radius = np.array([1.0, 2.0, 0.7, 10.0], dtype=np.float32)
    probs = np.asarray(
        recall_profile(jnp.asarray(boundary), jnp.asarray(radius), 32, "l2")
    )
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
    for b in range(4):
        within = boundary[b, 1:] < radius[b]
        if not within.any():
            # All caps empty -> all mass on the home partition (improvement
            # over the reference's uniform fallback; see recall_profile).
            assert probs[b, 0] == 1.0 and (probs[b, 1:] == 0).all()
            continue
        # Partitions with boundary >= radius have zero probability.
        assert (probs[b, 1:][~within] == 0).all()
        # rank 0 = 2x rank 1 before normalization => ratio preserved after.
        if probs[b, 1] > 0:
            np.testing.assert_allclose(probs[b, 0], 2 * probs[b, 1], rtol=1e-3)


def test_recall_profile_infinite_radius_keeps_scanning():
    """Safety deviation: when the top-k buffer is not yet full (radius=inf),
    probabilities are zero so APS keeps scanning."""
    from quake_tpu.geometry import recall_profile

    boundary = np.array([[-1.0, 0.5, 1.0, 2.0]], dtype=np.float32)
    radius = np.array([np.inf], dtype=np.float32)
    probs = np.asarray(
        recall_profile(jnp.asarray(boundary), jnp.asarray(radius), 16, "l2")
    )
    assert (probs == 0).all()


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_aps_recall_target_adherence(metric):
    """Achieved recall >= target (search_recall_tests.cpp:284-339 semantics,
    with initial_search_fraction=0.5 as the reference tests use)."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(7)
    x = rng.standard_normal((20_000, 32)).astype(np.float32)
    q = rng.standard_normal((20, 32)).astype(np.float32)
    if metric == "ip":
        # The spherical-cap model's domain is the unit sphere (like DEEP/
        # normalized embedding benchmarks); normalize for IP.
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids = np.arange(20_000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=200, metric=metric))
    gt, _ = knn(q, x, 10, metric)

    prev_scanned = 0
    for target in (0.5, 0.8, 0.9):
        res = idx.search(
            q,
            SearchParams(
                k=10,
                recall_target=target,
                initial_search_fraction=0.5,
                recompute_threshold=0.0,
                aps_chunk_size=4,
            ),
        )
        achieved = compute_recall(res.ids, gt, 10)
        assert achieved >= target - 0.05, f"target {target}, achieved {achieved}"
        scanned = res.timing_info.partitions_scanned
        assert scanned >= prev_scanned  # more aggressive target scans more
        prev_scanned = scanned
    # APS must scan far fewer partitions than the candidate set at low targets.
    res_low = idx.search(
        q, SearchParams(k=10, recall_target=0.5, initial_search_fraction=0.5,
                        recompute_threshold=0.0, aps_chunk_size=4)
    )
    assert res_low.timing_info.partitions_scanned < 100


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_aps_planned_mode_adherence(metric):
    """Planned (two-phase) APS: prologue scan -> one-shot probe plan ->
    masked tail scan. Must adhere to the target like the while-loop path
    (its plan can only overscan: the phase-1 radius upper-bounds the final
    k-th distance) and scan no more than the full candidate set."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(7)
    x = rng.standard_normal((20_000, 32)).astype(np.float32)
    q = rng.standard_normal((20, 32)).astype(np.float32)
    if metric == "ip":
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids = np.arange(20_000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=200, metric=metric))
    gt, _ = knn(q, x, 10, metric)

    for target in (0.5, 0.9):
        res_p = idx.search(
            q,
            SearchParams(k=10, recall_target=target,
                         initial_search_fraction=0.5, aps_mode="planned"),
        )
        achieved = compute_recall(res_p.ids, gt, 10)
        assert achieved >= target - 0.05, f"target {target}, achieved {achieved}"
        assert res_p.timing_info.partitions_scanned <= 100
        # loop-mode comparison: planned never underscans the loop by design
        res_l = idx.search(
            q,
            SearchParams(k=10, recall_target=target,
                         initial_search_fraction=0.5, aps_mode="loop",
                         recompute_threshold=0.0, aps_chunk_size=4),
        )
        achieved_l = compute_recall(res_l.ids, gt, 10)
        assert achieved >= achieved_l - 0.1


def test_aps_oneshot_mode_adherence(tmp_path):
    """Oneshot APS (predicted-radius plan -> ONE scan, no prologue): must
    adhere to the target; the calibrated radius model persists through
    save/load. Falls back to planned when the build-time validation
    declined the predictor (still adherent either way)."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(7)
    x = rng.standard_normal((20_000, 32)).astype(np.float32)
    q = rng.standard_normal((20, 32)).astype(np.float32)
    ids = np.arange(20_000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=200, metric="l2"))
    gt, _ = knn(q, x, 10, "l2")

    for target in (0.5, 0.9):
        res = idx.search(
            q,
            SearchParams(k=10, recall_target=target,
                         initial_search_fraction=0.5, aps_mode="oneshot"),
        )
        achieved = compute_recall(res.ids, gt, 10)
        assert achieved >= target - 0.05, f"target {target}, achieved {achieved}"
        assert res.timing_info.partitions_scanned <= 100

    if idx.aps_radius_ab is not None:
        # Rows are (a_k, b_k); radius must be nondecreasing in k at the
        # sample's typical d1 scale (more neighbors = larger radius).
        assert idx.aps_radius_ab.shape[1] == 2
        p = tmp_path / "oneshot_idx"
        idx.save(str(p))
        idx2 = QuakeIndex()
        idx2.load(str(p))
        np.testing.assert_allclose(idx2.aps_radius_ab, idx.aps_radius_ab)
        res2 = idx2.search(
            q, SearchParams(k=10, recall_target=0.9,
                            initial_search_fraction=0.5, aps_mode="oneshot"))
        assert compute_recall(res2.ids, gt, 10) >= 0.85


def test_aps_oneshot_ip_adherence():
    """Oneshot APS on a unit-norm IP corpus: the radius predictor runs in
    the MIPS->L2-reduced space (radius = sqrt(|q|^2 + 1 - 2s)), so the
    affine fit and the plan must adhere there too (DEEP-like regime)."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(11)
    x = rng.standard_normal((20_000, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((20, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids = np.arange(20_000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=200, metric="ip"))
    gt, _ = knn(q, x, 10, "ip")

    res = idx.search(
        q, SearchParams(k=10, recall_target=0.9,
                        initial_search_fraction=0.5, aps_mode="oneshot"))
    achieved = compute_recall(res.ids, gt, 10)
    assert achieved >= 0.85, achieved
    assert res.timing_info.partitions_scanned <= 100


def test_aps_auto_mode_selection(monkeypatch):
    """aps_mode="auto" routes to oneshot at production batch when the
    radius predictor calibrated, to planned when it did not, and to
    planned at small batch (round 5: the loop measured below-target
    recall in the latency regime — 0.85 @ B=1 vs planned 0.95,
    r4_runs/latency256_b1.json — so auto never picks it; the loop stays
    reachable via aps_mode="loop"). Observed via coordinator call
    counts."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu import coordinator

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((32, 16)).astype(np.float32) * 6.0
    x = (centers[rng.integers(0, 32, 12_000)]
         + rng.standard_normal((12_000, 16)).astype(np.float32))
    idx = QuakeIndex()
    idx.build(x, np.arange(12_000, dtype=np.int64), IndexBuildParams(nlist=32))

    calls = {"oneshot": 0, "planned": 0, "loop": 0}
    real_one, real_plan, real_loop = (coordinator.aps_search_oneshot,
                                      coordinator.aps_search_planned,
                                      coordinator.aps_search)

    def wrap(name, fn):
        def inner(*a, **kw):
            calls[name] += 1
            return fn(*a, **kw)
        return inner

    monkeypatch.setattr(coordinator, "aps_search_oneshot",
                        wrap("oneshot", real_one))
    # Round 5: single-level non-spilled parents serve oneshot through the
    # parent-fused program — count it as the same mode.
    monkeypatch.setattr(coordinator, "aps_search_oneshot_fused",
                        wrap("oneshot", coordinator.aps_search_oneshot_fused))
    monkeypatch.setattr(coordinator, "aps_search_planned",
                        wrap("planned", real_plan))
    monkeypatch.setattr(coordinator, "aps_search", wrap("loop", real_loop))

    qbig = (centers[rng.integers(0, 32, 1024)]
            + rng.standard_normal((1024, 16)).astype(np.float32))
    sp = SearchParams(k=10, recall_target=0.9, initial_search_fraction=0.5)
    idx.search(qbig, sp)
    if idx.aps_radius_ab is not None:
        assert calls["oneshot"] == 1 and calls["planned"] == 0
    else:
        assert calls["planned"] == 1 and calls["oneshot"] == 0

    planned_before = calls["planned"]
    idx.search(qbig[:16], sp)  # small batch -> planned (never the loop)
    assert calls["loop"] == 0
    assert calls["planned"] == planned_before + 1

    # uncalibrated index at batch -> planned
    idx.aps_radius_ab = None
    idx.search(qbig, sp)
    assert calls["planned"] >= 1


def test_effective_dimension():
    """Participation-ratio dimension: ~ambient for isotropic data, ~intrinsic
    for manifold data (drives the APS cap-volume model)."""
    from quake_tpu.geometry import effective_dimension

    rng = np.random.default_rng(0)
    iso = rng.standard_normal((5000, 32)).astype(np.float32)
    assert 28 <= effective_dimension(iso) <= 32

    A = rng.standard_normal((8, 64)).astype(np.float32)
    manifold = rng.standard_normal((5000, 8)).astype(np.float32) @ A
    manifold += 0.01 * rng.standard_normal((5000, 64)).astype(np.float32)
    d_eff = effective_dimension(manifold)
    assert 4 <= d_eff <= 14


def test_aps_uses_effective_dimension(small_data):
    """Index build records the effective dimension and APS uses it."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams

    x, ids, q = small_data
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=32))
    assert idx.aps_dimension > 0
    res = idx.search(q, SearchParams(k=10, recall_target=0.8,
                                     initial_search_fraction=0.5))
    assert res.ids.shape == (len(q), 10)


def test_calibrate_aps_reentry_resets_serving_fields():
    """ADVICE r4 (medium): a re-run of calibrate_aps that fails a gate must
    not leave the PREVIOUS store's calibration products serving — the dense
    route (index.py dense-prefix) trusts aps_dense_w/aps_calib_target with
    no further validation. The resets live UP FRONT in calibrate_aps
    (index.py:301-315), before every early return; force the earliest gate
    (ntotal < 512) after a successful calibration and check every
    serving-facing field is cleared."""
    from quake_tpu import IndexBuildParams, QuakeIndex

    rng = np.random.default_rng(3)
    n, d = 4096, 16
    centers = 8.0 * rng.standard_normal((32, d)).astype(np.float32)
    x = (centers[rng.integers(0, 32, n)]
         + rng.standard_normal((n, d)).astype(np.float32))
    ids = np.arange(n, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=16, metric="l2"))
    # Simulate a successful prior calibration (the gates are corpus-
    # sensitive on tiny data; the dense-prefix tests seed the same fields,
    # test_aps_dense_prefix_routing above).
    idx.aps_dense_w = 3
    idx.aps_width_clip = 6
    idx.aps_budget_w = 4
    idx.aps_calib_target = 0.9
    idx.aps_calib_nq = 128

    idx.remove(ids[: n - 256])  # below the 512-vector calibration gate
    idx.calibrate_aps(target=0.9)
    for f in ("aps_dense_w", "aps_width_clip", "aps_budget_w",
              "aps_calib_nq"):
        assert getattr(idx, f) == 0, (f, getattr(idx, f))
    assert idx.aps_calib_target == 0.0
    assert idx.aps_radius_ab is None


def test_aps_adherence_isotropic_d64_after_calibration():
    """Isotropic data at d=64: the cap model at the ambient/intrinsic
    dimension over-trusts high-d concentration and used to miss targets
    (achieved 0.82 @ target 0.9). The contract is behavioral: with a
    candidate set whose ceiling clears the target (isf=0.75: nprobe=48
    recall ~0.97), achieved recall must meet it — whether calibration gets
    there via a conservative model dimension or (round 4) via pseudo-OOS
    perturbed validation queries + candidate-width escalation. Round 4
    also covers the DEFAULT (auto-width) path: isotropic is the worst case
    for the old fraction default (0.02*64 -> 1 candidate partition)."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(0)
    n, d = 12_000, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((48, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=64, metric="l2"))
    gt, _ = knn(q, x, 10, "l2")
    res = idx.search(q, SearchParams(k=10, recall_target=0.9,
                                     initial_search_fraction=0.75))
    achieved = compute_recall(res.ids, gt, 10)
    assert achieved >= 0.9 - 0.03, achieved
    res_auto = idx.search(q, SearchParams(k=10, recall_target=0.9))
    achieved_auto = compute_recall(res_auto.ids, gt, 10)
    assert achieved_auto >= 0.9 - 0.03, achieved_auto


def test_aps_ip_adherence_and_efficiency():
    """IP (unit-norm) adherence AND efficiency (round-3 VERDICT #4): the
    dimension lever saturates on the sphere (cap volumes are O(1) fractions
    of the ball), so calibration adds a profile-sharpening gamma. Achieved
    recall must meet the target, and scanned partitions must stay within
    1.5x the fixed-nprobe cost of the SAME achieved recall (pre-fix: 21
    scanned where 8 sufficed)."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(3)
    n, d, nc = 20_000, 32, 64
    centers = rng.standard_normal((128, d)).astype(np.float32) * 1.2
    assign = rng.integers(0, 128, n)
    x = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qa = rng.integers(0, 128, 64)
    q = centers[qa] + rng.standard_normal((64, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=nc, metric="ip"))
    assert idx.aps_gamma > 1.0  # calibration engaged the sharpening stage
    gt, _ = knn(q, x, 10, "ip")

    res = idx.search(q, SearchParams(k=10, recall_target=0.9,
                                     initial_search_fraction=0.6,
                                     recompute_threshold=0.0,
                                     aps_chunk_size=4))
    achieved = compute_recall(res.ids, gt, 10)
    scanned = res.timing_info.partitions_scanned
    assert achieved >= 0.9, achieved

    # Equal-recall fixed-nprobe cost: the honest efficiency oracle (per-query
    # oracle-minimal prefixes are unreachable under chunked termination).
    np_eq = None
    for npb in range(2, nc + 1, 2):
        r = idx.search(q, SearchParams(k=10, nprobe=npb))
        if compute_recall(r.ids, gt, 10) >= achieved - 0.005:
            np_eq = npb
            break
    assert np_eq is not None
    assert scanned <= 1.5 * np_eq + 1, (scanned, np_eq)
    assert scanned <= 15  # absolute regression guard (pre-fix: 21)


def test_aps_dequantized_serving_wiring():
    """SearchParams(exact_distances=False) threads through every APS mode
    (loop/planned/oneshot) — previously only the fused fixed-nprobe path
    honored it, so APS always paid the exact-rescore winner gather
    (query_coordinator.cpp:383-430 has no such rescore stage either).
    Adherence must hold and ids must match the exact=True run on the xla
    backend (where dequantization is a no-op); kernel-level dequantized
    parity is covered by test_v10_dequantized_matches_exact."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(11)
    x = rng.standard_normal((20_000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    ids = np.arange(20_000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=128))
    gt, _ = knn(q, x, 10, "l2")

    for mode in ("loop", "planned", "oneshot"):
        res = idx.search(
            q,
            SearchParams(k=10, recall_target=0.8,
                         initial_search_fraction=0.5, aps_mode=mode,
                         recompute_threshold=0.0, aps_chunk_size=4,
                         exact_distances=False),
        )
        achieved = compute_recall(res.ids, gt, 10)
        assert achieved >= 0.75, (mode, achieved)
        res_e = idx.search(
            q,
            SearchParams(k=10, recall_target=0.8,
                         initial_search_fraction=0.5, aps_mode=mode,
                         recompute_threshold=0.0, aps_chunk_size=4,
                         exact_distances=True),
        )
        assert np.array_equal(np.asarray(res.ids), np.asarray(res_e.ids)), mode


def test_aps_oneshot_budget_plan_clipping():
    """aps_oneshot's flat-pair-budget plan math: per-query plans clip to
    width_clip, and the batch total is GUARANTEED <= B*budget_w via the
    above-floor scale-down — even when raw plans would massively overflow
    the budget. The scan closure receives the static pair budget."""
    from quake_tpu.coordinator import aps_oneshot, aps_setup
    from quake_tpu.geometry import beta_table

    rng = np.random.default_rng(11)
    B, M, D, P, k = 32, 16, 8, 64, 5
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    cents = jnp.asarray(rng.standard_normal((P, D)).astype(np.float32))
    pids = jnp.asarray(
        np.stack([rng.choice(P, M, replace=False) for _ in range(B)])
        .astype(np.int32))
    table = beta_table(D, "l2")
    boundary, valid, table = aps_setup(q, cents, pids, D, True, table)

    recorded = {}

    def scan_chunk(eff, pair_budget=0):
        recorded["eff"] = np.asarray(eff)
        recorded["budget"] = pair_budget
        W = eff.shape[1]
        return (jnp.zeros((B, k), jnp.float32),
                jnp.zeros((B, k), jnp.int32))

    # A huge radius forces every plan to the full width M; tight budget
    # must scale the plans down to fit.
    wclip, bw = 8, 6
    _, _, scanned = aps_oneshot(
        q, pids, boundary, valid, table, jnp.float32(0.99), k, "l2", D,
        True, scan_chunk, cents, jnp.float32(100.0), jnp.float32(0.0),
        width_clip=wclip, budget_w=bw)
    eff = recorded["eff"]
    assert eff.shape == (B, wclip)
    assert recorded["budget"] == B * bw
    per_q = (eff >= 0).sum(axis=1)
    assert per_q.max() <= wclip
    assert per_q.sum() <= B * bw
    assert (per_q >= 1).all()  # never below the plan floor
    np.testing.assert_array_equal(np.asarray(scanned), per_q)

    # Without the budget the same plan scans the full candidate width.
    _, _, scanned0 = aps_oneshot(
        q, pids, boundary, valid, table, jnp.float32(0.99), k, "l2", D,
        True, scan_chunk, cents, jnp.float32(100.0), jnp.float32(0.0))
    assert recorded["eff"].shape == (B, M)
    assert recorded["budget"] == 0
    assert int(np.asarray(scanned0).sum()) == B * M


def test_aps_plan_budgeted_tail():
    """aps_plan's budgeted masked tail (the planned-path analog of the
    oneshot flat-pair budget, r4): plans clip to width_clip total ranks,
    the tail total is GUARANTEED <= B*budget_w via the proportional
    scale-down, and the tail scan closure receives the static pair budget.
    Unbudgeted, the tail machinery is sized B*(M-chunk0) — measured 70+ ms
    vs 8 ms fixed at the nlist=256 production point (aps_width_check)."""
    from quake_tpu.coordinator import aps_plan, aps_setup
    from quake_tpu.geometry import beta_table

    rng = np.random.default_rng(12)
    B, M, D, P, k, c0 = 32, 24, 8, 64, 5, 4
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    cents = jnp.asarray(rng.standard_normal((P, D)).astype(np.float32))
    pids = jnp.asarray(
        np.stack([rng.choice(P, M, replace=False) for _ in range(B)])
        .astype(np.int32))
    table = beta_table(D, "l2")
    boundary, valid, table = aps_setup(q, cents, pids, D, True, table)

    recorded = {}

    def scan_chunk(eff, pair_budget=0):
        W = eff.shape[1]
        if W == c0:  # prologue: huge k-th distance -> every plan maxes out
            return (jnp.full((B, k), -1e6, jnp.float32),
                    jnp.zeros((B, k), jnp.int32))
        recorded["eff"] = np.asarray(eff)
        recorded["budget"] = pair_budget
        return (jnp.full((B, k), -jnp.inf, jnp.float32),
                jnp.full((B, k), -1, jnp.int32))

    wclip, bw = 12, 6
    _, _, scanned = aps_plan(
        q, pids, boundary, valid, table, jnp.float32(0.99), k, "l2", D,
        c0, True, scan_chunk, width_clip=wclip, budget_w=bw)
    eff = recorded["eff"]
    # width_clip bounds the TAIL width: plans reach c0 + wclip total ranks.
    assert eff.shape == (B, min(c0 + wclip, M) - c0)
    assert recorded["budget"] == B * bw
    per_q = (eff >= 0).sum(axis=1)
    assert per_q.max() <= wclip
    assert per_q.sum() <= B * bw
    np.testing.assert_array_equal(np.asarray(scanned), per_q + c0)

    # Without the budget the same saturated plan scans the full width.
    _, _, scanned0 = aps_plan(
        q, pids, boundary, valid, table, jnp.float32(0.99), k, "l2", D,
        c0, True, scan_chunk)
    assert recorded["eff"].shape == (B, M - c0)
    assert recorded["budget"] == 0
    assert int(np.asarray(scanned0).sum()) == B * M

    # Loose budget: clipping machinery engages but sheds nothing — results
    # and scanned counts match the unbudgeted plan exactly.
    _, _, scanned1 = aps_plan(
        q, pids, boundary, valid, table, jnp.float32(0.99), k, "l2", D,
        c0, True, scan_chunk, width_clip=M, budget_w=M)
    assert recorded["budget"] == B * M
    np.testing.assert_array_equal(np.asarray(scanned1), np.asarray(scanned0))


def test_aps_oneshot_budget_end_to_end(tmp_path):
    """Index-level flat-pair-budget fields: calibration leaves the budget
    OFF on the xla kernel (pair_budget is Pallas-only — clipping plans
    there would carry recall risk with zero machinery benefit, and each
    candidate is a fresh compile), and the fields persist through
    save/load for indexes calibrated on a Pallas backend."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(17)
    x = rng.standard_normal((20_000, 32)).astype(np.float32)
    q = rng.standard_normal((20, 32)).astype(np.float32)
    ids = np.arange(20_000, dtype=np.int64)
    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=200, metric="l2"))
    gt, _ = knn(q, x, 10, "l2")

    # CPU suite serves the xla kernel -> budget calibration must be gated
    # off (the kernel dispatch would ignore pair_budget anyway).
    if not idx._grouped_kernel().startswith(("v10", "v11")):
        assert idx.aps_budget_w == 0 and idx.aps_width_clip == 0
    if idx.aps_radius_ab is not None:
        res = idx.search(
            q, SearchParams(k=10, recall_target=0.9,
                            initial_search_fraction=0.5,
                            aps_mode="oneshot"))
        achieved = compute_recall(res.ids, gt, 10)
        assert achieved >= 0.85, f"oneshot achieved {achieved}"

    # Persistence of TPU-calibrated budget fields (set manually here —
    # the values round-trip regardless of the calibrating backend).
    idx.aps_width_clip, idx.aps_budget_w = 40, 28
    p = tmp_path / "budget_idx"
    idx.save(str(p))
    idx2 = QuakeIndex()
    idx2.load(str(p))
    assert idx2.aps_budget_w == 28 and idx2.aps_width_clip == 40
    idx.aps_width_clip = idx.aps_budget_w = 0


def test_aps_dense_prefix_routing():
    """Round-4 dense-prefix serving: with the budget calibration recorded
    (width_clip > 0), auto recall-target serving routes to a DENSE scan of
    the calibrated candidate prefix — exactly the fixed-nprobe program at
    nprobe=width_clip (aps_b64_decomp: the masked machinery costs 3.5-4.2x
    the dense program at B=64). Explicit masked modes still pin their
    per-query-plan strategies, and an explicit initial_search_fraction
    (reference capped-candidate semantics) disables the route."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((32, 16)).astype(np.float32) * 3.0
    x = (centers[rng.integers(0, 32, 8000)]
         + rng.standard_normal((8000, 16))).astype(np.float32)
    q = (centers[rng.integers(0, 32, 32)]
         + rng.standard_normal((32, 16))).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(8000, dtype=np.int64),
              IndexBuildParams(nlist=32, metric="l2"))

    # Pin the serving width explicitly (the build's own calibration may
    # have recorded any dense_w for this corpus).
    idx.aps_dense_w = 6
    idx.aps_width_clip, idx.aps_budget_w = 0, 0
    idx.aps_calib_target = 0.9

    res_auto = idx.search(q, SearchParams(k=10, recall_target=0.9))
    res_dense = idx.search(q, SearchParams(k=10, recall_target=0.9,
                                           aps_mode="dense"))
    res_fixed = idx.search(q, SearchParams(k=10, nprobe=6))
    np.testing.assert_array_equal(np.asarray(res_auto.ids),
                                  np.asarray(res_fixed.ids))
    np.testing.assert_array_equal(np.asarray(res_dense.ids),
                                  np.asarray(res_fixed.ids))
    assert res_auto.timing_info.partitions_scanned == 6
    assert res_dense.timing_info.partitions_scanned == 6

    # Explicit masked mode still runs per-query plans (scanned counts are
    # per-query, not pinned to the clip width).
    res_loop = idx.search(q, SearchParams(k=10, recall_target=0.9,
                                          aps_mode="loop"))
    assert res_loop.ids.shape == (32, 10)

    # Reference capped-candidate semantics: an explicit fraction disables
    # the dense route (plans stay capped by the candidate set).
    res_frac = idx.search(q, SearchParams(k=10, recall_target=0.9,
                                          initial_search_fraction=2 / 32))
    assert res_frac.timing_info.partitions_scanned <= 2

    # A target above the calibrated one cannot inherit the gate's
    # adherence — it falls through to the per-query-plan modes (which
    # extend plans for the higher target: scanned exceeds the clip).
    res_hi = idx.search(q, SearchParams(k=10, recall_target=0.97))
    assert res_hi.timing_info.partitions_scanned > 6

    # width_clip alone (budget-calibrated, no membership width) also keys
    # the route.
    idx.aps_dense_w = 0
    idx.aps_width_clip = 6
    res_wc = idx.search(q, SearchParams(k=10, recall_target=0.9))
    np.testing.assert_array_equal(np.asarray(res_wc.ids),
                                  np.asarray(res_fixed.ids))

    idx.aps_width_clip = idx.aps_budget_w = 0
    idx.aps_calib_target = 0.0


def test_aps_entrypoint_flags_are_static():
    """Every boolean/int flag that gates Python-level control flow inside
    the jitted search entry points must be in static_argnames — a traced
    `exact` compiles fine on the xla backend (which ignores it) but breaks
    the Pallas dispatch on TPU (round-4 sharded-parity run caught exactly
    that on aps_search_oneshot)."""
    import quake_tpu.coordinator as C

    expect = {
        C.aps_search: {"exact", "kernel", "qt"},
        C.aps_search_planned: {"exact", "kernel", "qt", "plan_margin"},
        C.aps_search_oneshot: {"exact", "kernel", "qt", "plan_margin",
                               "width_clip", "budget_w"},
        C.fused_ivf_search: {"exact", "kernel", "qt", "dedup"},
    }
    for fn, names in expect.items():
        static = set(fn._jit_info.static_argnames)
        missing = names - static
        assert not missing, (fn, missing)


def test_auto_width_coarse_nlist_adherence():
    """Round-4 regression: with the default (auto) initial_search_fraction
    the APS candidate width must come from calibration, not a fixed
    fraction of nlist — at coarse nlist the reference's 0.02 default
    (common.h:81) hands APS a candidate matrix plans cannot extend past
    (measured 0.78 achieved @ target 0.9 with W=5 at nlist=256 on the 1M
    bench corpus, experiments/aps_v11b_ab). Uses clustered data at an
    nlist where 0.02*nlist rounds to ZERO partitions."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((64, 32)).astype(np.float32) * 3.0
    assign = rng.integers(0, 64, 20000)
    x = (centers[assign] + rng.standard_normal((20000, 32))).astype(np.float32)
    ids = np.arange(20000, dtype=np.int64)
    q = (centers[rng.integers(0, 64, 128)]
         + rng.standard_normal((128, 32))).astype(np.float32)
    gt, _ = knn(q, x, 10, "l2")

    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=16, metric="l2"))
    assert idx.aps_plan_width > 0  # calibration recorded a serving width
    # 0.02 * 16 -> 0 partitions: the fraction default would starve the
    # candidate set entirely (min_parts floor leaves ~1).
    res = idx.search(q, SearchParams(k=10, recall_target=0.9))
    rec = compute_recall(res.ids, gt, 10)
    # Round 4: calibration also records the membership-validated dense
    # width, and auto serving scans exactly that prefix.
    if idx.aps_dense_w:
        assert res.timing_info.partitions_scanned == min(idx.aps_dense_w, 16)
    assert rec >= 0.9, rec
    # An explicit fraction still reproduces the reference's capped
    # semantics verbatim: one candidate partition caps recall well below
    # the target.
    res_cap = idx.search(q, SearchParams(k=10, recall_target=0.9,
                                         initial_search_fraction=1 / 16))
    assert res_cap.timing_info.partitions_scanned <= 1


def test_smallbatch_auto_adherence_bench_nlist():
    """Round-5 (VERDICT r4 #1): auto-mode recall-target serving must adhere
    at LATENCY-regime batches (B=1 and B=64) at a bench-like partition count
    (nlist=160, the production 1M operating point since nlist_sweep7; TPU
    artifacts at both 192 and 160 in experiments/r5_runs/) — the round-4
    artifacts measured 0.85 @ B=1 because auto routed small batches to the masked
    while-loop; round 5 routes every calibrated auto request to the dense
    calibrated-prefix program (index.py dense-prefix route), whose width is
    gated on a 95% lower confidence bound >= target. Reference floor:
    achieved >= target (test/cpp/search_recall_tests.cpp:284-339).

    Batch size must not change results (the dense program is per-query):
    B=1 and B=64 issuance over the same query set must agree exactly."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((512, 48)).astype(np.float32) * 2.0
    assign = rng.integers(0, 512, 60000)
    x = (centers[assign] + rng.standard_normal((60000, 48))).astype(np.float32)
    ids = np.arange(60000, dtype=np.int64)
    nq = 512
    q = (centers[rng.integers(0, 512, nq)]
         + rng.standard_normal((nq, 48))).astype(np.float32)
    gt, _ = knn(q, x, 10, "l2")

    idx = QuakeIndex()
    idx.build(x, ids, IndexBuildParams(nlist=160, metric="l2"))
    assert idx.aps_dense_w or idx.aps_width_clip  # calibration gated a width

    sp = SearchParams(k=10, recall_target=0.9)
    ids_b64 = np.concatenate(
        [idx.search(q[i:i + 64], sp).ids for i in range(0, nq, 64)])
    rec64 = compute_recall(ids_b64, gt, 10)
    assert rec64 >= 0.9, rec64

    ids_b1 = np.concatenate(
        [idx.search(q[i:i + 1], sp).ids for i in range(0, 64)])
    # Exact agreement with the first 64 rows of the B=64 issuance: the
    # dense program's per-query results are batch-size independent.
    assert np.array_equal(ids_b1, ids_b64[:64])


def test_aps_serving_constants_are_cached():
    """Round-5 (VERDICT r4 #2): the masked-APS band was per-dispatch
    host->device transfers — jnp.float32 scalars and the 4KB beta table
    created FRESH on every search call (~0.3 ms pipeline stall each
    through the tunnel; oneshot serving 6.95 -> 1.40 ms at B=64 once
    cached, r5_runs/aps_band_bisect.out). Gate the cache identity so a
    refactor can't silently reintroduce the band."""
    from quake_tpu import IndexBuildParams, QuakeIndex
    from quake_tpu.geometry import beta_table

    assert beta_table(64, "l2") is beta_table(64, "l2")

    idx = QuakeIndex()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2000, 16)).astype(np.float32)
    idx.build(x, np.arange(2000, dtype=np.int64),
              IndexBuildParams(nlist=8, calibrate_aps=False))
    assert idx._dev_f32(0.9) is idx._dev_f32(0.9)
    assert float(idx._dev_f32(0.9)) == np.float32(0.9)


def test_auto_above_calib_serves_widest_calibrated_reach():
    """Round-5: auto-mode targets ABOVE the calibrated one serve a dense
    scan of the width_clip prefix — a recall SUPERSET of every clipped
    oneshot plan (plans cap at width_clip ranks), at lower measured cost
    (aps_band_bisect_b8192: dense-24 8.9 ms vs masked-mean-12 11.5 ms at
    B=8192). Pinned oneshot keeps per-query plans."""
    from quake_tpu import IndexBuildParams, QuakeIndex, SearchParams
    from quake_tpu.utils import compute_recall, knn

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((64, 32)).astype(np.float32) * 3.0
    x = (centers[rng.integers(0, 64, 30_000)]
         + rng.standard_normal((30_000, 32))).astype(np.float32)
    q = (centers[rng.integers(0, 64, 64)]
         + rng.standard_normal((64, 32))).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(30_000, dtype=np.int64), IndexBuildParams(nlist=64))
    # The CPU suite serves the xla kernel, where budget calibration is
    # gated off — install the routing state manually (backend-independent;
    # TPU builds set it in calibrate_aps).
    idx.aps_width_clip = 16
    if idx.aps_radius_ab is None:
        idx.aps_radius_ab = np.tile(np.array([[0.5, 1.0]], np.float32),
                                    (100, 1))
        idx.aps_oneshot_mcap = 16
    gt, _ = knn(q, x, 10, "l2")

    target = min(0.99, idx.aps_calib_target + 0.05)
    res_auto = idx.search(q, SearchParams(k=10, recall_target=target))
    assert res_auto.timing_info.partitions_scanned == min(
        idx.aps_width_clip, idx.nlist())
    res_one = idx.search(q, SearchParams(k=10, recall_target=target,
                                         aps_mode="oneshot"))
    r_auto = compute_recall(res_auto.ids, gt, 10)
    r_one = compute_recall(res_one.ids, gt, 10)
    # Dense-at-clip scans a superset of every clipped plan.
    assert r_auto >= r_one - 1e-9, (r_auto, r_one)
