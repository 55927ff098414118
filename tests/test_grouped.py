"""Partition-major grouped scan tests: parity with the query-major path."""

import jax.numpy as jnp
import numpy as np
import pytest

from quake_tpu.ops.grouped import build_groups, grouped_scan_xla
from quake_tpu.ops.scan import ivf_scan


def make_store(P=16, C=64, D=8, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    # Make sizes ragged: invalidate a tail per partition.
    sizes = rng.integers(C // 2, C + 1, P)
    for p in range(P):
        ids[p, sizes[p]:] = -1
    return codes, ids


def test_build_groups_roundtrip():
    rng = np.random.default_rng(1)
    B, nprobe, nlist, qt = 32, 4, 16, 8
    pids = rng.integers(0, nlist, (B, nprobe)).astype(np.int32)
    pids[0, 2:] = -1  # some pads
    group_pid, qlist, pair_group, pair_slot = build_groups(
        jnp.asarray(pids), nlist, qt
    )
    group_pid = np.asarray(group_pid)
    qlist = np.asarray(qlist)
    pair_group = np.asarray(pair_group)
    pair_slot = np.asarray(pair_slot)
    # Every valid (q, p) pair is stored where pair_group/slot say, with the
    # right partition.
    for b in range(B):
        for r in range(nprobe):
            if pids[b, r] < 0:
                assert pair_group[b, r] == -1
                continue
            g, s = pair_group[b, r], pair_slot[b, r]
            assert group_pid[g] == pids[b, r]
            assert qlist[g, s] == b
    # No group has more than qt entries; no two pairs share a (g, s).
    taken = set()
    for b in range(B):
        for r in range(nprobe):
            if pids[b, r] >= 0:
                key = (int(pair_group[b, r]), int(pair_slot[b, r]))
                assert key not in taken
                taken.add(key)


def test_build_groups_scatter_matches_build_groups():
    """build_groups_scatter's tgt is the flat pair index of each kernel row:
    scattering row (g, t) to tgt[g, t] must land exactly where the inverse
    permutation (pair_group, pair_slot) of build_groups points."""
    from quake_tpu.ops.grouped import build_groups_scatter

    rng = np.random.default_rng(3)
    B, nprobe, nlist, qt = 32, 4, 16, 8
    pids = rng.integers(0, nlist, (B, nprobe)).astype(np.int32)
    pids[0, 2:] = -1
    pids[5, :] = -1
    gp1, ql1, pair_group, pair_slot = build_groups(jnp.asarray(pids), nlist, qt)
    gp2, ql2, tgt = build_groups_scatter(jnp.asarray(pids), nlist, qt)
    np.testing.assert_array_equal(np.asarray(gp1), np.asarray(gp2))
    np.testing.assert_array_equal(np.asarray(ql1), np.asarray(ql2))
    tgt = np.asarray(tgt)
    pair_group = np.asarray(pair_group)
    pair_slot = np.asarray(pair_slot)
    n = B * nprobe
    for b in range(B):
        for r in range(nprobe):
            if pids[b, r] < 0:
                continue
            g, s = pair_group[b, r], pair_slot[b, r]
            assert tgt[g, s] == b * nprobe + r
    # every invalid kernel row targets the discard slot
    valid_targets = tgt[tgt < n]
    assert len(valid_targets) == len(set(valid_targets.tolist()))
    assert (tgt[np.asarray(ql2) < 0] == n).all()


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("qt", [4, 64])
def test_grouped_matches_query_major(metric, qt):
    codes, ids = make_store()
    rng = np.random.default_rng(2)
    B, nprobe, k = 24, 5, 10
    q = rng.standard_normal((B, 8)).astype(np.float32)
    pids = rng.integers(0, 16, (B, nprobe)).astype(np.int32)
    pids[3, 1:] = -1

    s1, i1, n1 = ivf_scan(
        jnp.asarray(q), jnp.asarray(pids), jnp.asarray(codes), jnp.asarray(ids),
        None, k, metric,
    )
    s2, i2, n2 = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=8,
    )
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
    # ids may differ on exact ties; compare sets per query
    i1, i2 = np.asarray(i1), np.asarray(i2)
    for b in range(B):
        assert set(i1[b].tolist()) == set(i2[b].tolist())


def test_grouped_duplicate_probes_one_query():
    """A query probing the same partition twice must not duplicate results
    incorrectly (degenerate but allowed input)."""
    codes, ids = make_store(P=4, C=16, D=4)
    q = np.random.default_rng(3).standard_normal((2, 4)).astype(np.float32)
    pids = np.array([[0, 0, 1, -1], [2, 2, 2, 2]], dtype=np.int32)
    s, i, n = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        5, "l2", qt=4, group_chunk=4,
    )
    i = np.asarray(i)
    # Results come only from probed partitions.
    assert set(i[0][i[0] >= 0]) <= set(ids[0][ids[0] >= 0]) | set(ids[1][ids[1] >= 0])
    assert set(i[1][i[1] >= 0]) <= set(ids[2][ids[2] >= 0])


def test_grouped_overflow_partition():
    """One partition probed by more queries than QT spans multiple groups."""
    codes, ids = make_store(P=4, C=32, D=4)
    B = 40
    q = np.random.default_rng(4).standard_normal((B, 4)).astype(np.float32)
    pids = np.zeros((B, 1), dtype=np.int32)  # everyone probes partition 0
    s, i, n = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        3, "l2", qt=8, group_chunk=4,
    )
    s1, i1, _ = ivf_scan(
        jnp.asarray(q), jnp.asarray(pids), jnp.asarray(codes), jnp.asarray(ids),
        None, 3, "l2",
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(s1), rtol=1e-5, atol=1e-5)


def test_grouped_k_exceeds_candidates():
    """k > nprobe*partition_size pads with -1/-inf (reference convention)."""
    codes, ids = make_store(P=4, C=16, D=4)
    ids[:, 4:] = -1  # only 4 valid per partition
    q = np.random.default_rng(5).standard_normal((18, 4)).astype(np.float32)
    pids = np.zeros((18, 1), dtype=np.int32)  # one partition, 4 candidates
    s, i, n = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        10, "l2", qt=4, group_chunk=4,
    )
    i = np.asarray(i)
    assert i.shape == (18, 10)
    assert (i[:, 4:] == -1).all()
    assert (i[:, :4] >= 0).all()


def test_build_groups_budget_covers_all_valid_pairs():
    """build_groups_budget (flat-pair-list grouping, VERDICT r3 #4): with a
    budget >= the valid-pair count, every valid (query, probe) pair owns
    exactly one kernel row, grouped under its partition; discard rows
    target n = B*M."""
    from quake_tpu.ops.grouped import (build_groups_budget,
                                       build_groups_scatter, budget_layout)

    rng = np.random.default_rng(3)
    P, B, M, qt = 24, 32, 10, 4
    base = np.stack([rng.choice(P, M, replace=False) for _ in range(B)])
    n_b = rng.integers(1, M + 1, B)
    lane = np.arange(M)[None, :]
    pids = np.where(lane < n_b[:, None], base, -1).astype(np.int32)
    n_valid = int((pids >= 0).sum())
    n = B * M
    for bud in (n_valid, ((n_valid + qt - 1) // qt) * qt, n):
        gp, ql, tgt = build_groups_budget(jnp.asarray(pids), P, qt, bud)
        gp, ql, tgt = np.asarray(gp), np.asarray(ql), np.asarray(tgt)
        assert gp.shape[0] == budget_layout(min(bud, n), P, qt)
        seen = tgt[tgt < n]
        assert len(seen) == n_valid and len(set(seen.tolist())) == n_valid
        for g in range(gp.shape[0]):
            for t in range(qt):
                pair = tgt[g, t]
                if pair < n:
                    b, j = pair // M, pair % M
                    assert pids[b, j] == gp[g], (g, t, pair)
                    assert ql[g, t] == b
                else:
                    assert ql[g, t] == -1
    # Dense input with full budget reproduces build_groups_scatter exactly.
    dense = base.astype(np.int32)
    gp0, ql0, tg0 = build_groups_scatter(jnp.asarray(dense), P, qt)
    gp1, ql1, tg1 = build_groups_budget(jnp.asarray(dense), P, qt, n)
    gmax = min(gp0.shape[0], gp1.shape[0])
    np.testing.assert_array_equal(np.asarray(gp0)[:gmax], np.asarray(gp1)[:gmax])
    np.testing.assert_array_equal(np.asarray(tg0)[:gmax], np.asarray(tg1)[:gmax])


def test_grouped_scan_budget_dispatch_placement(monkeypatch):
    """coordinator.grouped_scan routing for budgeted masked scans: a v11
    kernel request picks the SORTED placement (v11b) when the uint32 sort
    key fits, a v10 request (or an overflowing key) rides the scatter, and
    the pair budget is forwarded verbatim."""
    import quake_tpu.ops.pallas_grouped as pg
    from quake_tpu.coordinator import grouped_scan

    rng = np.random.default_rng(5)
    P, C, D, B, M, k = 16, 128, 8, 8, 6, 3
    codes = jnp.asarray(rng.standard_normal((P, C, D)).astype(np.float32))
    ids = jnp.asarray(np.arange(P * C, dtype=np.int32).reshape(P, C))
    sizes = jnp.asarray(np.full(P, C, np.int32))
    norms = jnp.sum(codes ** 2, axis=2)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(np.stack(
        [rng.choice(P, M, replace=False) for _ in range(B)]).astype(np.int32))

    calls = {}

    def fake_v10b(*args, **kw):
        calls.update(kw)
        Bq = args[4].shape[0]
        return (jnp.zeros((Bq, k), jnp.float32),
                jnp.full((Bq, k), -1, jnp.int32),
                jnp.zeros((Bq,), jnp.int32))

    monkeypatch.setattr(pg, "grouped_scan_pallas_v10b", fake_v10b)
    grouped_scan(codes, ids, sizes, norms, q, pids, k, "l2", 8, 64,
                 "v11g4", dense=False, pair_budget=32)
    assert calls["placement"] == "sorted" and calls["pair_budget"] == 32

    calls.clear()
    grouped_scan(codes, ids, sizes, norms, q, pids, k, "l2", 8, 64,
                 "v10g4", dense=False, pair_budget=32)
    assert calls["placement"] == "scatter"

    # dense=True or pair_budget=0 must NOT take the budgeted branch
    # (monkeypatched fake would corrupt results; dense v11 handles it).
    calls.clear()
    s, i, c = grouped_scan(codes, ids, sizes, norms, q, pids, k, "l2", 8,
                           64, "xla", dense=False, pair_budget=32)
    assert not calls and int(np.asarray(c).sum()) == B * M


def test_grouped_scan_v11_overflow_dispatch(monkeypatch):
    """When the v11 packed uint32 sort key would overflow (10M-scale
    shapes), the dense dispatch routes to v11 placement="argsort" by
    default (tenm_cliff: 2x over the scatter at the 10M shape) and to the
    v10 row scatter under QUAKE_TPU_V11_OVERFLOW=v10."""
    import quake_tpu.ops.grouped as og
    import quake_tpu.ops.pallas_grouped as pg
    from quake_tpu.coordinator import grouped_scan

    rng = np.random.default_rng(7)
    P, C, D, B, M, k = 16, 128, 8, 8, 6, 3
    codes = jnp.asarray(rng.standard_normal((P, C, D)).astype(np.float32))
    ids = jnp.asarray(np.arange(P * C, dtype=np.int32).reshape(P, C))
    sizes = jnp.asarray(np.full(P, C, np.int32))
    norms = jnp.sum(codes ** 2, axis=2)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    pids = jnp.asarray(np.stack(
        [rng.choice(P, M, replace=False) for _ in range(B)]).astype(np.int32))

    seen = {}

    def fake(name):
        def _f(*args, **kw):
            seen["name"], seen["placement"] = name, kw.get("placement")
            Bq = args[4].shape[0]
            return (jnp.zeros((Bq, k), jnp.float32),
                    jnp.full((Bq, k), -1, jnp.int32),
                    jnp.zeros((Bq,), jnp.int32))
        return _f

    monkeypatch.setattr(pg, "grouped_scan_pallas_v10", fake("v10"))
    monkeypatch.setattr(pg, "grouped_scan_pallas_v11", fake("v11"))
    # Force the overflow branch regardless of the tiny test shapes (B=8
    # only contributes 3 query bits, so the fake rows must carry 29+).
    monkeypatch.setattr(og, "group_layout", lambda *a: 1 << 40)

    monkeypatch.delenv("QUAKE_TPU_V11_OVERFLOW", raising=False)
    grouped_scan(codes, ids, sizes, norms, q, pids, k, "l2", 8, 64,
                 "v11g4", dense=True)
    assert seen == {"name": "v11", "placement": "argsort"}

    monkeypatch.setenv("QUAKE_TPU_V11_OVERFLOW", "v10")
    seen.clear()
    grouped_scan(codes, ids, sizes, norms, q, pids, k, "l2", 8, 64,
                 "v11g4", dense=True)
    assert seen["name"] == "v10"

    # A fitting key keeps the sorted placement.
    monkeypatch.setattr(og, "group_layout", lambda *a: 8)
    seen.clear()
    grouped_scan(codes, ids, sizes, norms, q, pids, k, "l2", 8, 64,
                 "v11g4", dense=True)
    assert seen == {"name": "v11", "placement": "sorted"}
