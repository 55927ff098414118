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
