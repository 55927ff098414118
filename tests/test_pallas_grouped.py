"""Pallas grouped-scan kernel: interpret-mode parity with the XLA backend
(compiled-mode parity is exercised on real TPU by bench/driver runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quake_tpu.ops.grouped import grouped_scan_xla
from quake_tpu.ops.pallas_grouped import grouped_scan_pallas, grouped_scan_pallas_approx


@pytest.mark.parametrize("variant", [grouped_scan_pallas, grouped_scan_pallas_approx])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_pallas_interpret_matches_xla(metric, variant):
    rng = np.random.default_rng(0)
    P, C, D, B, nprobe, k, qt = 8, 128, 16, 12, 3, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    for p in range(P):
        ids[p, rng.integers(C // 2, C + 1):] = -1
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = rng.integers(0, P, (B, nprobe)).astype(np.int32)
    pids[0, 1:] = -1

    s1, i1, n1 = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=4,
    )
    s2, i2, n2 = variant(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    for b in range(B):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_sized_kernel_interpret_matches_xla(metric):
    """Size-aware variant: parity + never reads padded slots (poisoned)."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_sized

    rng = np.random.default_rng(1)
    P, C, D, B, nprobe, k, qt, ct = 8, 128, 16, 12, 3, 5, 8, 32
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.zeros(P, np.int32)
    for p in range(P):
        sizes[p] = rng.integers(1, C + 1)
        ids[p, sizes[p]:] = -1
        codes[p, sizes[p]:] = 999.0  # poison: pads must never be read
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = rng.integers(0, P, (B, nprobe)).astype(np.int32)

    clean = codes.copy()
    for p in range(P):
        clean[p, sizes[p]:] = 0.0
    s1, i1, _ = grouped_scan_xla(
        jnp.asarray(clean), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=4,
    )
    s2, i2, _ = grouped_scan_pallas_sized(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(q), jnp.asarray(pids), k, metric, qt=qt, ct=ct,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
    for b in range(B):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())


@pytest.mark.parametrize("variant_name", ["v3", "v3p", "v3p2"])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_v3_kernels_interpret_match_xla(metric, variant_name):
    """v3 (slot selection + cached norms + size masking), v3p (float-packed
    selection + exact rescore), and v3p2 (two groups per grid step): parity
    with the XLA backend, including poisoned pad slots that must never
    surface."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v3,
        grouped_scan_pallas_v3p,
        grouped_scan_pallas_v3p2,
    )

    variant = {
        "v3": grouped_scan_pallas_v3,
        "v3p": grouped_scan_pallas_v3p,
        "v3p2": grouped_scan_pallas_v3p2,
    }[variant_name]
    rng = np.random.default_rng(2)
    P, C, D, B, nprobe, k, qt = 8, 128, 16, 12, 3, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.zeros(P, np.int32)
    for p in range(P):
        sizes[p] = rng.integers(1, C + 1)
        ids[p, sizes[p]:] = -1
        codes[p, sizes[p]:] = 10.0  # poison: pads must never surface
    norms = (codes.astype(np.float32) ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = rng.integers(0, P, (B, nprobe)).astype(np.int32)
    pids[0, 1:] = -1

    clean = codes.copy()
    for p in range(P):
        clean[p, sizes[p]:] = 0.0
    s1, i1, n1 = grouped_scan_xla(
        jnp.asarray(clean), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=4,
    )
    s2, i2, n2 = variant(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    for b in range(B):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_packed_kernel_interpret_matches_xla(metric):
    """Packed-selection variant: parity incl. stale-pad masking and exact
    final rescoring."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_packed

    rng = np.random.default_rng(0)
    P, C, D, B, nprobe, k, qt = 8, 128, 16, 12, 3, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    for p in range(P):
        sz = rng.integers(C // 2, C + 1)
        ids[p, sz:] = -1
        codes[p, sz:] = 10.0  # stale rows that would rank high if unmasked
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = rng.integers(0, P, (B, nprobe)).astype(np.int32)
    pids[0, 1:] = -1

    s1, i1, n1 = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=4,
    )
    s2, i2, n2 = grouped_scan_pallas_packed(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)
    for b in range(B):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_multi_kernel_interpret_matches_xla(metric):
    """Multi-group manual-DMA variant: parity incl. stale-pad masking."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_multi

    rng = np.random.default_rng(0)
    P, C, D, B, nprobe, k, qt = 8, 128, 16, 12, 3, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    for p in range(P):
        sz = rng.integers(C // 2, C + 1)
        ids[p, sz:] = -1
        codes[p, sz:] = 10.0  # stale rows that would rank top if unmasked
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = rng.integers(0, P, (B, nprobe)).astype(np.int32)
    pids[0, 1:] = -1

    s1, i1, n1 = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=4,
    )
    s2, i2, n2 = grouped_scan_pallas_multi(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, gb=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
    for b in range(B):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())


@pytest.mark.parametrize("variant_name", ["v3p4_skip", "v4_ct32", "v4_ct64"])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_v4_kernels_interpret_match_xla(metric, variant_name):
    """Ghost-skip v3pn and the size-aware chunked v4 kernel: parity with the
    XLA backend, including poisoned pads, empty partitions (size 0, whose
    chunk-groups must not exist), and ghost-tail masking in the epilogue."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v3pn,
        grouped_scan_pallas_v4,
    )

    rng = np.random.default_rng(4)
    P, C, D, B, nprobe, k, qt = 8, 128, 16, 12, 3, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.zeros(P, np.int32)
    for p in range(P):
        sizes[p] = rng.integers(0, C + 1)  # include empty partitions
        ids[p, sizes[p]:] = -1
        codes[p, sizes[p]:] = 10.0  # poison: pads must never surface
    norms = (codes.astype(np.float32) ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = rng.integers(0, P, (B, nprobe)).astype(np.int32)
    pids[0, 1:] = -1

    clean = codes.copy()
    for p in range(P):
        clean[p, sizes[p]:] = 0.0
    s1, i1, n1 = grouped_scan_xla(
        jnp.asarray(clean), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=4,
    )
    args = (
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, metric,
    )
    if variant_name == "v3p4_skip":
        s2, i2, n2 = grouped_scan_pallas_v3pn(
            *args, qt=qt, gpb=4, skip=True, interpret=True)
    else:
        ct = int(variant_name.split("_ct")[1])
        s2, i2, n2 = grouped_scan_pallas_v4(
            *args, qt=qt, ct=ct, gpb=3, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    for b in range(B):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_dedup_spilled_store(metric):
    """Spilled store: each vector resident in TWO partitions. With
    dedup=True the top-k must contain each id at most once and match a
    brute-force oracle over the probed partitions' distinct vectors."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v3pn

    rng = np.random.default_rng(5)
    P, C, D, B, k, qt = 6, 64, 16, 8, 5, 8
    nvec = P * C // 4
    vecs = rng.standard_normal((nvec, D)).astype(np.float32)
    a1 = rng.integers(0, P, nvec)
    a2 = (a1 + 1 + rng.integers(0, P - 1, nvec)) % P  # different partition
    codes = np.zeros((P, C, D), np.float32)
    ids = np.full((P, C), -1, np.int32)
    sizes = np.zeros(P, np.int32)
    for v in range(nvec):
        for p in (a1[v], a2[v]):
            codes[p, sizes[p]] = vecs[v]
            ids[p, sizes[p]] = v
            sizes[p] += 1
    norms = (codes ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = np.stack([rng.permutation(P)[:4] for _ in range(B)]).astype(np.int32)

    s2, i2, _ = grouped_scan_pallas_v3pn(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, metric,
        qt=qt, gpb=2, dedup=True, interpret=True)
    s3, i3, _ = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q),
        jnp.asarray(pids), k, metric, qt=qt, group_chunk=4,
        norms=jnp.asarray(norms), dedup=True)
    i2, i3 = np.asarray(i2), np.asarray(i3)
    for b in range(B):
        # no duplicates among valid ids
        valid = i2[b][i2[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
        # oracle: distinct vectors in probed partitions
        cand = set()
        for p in pids[b]:
            cand.update(ids[p, :sizes[p]].tolist())
        cand = np.array(sorted(cand))
        if metric == "l2":
            d2 = ((vecs[cand] - q[b]) ** 2).sum(1)
            want = cand[np.argsort(d2)[:k]]
        else:
            want = cand[np.argsort(-(vecs[cand] @ q[b]))[:k]]
        assert set(valid.tolist()) == set(want.tolist()), b
        assert set(i3[b][i3[b] >= 0].tolist()) == set(want.tolist()), b


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_v5_kernel_interpret_matches_xla(metric):
    """v5 (size-aware chunks + in-kernel cross-chunk merge) and v6 (chunked
    fetch, single selection): parity with the XLA backend incl. poisoned
    pads and empty partitions."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v5,
        grouped_scan_pallas_v6,
    )

    rng = np.random.default_rng(6)
    P, C, D, B, nprobe, k, qt, ct = 8, 128, 16, 12, 3, 5, 8, 32
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.zeros(P, np.int32)
    for p in range(P):
        sizes[p] = rng.integers(0, C + 1)
        ids[p, sizes[p]:] = -1
        codes[p, sizes[p]:] = 10.0  # poison
    norms = (codes.astype(np.float32) ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = rng.integers(0, P, (B, nprobe)).astype(np.int32)
    pids[0, 1:] = -1

    clean = codes.copy()
    for p in range(P):
        clean[p, sizes[p]:] = 0.0
    s1, i1, n1 = grouped_scan_xla(
        jnp.asarray(clean), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, metric, qt=qt, group_chunk=4,
    )
    for variant in (grouped_scan_pallas_v5, grouped_scan_pallas_v6):
        s2, i2, n2 = variant(
            jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
            jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, metric,
            qt=qt, ct=ct, gpb=3, interpret=True)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        for b in range(B):
            assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())
