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


@pytest.mark.parametrize("C", [128, 256])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_v7_kernel_interpret_matches_xla(metric, C):
    """v7 column-folded max2 selection: at S = C/fold <= 2 every fold-column
    holds <= 2 lanes, so max2 capture is lossless and parity must be EXACT
    (incl. poisoned pads, empty partitions, ghost-tail masking)."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v7

    rng = np.random.default_rng(7)
    P, D, B, nprobe, k, qt = 8, 16, 12, 3, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.zeros(P, np.int32)
    for p in range(P):
        sizes[p] = rng.integers(0, C + 1)
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
    s2, i2, n2 = grouped_scan_pallas_v7(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, metric,
        qt=qt, gpb=3, fold=128, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    for b in range(B):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i2)[b].tolist())


def test_v7_s3_overlap_and_exact_scores():
    """At S=3 a fold-column can hold 3 lanes, so v7 may drop a candidate when
    >= 3 of a row's top-k collide in one column (~0.7% of rows). Returned
    candidates must still carry EXACT scores (rescore epilogue) and overlap
    the exact top-k in >= k-1 positions per row."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v7

    rng = np.random.default_rng(8)
    P, C, D, B, nprobe, k, qt = 8, 384, 16, 32, 4, 8, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.full(P, C, np.int32)
    norms = (codes.astype(np.float32) ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = np.stack(
        [rng.permutation(P)[:nprobe] for _ in range(B)]
    ).astype(np.int32)

    s1, i1, _ = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, "l2", qt=qt, group_chunk=4,
    )
    s2, i2, _ = grouped_scan_pallas_v7(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "l2",
        qt=qt, gpb=3, fold=128, interpret=True)
    i1, i2 = np.asarray(i1), np.asarray(i2)
    s1, s2 = np.asarray(s1), np.asarray(s2)
    total_overlap = 0
    for b in range(B):
        ov = len(set(i1[b].tolist()) & set(i2[b].tolist()))
        assert ov >= k - 1, (b, i1[b], i2[b])
        total_overlap += ov
        # scores of returned ids are exact
        exact = {i: s for i, s in zip(i1[b], s1[b])}
        for i, s in zip(i2[b], s2[b]):
            if i in exact:
                np.testing.assert_allclose(s, exact[i], rtol=1e-4, atol=1e-4)
    assert total_overlap >= B * k * 0.97


def test_v7_dedup_spilled():
    """v7 with dedup: no duplicate ids in results from a spilled layout."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v7

    rng = np.random.default_rng(9)
    P, C, D, B, k, qt = 6, 128, 16, 8, 5, 8
    nvec = P * C // 4
    vecs = rng.standard_normal((nvec, D)).astype(np.float32)
    a1 = rng.integers(0, P, nvec)
    a2 = (a1 + 1 + rng.integers(0, P - 1, nvec)) % P
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

    _, i2, _ = grouped_scan_pallas_v7(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "l2",
        qt=qt, gpb=2, dedup=True, interpret=True)
    i2 = np.asarray(i2)
    for b in range(B):
        valid = i2[b][i2[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))


def test_v11_duplicate_pids_dense():
    """v11 with duplicate pids inside a probe row (legal under the grouped
    contract even though parent ranking never emits them): each duplicate
    pair owns its own kernel row, the sorted placement keeps both, and the
    per-query ascending pid sort attributes winners correctly — results
    must match the xla oracle on the same probe lists."""
    from quake_tpu.ops.grouped import grouped_scan_xla
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v11

    rng = np.random.default_rng(23)
    P, C, D, B, nprobe, k, qt = 8, 128, 16, 12, 4, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.full(P, C, np.int32)
    norms = (codes ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = np.stack([rng.permutation(P)[:nprobe] for _ in range(B)]).astype(np.int32)
    pids[:, 1] = pids[:, 0]  # every query probes its first partition twice

    s1, i1, n1 = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q),
        jnp.asarray(pids), k, "l2", qt=qt, group_chunk=4)
    s2, i2, n2 = grouped_scan_pallas_v11(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "l2",
        qt=qt, gpb=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    i1, i2 = np.asarray(i1), np.asarray(i2)
    for b in range(B):
        # Duplicate probes legitimately surface duplicate ids (no dedup
        # requested), so compare distinct-id sets, tolerating one
        # quantization-tie swap.
        s1b, s2b = set(i1[b].tolist()), set(i2[b].tolist())
        assert len(s1b & s2b) >= len(s1b) - 1, (b, i1[b], i2[b])


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("exact", [True, False])
def test_v11_argsort_placement_matches_v10(metric, exact):
    """placement="argsort" (the no-bit-budget epilogue for 10M-scale shapes
    where the packed uint32 sort key overflows): argsort(tgt)[:n] lands the
    pool in PROBE order — identical placement to the v10 row scatter — so
    scores AND ids must match v10 EXACTLY (same kernel, same pool order,
    same _pool_tail), including ghost (size-0) partitions, partial fills,
    and duplicate pids inside a probe row."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v10,
        grouped_scan_pallas_v11,
    )

    rng = np.random.default_rng(31)
    P, C, D, B, nprobe, k, qt = 8, 128, 16, 12, 4, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.full(P, C, np.int32)
    sizes[2] = 0          # ghost partition: rows keep slots, values masked
    sizes[5] = 17         # partial fill
    for p in range(P):
        ids[p, sizes[p]:] = -1
        codes[p, sizes[p]:] = 10.0  # poison
    norms = (codes ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = np.stack([rng.permutation(P)[:nprobe] for _ in range(B)]).astype(np.int32)
    pids[0, 1] = pids[0, 0]  # duplicate probe

    args = (jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
            jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, metric)
    s1, i1, n1 = grouped_scan_pallas_v10(
        *args, qt=qt, gpb=2, interpret=True, exact=exact)
    s2, i2, n2 = grouped_scan_pallas_v11(
        *args, qt=qt, gpb=2, interpret=True, exact=exact,
        placement="argsort")
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("variant_name", ["v10", "v11"])
def test_v10_dedup_spilled(variant_name):
    """v10 (scatter epilogue) / v11 (sorted placement) with dedup:
    pool-side refs are rebuilt from (pid columns, packed slot) instead of
    pair-gathered — no duplicate ids may surface from a spilled layout, and
    results must match the oracle over the probed partitions' distinct
    vectors."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v10,
        grouped_scan_pallas_v11,
    )

    variant = {"v10": grouped_scan_pallas_v10,
               "v11": grouped_scan_pallas_v11}[variant_name]
    rng = np.random.default_rng(9)
    P, C, D, B, k, qt = 6, 128, 16, 8, 5, 8
    nvec = P * C // 4
    vecs = rng.standard_normal((nvec, D)).astype(np.float32)
    a1 = rng.integers(0, P, nvec)
    a2 = (a1 + 1 + rng.integers(0, P - 1, nvec)) % P
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

    _, i2, _ = variant(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "l2",
        qt=qt, gpb=2, dedup=True, interpret=True)
    i2 = np.asarray(i2)
    for b in range(B):
        valid = i2[b][i2[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
        cand = set()
        for p in pids[b]:
            cand.update(ids[p, :sizes[p]].tolist())
        cand.discard(-1)
        cand = np.array(sorted(cand))
        d2 = ((vecs[cand] - q[b]) ** 2).sum(1)
        want = set(cand[np.argsort(d2)[:k]].tolist())
        assert len(want & set(valid.tolist())) >= k - 1, (b, valid, want)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_parent_rank_pallas_matches_exact(metric):
    """Pallas parent ranking: candidate sets match exact top-nprobe ranking
    (quantized-order kernel; allow <= 1 boundary swap per row)."""
    from quake_tpu.ops.pallas_flat import parent_rank_pallas

    rng = np.random.default_rng(10)
    Pp, Cp, D, B, nprobe = 2, 128, 16, 40, 8
    codes = rng.standard_normal((Pp, Cp, D)).astype(np.float32)
    ids = np.arange(Pp * Cp, dtype=np.int32).reshape(Pp, Cp)
    ids[1, 100:] = -1  # padding slots
    codes[1, 100:] = 10.0  # poison
    norms = (codes.astype(np.float32) ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)

    pids = np.asarray(parent_rank_pallas(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(norms),
        jnp.asarray(q), nprobe, metric, qt=8, interpret=True))

    flat = codes.reshape(-1, D)
    fids = ids.reshape(-1)
    valid = np.where(fids >= 0)[0]
    total = 0
    for b in range(B):
        if metric == "l2":
            d2 = ((flat[valid] - q[b]) ** 2).sum(1)
            want = fids[valid[np.argsort(d2)[:nprobe]]]
        else:
            want = fids[valid[np.argsort(-(flat[valid] @ q[b]))[:nprobe]]]
        got = pids[b][pids[b] >= 0]
        assert (got >= 0).all() and len(set(got.tolist())) == len(got)
        ov = len(set(got.tolist()) & set(want.tolist()))
        assert ov >= nprobe - 1, (b, got, want)
        total += ov
        # rank order: first candidate should be the true nearest
        assert got[0] == want[0], (b, got, want)
    assert total >= B * nprobe * 0.99


@pytest.mark.parametrize("variant_name", ["v8", "v9", "v10", "v11"])
@pytest.mark.parametrize("C", [128, 256])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_v8_kernel_interpret_matches_xla(metric, C, variant_name):
    """v8 (global-scale quantization), v9 (v8 + joint rounds over a
    [gpb*qt, fold] scratch), v10 (scatter epilogue), v11 (sorted-placement
    epilogue): selection order uses a batch-global 13-bit key, so
    membership can differ only at global-quantization ties (rare on
    continuous data); returned candidates carry EXACT scores. Requires
    >= k-1 per-row overlap with the oracle and exact scores for overlapping
    ids; empty partitions + poisoned pads must never surface. v11 is
    dense-only, so the masked-pid row is exercised on the other variants."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v8,
        grouped_scan_pallas_v9,
        grouped_scan_pallas_v10,
        grouped_scan_pallas_v11,
    )

    variant = {"v8": grouped_scan_pallas_v8,
               "v9": grouped_scan_pallas_v9,
               "v10": grouped_scan_pallas_v10,
               "v11": grouped_scan_pallas_v11}[variant_name]

    rng = np.random.default_rng(11)
    P, D, B, nprobe, k, qt = 8, 16, 12, 3, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.zeros(P, np.int32)
    for p in range(P):
        sizes[p] = rng.integers(0, C + 1)
        ids[p, sizes[p]:] = -1
        codes[p, sizes[p]:] = 10.0  # poison
    norms = (codes.astype(np.float32) ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = np.stack([rng.permutation(P)[:nprobe] for _ in range(B)]).astype(np.int32)
    if variant_name != "v11":  # v11 is dense-only (fixed-nprobe semantics)
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
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, metric,
        qt=qt, gpb=3, fold=128, interpret=True)
    s1, i1 = np.asarray(s1), np.asarray(i1)
    s2, i2 = np.asarray(s2), np.asarray(i2)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    for b in range(B):
        set1, set2 = set(i1[b].tolist()), set(i2[b].tolist())
        assert len(set1 & set2) >= min(k, len(set1)) - 1, (b, i1[b], i2[b])
        exact = {i: s for i, s in zip(i1[b], s1[b])}
        for i, s in zip(i2[b], s2[b]):
            if i in exact and i >= 0:
                np.testing.assert_allclose(s, exact[i], rtol=1e-4, atol=1e-4)


def test_v9_sampled_bounds_interpret():
    """bounds="sampled": tighter global quantization scale (gmin from a
    stratified score sample). Candidates below the sampled floor flatten to
    key 0 — they are losers by construction — so per-row overlap with the
    oracle must still hold."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v9

    rng = np.random.default_rng(13)
    P, C, D, B, nprobe, k, qt = 8, 256, 16, 16, 4, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.full(P, C, np.int32)
    norms = (codes ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = np.stack([rng.permutation(P)[:nprobe] for _ in range(B)]).astype(np.int32)

    s1, i1, _ = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, "l2", qt=qt, group_chunk=4)
    s2, i2, _ = grouped_scan_pallas_v9(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "l2",
        qt=qt, gpb=2, bounds="sampled", interpret=True)
    i1, i2 = np.asarray(i1), np.asarray(i2)
    for b in range(B):
        assert len(set(i1[b].tolist()) & set(i2[b].tolist())) >= k - 1, b


@pytest.mark.parametrize("variant_name", ["v8", "v9", "v10", "v11"])
def test_v8_unit_norm_ip_no_key_clipping(variant_name):
    """Regression (round-3 DEEP config, recall 0.003): the global-scale
    kernels hardcoded the l2 score form (2*prod), pushing every IP score
    above (gmax+gmin)/2 past the key-clip ceiling — on unit-norm corpora
    that is ALL top candidates, collapsing selection to lane order. Keys
    must stay un-clipped across the realizable IP range: exact-oracle
    overlap on unit-norm data where top cosines approach the bound."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v8,
        grouped_scan_pallas_v9,
        grouped_scan_pallas_v10,
        grouped_scan_pallas_v11,
    )

    variant = {"v8": grouped_scan_pallas_v8,
               "v9": grouped_scan_pallas_v9,
               "v10": grouped_scan_pallas_v10,
               "v11": grouped_scan_pallas_v11}[variant_name]
    rng = np.random.default_rng(21)
    P, C, D, B, nprobe, k, qt = 8, 256, 16, 16, 4, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    codes /= np.linalg.norm(codes, axis=2, keepdims=True)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.full(P, C, np.int32)
    norms = (codes ** 2).sum(axis=2)
    # queries NEAR stored vectors: top cosines ~0.99, the clip region
    q = codes[rng.integers(0, P, B), rng.integers(0, C, B)].copy()
    q += 0.05 * rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pids = np.stack([rng.permutation(P)[:nprobe] for _ in range(B)]).astype(np.int32)

    s1, i1, _ = grouped_scan_xla(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(q), jnp.asarray(pids),
        k, "ip", qt=qt, group_chunk=4)
    s2, i2, _ = variant(
        jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "ip",
        qt=qt, gpb=2, interpret=True)
    i1, i2 = np.asarray(i1), np.asarray(i2)
    for b in range(B):
        ov = len(set(i1[b].tolist()) & set(i2[b].tolist()))
        assert ov >= k - 1, (b, i1[b], i2[b])


@pytest.mark.parametrize("variant_name", ["v10", "v11"])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_v10_dequantized_scores(metric, variant_name):
    """v10/v11 exact=False: ids match the exact-rescore path (pool_factor=1
    means membership is fixed before rescore), and dequantized scores are
    within one quantization step of the exact scores."""
    from quake_tpu.ops.pallas_grouped import (
        grouped_scan_pallas_v10,
        grouped_scan_pallas_v11,
    )

    grouped_scan_pallas_v10 = {"v10": grouped_scan_pallas_v10,
                               "v11": grouped_scan_pallas_v11}[variant_name]
    rng = np.random.default_rng(31)
    P, C, D, B, nprobe, k, qt = 8, 256, 16, 16, 4, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = np.full(P, C, np.int32)
    norms = (codes ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    pids = np.stack([rng.permutation(P)[:nprobe] for _ in range(B)]).astype(np.int32)
    args = (jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
            jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids))

    s1, i1, _ = grouped_scan_pallas_v10(*args, k, metric, qt=qt, gpb=2,
                                        interpret=True, exact=True)
    s2, i2, _ = grouped_scan_pallas_v10(*args, k, metric, qt=qt, gpb=2,
                                        interpret=True, exact=False)
    i1, i2 = np.asarray(i1), np.asarray(i2)
    s1, s2 = np.asarray(s1), np.asarray(s2)
    # Same membership (ordering may swap within a quantization step).
    for b in range(B):
        assert set(i1[b].tolist()) == set(i2[b].tolist()), b
    # Dequantized scores within ~1 step of exact (match rows by id).
    levels = (1 << 24) // 256 - 2
    # analytic grange for this data
    maxq2 = (q ** 2).sum(1).max()
    maxx2 = norms.max()
    maxqx = np.sqrt(maxq2) * np.sqrt(maxx2)
    grange = (maxq2 + maxx2 + 2 * maxqx) if metric == "l2" else 2 * maxqx
    step = grange / levels
    for b in range(B):
        m = {int(t): s2[b, j] for j, t in enumerate(i2[b]) if t >= 0}
        for j, t in enumerate(i1[b]):
            if t >= 0:
                assert abs(m[int(t)] - s1[b, j]) <= 1.5 * step, (b, j)


def test_v10_dedup_dequantized():
    """v10 dedup + exact=False (SOAR serving mode): no duplicate ids, same
    membership as the exact dedup path, dequantized scores."""
    from quake_tpu.ops.pallas_grouped import grouped_scan_pallas_v10

    rng = np.random.default_rng(17)
    P, C, D, B, k, qt = 6, 128, 16, 8, 5, 8
    nvec = P * C // 4
    vecs = rng.standard_normal((nvec, D)).astype(np.float32)
    a1 = rng.integers(0, P, nvec)
    a2 = (a1 + 1 + rng.integers(0, P - 1, nvec)) % P
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
    args = (jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
            jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids))

    _, i1, _ = grouped_scan_pallas_v10(*args, k, "l2", qt=qt, gpb=2,
                                       dedup=True, interpret=True, exact=True)
    s2, i2, _ = grouped_scan_pallas_v10(*args, k, "l2", qt=qt, gpb=2,
                                        dedup=True, interpret=True,
                                        exact=False)
    i1, i2 = np.asarray(i1), np.asarray(i2)
    s2 = np.asarray(s2)
    for b in range(B):
        valid = i2[b][i2[b] >= 0]
        assert len(valid) == len(set(valid.tolist()))
        assert set(i1[b].tolist()) == set(i2[b].tolist()), b
        vs = s2[b][i2[b] >= 0]
        assert (np.diff(vs) <= 1e-6).all()  # descending scores


def test_v10b_budget_matches_v10_masked():
    """v10b (flat-pair-list budget, VERDICT r3 #4) on a masked APS-style
    candidate matrix must match v10 exactly when the budget holds all valid
    pairs — for both a generous and an exactly-tight budget, in exact and
    dequantized-score modes, including partially-filled partitions."""
    from quake_tpu.ops.pallas_grouped import (grouped_scan_pallas_v10,
                                              grouped_scan_pallas_v10b)

    rng = np.random.default_rng(31)
    P, C, D, B, M, k, qt = 32, 128, 16, 48, 12, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = rng.integers(C // 2, C + 1, P).astype(np.int32)
    for p in range(P):
        ids[p, sizes[p]:] = -1
    norms = (codes ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    base = np.stack([rng.choice(P, M, replace=False) for _ in range(B)])
    n_b = rng.integers(2, M + 1, B)
    lane = np.arange(M)[None, :]
    pids = np.where(lane < n_b[:, None], base, -1).astype(np.int32)
    n_valid = int((pids >= 0).sum())

    args = (jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
            jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "l2")
    kw = dict(qt=qt, gpb=2, interpret=True)
    s0, i0, c0 = grouped_scan_pallas_v10(*args, **kw)
    for bud in (((n_valid + 7) // 8) * 8, n_valid):
        s1, i1, c1 = grouped_scan_pallas_v10b(*args, pair_budget=bud, **kw)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    _, i2, _ = grouped_scan_pallas_v10b(*args, pair_budget=n_valid,
                                        exact=False, **kw)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2))


def test_v11b_sorted_budget_matches_scatter_masked():
    """v11b (budgeted SORTED placement) on a masked APS-style candidate
    matrix with ghost (size-0) partitions and duplicate pids: membership
    must match the budgeted scatter path (same kernel, same quantized keys
    — only the pool lane order differs), scanned counts must be identical,
    and the dequantized-score mode must preserve ids. This is the masked
    analog of the v10-vs-v11 dense equivalence."""
    from quake_tpu.ops.pallas_grouped import (budget_sort_key_fits,
                                              grouped_scan_pallas_v10b)

    rng = np.random.default_rng(37)
    P, C, D, B, M, k, qt = 32, 128, 16, 48, 12, 5, 8
    codes = rng.standard_normal((P, C, D)).astype(np.float32)
    ids = np.arange(P * C, dtype=np.int32).reshape(P, C)
    sizes = rng.integers(C // 2, C + 1, P).astype(np.int32)
    sizes[3] = 0  # ghost partitions: valid pairs pointing at empty slabs
    sizes[17] = 0
    for p in range(P):
        ids[p, sizes[p]:] = -1
    norms = (codes ** 2).sum(axis=2)
    q = rng.standard_normal((B, D)).astype(np.float32)
    base = np.stack([rng.choice(P, M, replace=False) for _ in range(B)])
    n_b = rng.integers(2, M + 1, B)
    lane = np.arange(M)[None, :]
    pids = np.where(lane < n_b[:, None], base, -1).astype(np.int32)
    pids[::5, 1] = pids[::5, 0]  # duplicate pid inside some probe rows
    n_valid = int((pids >= 0).sum())

    assert budget_sort_key_fits(B, M, n_valid, P, qt, 2)
    args = (jnp.asarray(codes), jnp.asarray(ids), jnp.asarray(sizes),
            jnp.asarray(norms), jnp.asarray(q), jnp.asarray(pids), k, "l2")
    kw = dict(qt=qt, gpb=2, interpret=True)
    for bud in (((n_valid + 7) // 8) * 8, n_valid):
        s0, i0, c0 = grouped_scan_pallas_v10b(
            *args, pair_budget=bud, placement="scatter", **kw)
        s1, i1, c1 = grouped_scan_pallas_v10b(
            *args, pair_budget=bud, placement="sorted", **kw)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        i0n, i1n = np.asarray(i0), np.asarray(i1)
        s0n, s1n = np.asarray(s0), np.asarray(s1)
        for b in range(B):
            # Same quantized keys on both paths; lane order differs, so
            # membership can swap only at a quantization tie.
            s0b, s1b = set(i0n[b].tolist()), set(i1n[b].tolist())
            assert len(s0b & s1b) >= len(s0b) - 1, (b, i0n[b], i1n[b])
            if s0b == s1b:
                np.testing.assert_allclose(np.sort(s0n[b]), np.sort(s1n[b]),
                                           rtol=1e-4, atol=1e-4)
    _, i2, c2 = grouped_scan_pallas_v10b(
        *args, pair_budget=n_valid, placement="sorted", exact=False, **kw)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c2))
    i2n = np.asarray(i2)
    for b in range(B):
        s1b, s2b = set(np.asarray(i1)[b].tolist()), set(i2n[b].tolist())
        assert len(s1b & s2b) >= len(s1b) - 1, b
