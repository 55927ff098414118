"""Native + fallback id-map tests (host runtime component)."""

import numpy as np
import pytest

from quake_tpu.storage.idmap import PyIdMap, make_id_map


def backends():
    out = [PyIdMap]
    try:
        from quake_tpu.native.idmap import NativeIdMap, native_available

        if native_available():
            out.append(NativeIdMap)
    except Exception:
        pass
    return out


@pytest.mark.parametrize("cls", backends())
def test_set_get_erase(cls):
    m = cls(16)
    keys = np.arange(100, dtype=np.int64) * 7
    vals = (np.arange(100) % 13).astype(np.int32)
    assert m.set_batch(keys, vals) == 100
    assert len(m) == 100
    np.testing.assert_array_equal(m.get_batch(keys), vals)
    assert m.get_batch(np.array([999999], dtype=np.int64))[0] == -1
    # Update is not an insert.
    assert m.set_batch(keys[:10], vals[:10] + 1) == 0
    np.testing.assert_array_equal(m.get_batch(keys[:10]), vals[:10] + 1)
    # Erase half.
    expected = vals.copy()
    expected[:10] += 1
    assert m.erase_batch(keys[::2]) == 50
    assert len(m) == 50
    assert (m.get_batch(keys[::2]) == -1).all()
    np.testing.assert_array_equal(m.get_batch(keys[1::2]), expected[1::2])


@pytest.mark.parametrize("cls", backends())
def test_growth_and_items(cls):
    m = cls(4)
    n = 10_000
    keys = np.random.default_rng(0).permutation(n).astype(np.int64)
    vals = (keys % 31).astype(np.int32)
    m.set_batch(keys, vals)
    assert len(m) == n
    k, v = m.items()
    order = np.argsort(k)
    np.testing.assert_array_equal(k[order], np.sort(keys))
    np.testing.assert_array_equal(v[order], np.sort(keys) % 31)


@pytest.mark.parametrize("cls", backends())
def test_contains_and_rows_of(cls):
    m = cls(16)
    m.set_batch(np.array([1, 2, 3], dtype=np.int64), np.array([5, 5, 7], dtype=np.int32))
    got = m.contains_batch(np.array([1, 4, 3], dtype=np.int64))
    np.testing.assert_array_equal(got, [True, False, True])
    rows = np.sort(m.rows_of(np.array([1, 2, 3, 4], dtype=np.int64)))
    np.testing.assert_array_equal(rows, [5, 7])


@pytest.mark.parametrize("cls", backends())
def test_reinsert_after_erase(cls):
    """Tombstone correctness: erased keys can be re-inserted."""
    m = cls(8)
    keys = np.arange(64, dtype=np.int64)
    m.set_batch(keys, keys.astype(np.int32))
    m.erase_batch(keys)
    assert len(m) == 0
    assert m.set_batch(keys, (keys + 1).astype(np.int32)) == 64
    np.testing.assert_array_equal(m.get_batch(keys), keys + 1)


def test_native_is_preferred_when_available():
    m = make_id_map(16)
    try:
        from quake_tpu.native.idmap import NativeIdMap, native_available

        if native_available():
            assert isinstance(m, NativeIdMap)
    except Exception:
        assert isinstance(m, PyIdMap)
