"""Assert buffer donation actually holds on the TPU backend (round-2 weak
item: STATUS claimed TPU-verified-clean for add/remove donation — keep the
claim honest with a recorded check).

Runs add/remove at steady state (after capacity growth settles, so no
shape-changing rebuilds) and fails if JAX emits a donation warning OR the
store's device buffer address changes on a same-shape mutation (a silently
copying donation would halve mutation throughput).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_donation_check.py
"""

import sys
import warnings

import numpy as np


def main():
    import jax

    from quake_tpu import IndexBuildParams, QuakeIndex

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    n, d = 100_000, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = QuakeIndex()
    idx.build(x, np.arange(n, dtype=np.int64),
              IndexBuildParams(nlist=64, calibrate_aps=False))

    # Warm the mutation shapes: first adds may grow capacity (legitimate
    # copies); steady-state adds/removes must donate.
    base = 1_000_000
    for i in range(3):
        idx.add(rng.standard_normal((512, d)).astype(np.float32),
                np.arange(base + i * 512, base + (i + 1) * 512, dtype=np.int64))
    idx.remove(np.arange(base, base + 512, dtype=np.int64))

    def buf_ptr(arr):
        for get in (
            lambda a: a.addressable_data(0).unsafe_buffer_pointer(),
            lambda a: a.unsafe_buffer_pointer(),
            lambda a: a.device_buffer.unsafe_buffer_pointer(),
        ):
            try:
                return get(arr)
            except Exception:
                continue
        return None

    failures = 0
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        before = buf_ptr(idx.store.state.codes)
        idx.add(rng.standard_normal((512, d)).astype(np.float32),
                np.arange(base + 10_000, base + 10_512, dtype=np.int64))
        after_add = buf_ptr(idx.store.state.codes)
        idx.remove(np.arange(base + 10_000, base + 10_512, dtype=np.int64))
        after_rem = buf_ptr(idx.store.state.codes)

    donation_warnings = [w for w in caught
                         if "donated" in str(w.message).lower()]
    for w in donation_warnings:
        print(f"DONATION WARNING: {w.message}")
        failures += 1
    if before is None:
        # Remote-attached buffers (axon tunnel) expose no host pointer; the
        # donation-warning capture above is then the authoritative signal.
        print(f"backend={backend}: buffer pointers unavailable (remote); "
              f"relying on warning capture ({len(donation_warnings)} warnings)")
    else:
        same_add = before == after_add
        same_rem = after_add == after_rem
        print(f"backend={backend} codes buffer: before={before} "
              f"after_add={after_add} after_remove={after_rem}")
        print(f"add donated in place: {same_add}; "
              f"remove donated in place: {same_rem}")
        if backend in ("tpu",) and not (same_add and same_rem):
            failures += 1
    if failures:
        print("DONATION CHECK FAILED")
        return 1
    print("DONATION CHECK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
