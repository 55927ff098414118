"""Mutation throughput over the dispatch tunnel: synchronous add() vs the
coalescing mutation buffer (IndexBuildParams.mutation_buffer_size).

The per-dispatch round trip (~30-100ms tunneled) dominates small synchronous
adds; buffering coalesces them into one assignment + one append per
buffer-full (partition_manager.cpp:123-262 batches adds for the same
reason).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/mutation_bench.py
"""

import json
import time

import numpy as np


def main():
    from quake_tpu import IndexBuildParams, QuakeIndex

    rng = np.random.default_rng(0)
    N, D = 100_000, 128
    x = rng.standard_normal((N, D)).astype(np.float32)
    new = rng.standard_normal((40_960, D)).astype(np.float32)
    new_ids = np.arange(1_000_000, 1_000_000 + len(new), dtype=np.int64)

    for name, buf in (("sync", 0), ("buffered_8192", 8192)):
        idx = QuakeIndex()
        idx.build(x, np.arange(N, dtype=np.int64),
                  IndexBuildParams(nlist=256, calibrate_aps=False,
                                   mutation_buffer_size=buf))
        # Warm the add path INCLUDING the coalesced flush shape (a full
        # buffer cycle), so the timed window measures steady-state dispatch,
        # not one-time compiles.
        warm = max(buf, 512)
        for lo in range(0, warm, 512):
            idx.add(new[lo:lo + 512], new_ids[lo:lo + 512])
        idx.get_ids()  # flush
        idx.remove(new_ids[:warm])
        # 48 x 512 = 3 exact buffer-fulls: the timed window contains only
        # warmed shapes (a trailing partial flush would compile a new
        # assignment shape inside the window).
        n_batches, bs = 48, 512
        t0 = time.perf_counter()
        for i in range(n_batches):
            lo = 512 + i * bs
            idx.add(new[lo:lo + bs], new_ids[lo:lo + bs])
        idx.get_ids()  # flush + sync
        dt = time.perf_counter() - t0
        print(json.dumps({
            "name": name,
            "vectors_per_s": round(n_batches * bs / dt),
            "ms_per_add_call": round(dt / n_batches * 1e3, 1),
        }), flush=True)

    # Donation probe (VERDICT r1 weak #4): on TPU the donated store buffers
    # must be reused in place — the post-append codes array should occupy
    # the same device memory as the pre-append one.
    import jax

    idx = QuakeIndex()
    idx.build(x[:50_000], np.arange(50_000, dtype=np.int64),
              IndexBuildParams(nlist=128, calibrate_aps=False))
    idx.add(new[:512], new_ids[:512])  # warm shapes
    try:
        before = idx.store.state.codes.unsafe_buffer_pointer()
        idx.add(new[512:1024], new_ids[512:1024])
        jax.block_until_ready(idx.store.state.codes)
        after = idx.store.state.codes.unsafe_buffer_pointer()
        print(json.dumps({
            "name": "append_donation_in_place",
            "donated": bool(before == after),
            "backend": jax.default_backend(),
        }), flush=True)
    except Exception as e:  # axon IFRT has no unsafe_buffer_pointer
        print(json.dumps({"name": "append_donation_in_place",
                          "error": str(e)[:80]}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
