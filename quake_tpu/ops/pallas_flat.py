"""Pallas flat top-k: ranked candidate selection over a flat vector buffer.

Built for the PARENT centroid ranking inside IVF search — the reference scans
its parent index with the same list-scanning kernels it uses for partitions
(query_coordinator.cpp:628-646); here the parent scan was previously a
[B, nlist] matmul + `lax.approx_max_k`, whose tiled-reduction selection cost
~1.4 ms at B=4096 (docs/BENCH_NOTES.md decomposition) — several hundred times
the matmul it follows. This kernel fuses the matmul with the column-folded
max2 packed selection (_v7_select) so the whole parent ranking is one Pallas
program: ~16 grid steps at B=4096/QT=256, selection rounds over a [QT, fold]
reduced row.

Selection order is by 13-bit range-quantized score (descending, lane
tie-break), which is exactly what candidate ranking needs: the consumer
treats the result as a ranked probe list, not as distances. The user-facing
flat search mode stays on the exact XLA path (ops/scan.flat_scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from quake_tpu.ops.pallas_grouped import _v7_select

NEG_INF = float("-inf")


def _flat_topk_kernel(metric: str, k: int, slot_mult: int, levels: int,
                      fold: int):
    def kernel(q_ref, codes_ref, bias_ref, out_ref):
        qt_q = q_ref[...]  # [QT, D]
        codes = codes_ref[...]  # [N, D]
        bias = bias_ref[0]  # [N]: -||x||^2 with -inf at invalid slots (l2)
        prod = jax.lax.dot_general(
            qt_q, codes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QT, N]
        if metric == "l2":
            scores = 2.0 * prod + bias[None, :]
        else:
            scores = prod + bias[None, :]
        valid = scores > NEG_INF
        out, _ = _v7_select(scores, valid, k, slot_mult, levels, fold)
        out_ref[...] = out

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "qt", "fold", "interpret")
)
def flat_topk_pallas(codes2d, bias, q, k: int, metric: str, qt: int = 256,
                     fold: int = 128, interpret: bool = False):
    """Ranked top-k slots of every query against a flat buffer.

    codes2d: [N, D] (N a multiple of `fold`); bias: [N] f32 — for l2 the
    cached -||x||^2 with -inf at invalid (padding) slots, for ip just the
    -inf/0 validity bias; q: [B, D].

    Returns slots [B, k] int32 (descending by quantized score; -1 = no
    candidate). Requires N <= 16384 so the packed quantization keeps >= 1022
    levels; callers fall back to the approx_max_k path beyond that.
    """
    B, D = q.shape
    N = codes2d.shape[0]
    if N % fold or N > 16384:
        raise ValueError(f"flat_topk_pallas needs N % {fold} == 0 and N <= 16384 (N={N})")
    slot_mult = max(1 << (int(N - 1).bit_length()), 2)
    levels = (1 << 24) // slot_mult - 2
    Bp = -(-B // qt) * qt
    qp = jnp.pad(q.astype(codes2d.dtype), ((0, Bp - B), (0, 0)))

    kernel = _flat_topk_kernel(metric, k, slot_mult, levels, fold)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // qt,),
        in_specs=[
            pl.BlockSpec((qt, D), lambda b: (b, 0)),
            pl.BlockSpec((N, D), lambda b: (0, 0)),
            pl.BlockSpec((1, N), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((qt, k), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, k), jnp.float32),
        interpret=interpret,
    )(qp, codes2d, bias.reshape(1, N))

    slots = jnp.mod(out, float(slot_mult)).astype(jnp.int32)
    slots = jnp.where(out >= 0.0, slots, -1)
    return slots[:B]


def parent_rank_pallas(parent_codes, parent_ids, parent_norms, q, nprobe: int,
                       metric: str, qt: int = 256, interpret: bool = False):
    """Ranked candidate partition ids from the parent centroid store.

    parent_codes [Pp, Cp, D], parent_ids [Pp, Cp] (-1 = empty slot),
    parent_norms [Pp, Cp] cached squared norms. Returns pids [B, nprobe]
    int32 in rank order (-1 pad) — drop-in for the approx flat_scan parent
    ranking in fused_ivf_search.
    """
    Pp, Cp, D = parent_codes.shape
    N = Pp * Cp
    codes2d = parent_codes.reshape(N, D)
    ids_flat = parent_ids.reshape(N)
    ok = ids_flat >= 0
    if metric == "l2":
        bias = jnp.where(ok, -parent_norms.reshape(N), NEG_INF)
    else:
        bias = jnp.where(ok, 0.0, NEG_INF)
    slots = flat_topk_pallas(codes2d, bias.astype(jnp.float32), q, nprobe,
                             metric, qt=qt, interpret=interpret)
    pids = ids_flat[jnp.maximum(slots, 0)]
    return jnp.where(slots >= 0, pids, -1)
