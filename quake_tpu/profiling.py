"""Profiling helpers: device traces + timing aggregation.

The reference exposes per-op typed timing structs (common.h:189-241) — ours
mirror those — plus a standalone system tracer (scripts/trace_metrics.py).
This module adds the TPU-side story: jax.profiler traces viewable in
TensorBoard/Perfetto, and a helper to flatten recursive SearchTimingInfo.
"""

from __future__ import annotations

import contextlib
from typing import Iterator


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/quake_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace around a block:

        with device_trace("/tmp/trace"):
            index.search(q, params)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling host phases inside a trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def flatten_timing(info, prefix: str = "") -> dict:
    """Flatten a (recursive) SearchTimingInfo into a flat metric dict."""
    out = {}
    for field in (
        "n_queries",
        "n_clusters",
        "partitions_scanned",
        "buffer_init_time_ns",
        "job_enqueue_time_ns",
        "boundary_distance_time_ns",
        "job_wait_time_ns",
        "result_aggregate_time_ns",
        "total_time_ns",
    ):
        out[prefix + field] = getattr(info, field, 0)
    if getattr(info, "parent_info", None) is not None:
        out.update(flatten_timing(info.parent_info, prefix + "parent."))
    return out
