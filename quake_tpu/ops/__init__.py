from quake_tpu.ops.scan import (
    NEG_INF,
    merge_topk,
    flat_scan,
    ivf_scan,
    scores_to_distances,
    finalize_result,
)

__all__ = [
    "NEG_INF",
    "merge_topk",
    "flat_scan",
    "ivf_scan",
    "scores_to_distances",
    "finalize_result",
]
