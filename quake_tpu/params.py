"""Parameter objects for quake_tpu.

Mirrors the reference parameter surface (reference: src/cpp/include/common.h:69-184)
with identical field names and defaults, so users of the reference can switch over
without relearning the API. TPU-specific extensions are kept at the end of each
class and default to values that preserve reference semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional
from dataclasses import dataclass, field


# Defaults mirroring reference common.h:69-99
DEFAULT_NLIST = 0
DEFAULT_NITER = 5
DEFAULT_METRIC = "l2"
DEFAULT_NUM_WORKERS = 0

DEFAULT_K = 1
DEFAULT_NPROBE = 1
DEFAULT_RECALL_TARGET = -1.0
# Reference default is False (its serial scan is its general-purpose mode,
# common.h:178); here None = auto — batch >= 16 takes the partition-major
# grouped path (the TPU-native batched mode), smaller batches the per-rank
# serial analog. An EXPLICIT False is honored: it pins the serial path
# (query_coordinator.cpp:659-673 semantics) even at large batch.
DEFAULT_BATCHED_SCAN = None
DEFAULT_PRECOMPUTED = True
DEFAULT_INITIAL_SEARCH_FRACTION = 0.02
DEFAULT_RECOMPUTE_THRESHOLD = 0.001
DEFAULT_APS_FLUSH_PERIOD_US = 100

DEFAULT_MAINTENANCE_POLICY = "query_cost"
DEFAULT_WINDOW_SIZE = 1000
DEFAULT_REFINEMENT_RADIUS = 25
DEFAULT_REFINEMENT_ITERATIONS = 3
DEFAULT_MIN_PARTITION_SIZE = 32
DEFAULT_ALPHA = 0.9
DEFAULT_ENABLE_SPLIT_REJECTION = True
DEFAULT_ENABLE_DELETE_REJECTION = True
DEFAULT_DELETE_THRESHOLD_NS = 10.0
DEFAULT_SPLIT_THRESHOLD_NS = 10.0

DEFAULT_LATENCY_ESTIMATOR_RANGE_N = [1, 2, 4, 16, 64, 256, 1024, 4096, 16384, 65536]
DEFAULT_LATENCY_ESTIMATOR_RANGE_K = [1, 4, 16, 64, 256]
DEFAULT_LATENCY_ESTIMATOR_NTRIALS = 5

VALID_METRICS = ("l2", "ip")


def check_metric(metric: str) -> str:
    """Normalize/validate a metric string (reference common.h:145-156)."""
    m = metric.lower()
    if m not in VALID_METRICS:
        raise ValueError(f"Invalid metric type: {metric!r} (expected 'l2' or 'ip')")
    return m


@dataclass
class MaintenancePolicyParams:
    """Mirrors reference MaintenancePolicyParams (common.h:104-118)."""

    maintenance_policy: str = DEFAULT_MAINTENANCE_POLICY
    window_size: int = DEFAULT_WINDOW_SIZE
    refinement_radius: int = DEFAULT_REFINEMENT_RADIUS
    refinement_iterations: int = DEFAULT_REFINEMENT_ITERATIONS
    min_partition_size: int = DEFAULT_MIN_PARTITION_SIZE
    alpha: float = DEFAULT_ALPHA
    enable_split_rejection: bool = DEFAULT_ENABLE_SPLIT_REJECTION
    enable_delete_rejection: bool = DEFAULT_ENABLE_DELETE_REJECTION
    delete_threshold_ns: float = DEFAULT_DELETE_THRESHOLD_NS
    split_threshold_ns: float = DEFAULT_SPLIT_THRESHOLD_NS


@dataclass
class IndexBuildParams:
    """Mirrors reference IndexBuildParams (common.h:123-143).

    TPU extensions:
      precision: matmul accumulation input dtype for scans ("f32" or "bf16").
      num_shards: shard partitions across this many mesh devices (0 = single device).
    """

    dimension: int = 0
    nlist: int = DEFAULT_NLIST
    num_workers: int = DEFAULT_NUM_WORKERS
    code_size: int = -1  # reserved for PQ (unimplemented in reference too)
    num_codebooks: int = -1
    metric: str = DEFAULT_METRIC
    niter: int = DEFAULT_NITER

    use_adaptive_nprobe: bool = False
    use_numa: bool = False  # accepted for API parity; no-op on TPU
    use_gpu: bool = False  # accepted for API parity; no-op on TPU
    verify_numa: bool = False
    same_core: bool = True
    verbose: bool = False

    parent_params: "IndexBuildParams | None" = None

    # --- TPU extensions ---
    precision: str = "f32"
    num_shards: int = 0
    # Split clusters above ~1.5x mean size at build so slab padding (set by
    # the largest partition) stays bounded. May grow nlist slightly.
    balance_partitions: bool = True
    # SOAR spilled assignment (beyond the reference; ScaNN's SOAR,
    # NeurIPS'23): every vector is resident in its primary partition AND one
    # secondary partition chosen to keep the two residuals orthogonal
    # (soar_lambda weights the orthogonality penalty; 0 = plain 2nd
    # nearest). Memory doubles; recall per probed partition rises, so the
    # same recall needs fewer probes. Search dedups the copies (single-device
    # and sharded: local 2k dedup + dedup'd ICI merge; recall-target runs
    # its loop at 2k with a dedup tail). Maintenance (splits, deletes, local
    # refinement) and the capacity-isolation overflow path are fully
    # ownership-aware: moved copies keep their residency map, deleted
    # copies re-home away from their twin's partition, refinement separates
    # same-cluster twins.
    spill: bool = False
    soar_lambda: float = 1.0
    # Build-time split threshold as a multiple of the mean partition size:
    # the padded slab capacity C (and so every scan's lane count) tracks the
    # LARGEST partition, so a tighter factor trades a few % more partitions
    # for proportionally less padding scanned (TPU-only concern; the
    # reference's heap buffers tolerate imbalance).
    balance_factor: float = 1.5
    # Calibrate the APS recall model's dimension against realized recall on
    # a small sample at build time (corpora >= 10k only; index.py gate).
    calibrate_aps: bool = True
    # Profile the production grouped kernel over the (n, k) latency grid at
    # build and feed the maintenance cost estimator (the reference profiles
    # its real scan kernel at build, quake_index.cpp:81-82). Off by default:
    # ~grid-size compiles; the profile is cached as CSV by save() and reused
    # by load().
    profile_maintenance_latency: bool = False
    # Coalesce add() calls into device programs of up to this many vectors
    # (0 = synchronous, reference semantics). Buffered vectors are flushed
    # before any read/mutation that observes them, so results are identical;
    # only the device-dispatch cadence changes. Amortizes the per-dispatch
    # round-trip on remote-attached TPUs (partition_manager.cpp:123-262
    # batches adds for the same reason).
    mutation_buffer_size: int = 0


@dataclass
class SearchParams:
    """Mirrors reference SearchParams (common.h:171-184).

    `num_threads`, `aps_flush_period_us` are accepted for API parity; on TPU the
    scan is a single fused device program, so they are no-ops.
    TPU extension: `aps_chunk_size` — number of ranked partitions scanned per
    APS while-loop step (the analog of the reference's per-partition early-exit
    granularity, query_coordinator.cpp:537-579).
    """

    nprobe: int = DEFAULT_NPROBE
    k: int = DEFAULT_K
    recall_target: float = DEFAULT_RECALL_TARGET
    num_threads: int = 1
    k_factor: float = 1.0
    use_precomputed: bool = DEFAULT_PRECOMPUTED
    batched_scan: Optional[bool] = DEFAULT_BATCHED_SCAN
    recompute_threshold: float = DEFAULT_RECOMPUTE_THRESHOLD
    # None = auto candidate width for recall-target search: use the
    # calibration-validated plan width (index.aps_plan_width / the oneshot
    # mcap) when available, else DEFAULT_INITIAL_SEARCH_FRACTION with a
    # coarse-nlist floor. An explicit float always wins and reproduces the
    # reference's capped-candidate-set semantics verbatim (common.h:81 —
    # the fixed 0.02 default starves the candidate set at coarse nlist:
    # measured recall 0.78 @ target 0.9 with only W=5 candidates at
    # nlist=256 on the 1M bench corpus, experiments/aps_v11b_ab r4).
    initial_search_fraction: Optional[float] = None
    aps_flush_period_us: int = DEFAULT_APS_FLUSH_PERIOD_US

    # --- TPU extensions ---
    # 0 = auto: 4 ranked partitions per APS while-loop step in latency mode
    # (fine-grained early exit), 8 at production batch (>= 1024 queries) —
    # each step re-pays the probed-partition group cost, so coarser chunks
    # win once the batch is large enough that most partitions are probed.
    # In planned mode this sets the PROLOGUE size (chunk0) instead; auto
    # sizes it to the loop's first chunk (index._planned_chunk0).
    aps_chunk_size: int = 0
    # APS execution strategy. "oneshot": the k-th-neighbor radius is
    # PREDICTED from the nearest-centroid distance via the build-time-
    # calibrated model (index.calibrate_aps stage 3) and the whole plan is
    # scanned in ONE pass — the cheapest mode (1.4x faster than planned at
    # production batch); adherence rests on the calibrated, end-to-end-
    # validated predictor. "planned": prologue scan -> per-query probe
    # plan -> single masked tail scan (phase-1 feedback: can only overscan
    # relative to the loop). "loop": lax.while_loop over ranked chunks —
    # the reference's polling semantics (query_coordinator.cpp:383-430).
    # "dense": scan the calibrated width_clip candidate prefix densely —
    # the fixed-nprobe program at the gate-validated width (adherence
    # inherited from the clipped-plan calibration; scans a superset of
    # every clipped plan). Measured 3.5-4.2x cheaper than any masked mode
    # at B=64 and ~1.5x at B=8192 (aps_b64_decomp, r4): the masked
    # machinery carries a band the dense v11 path doesn't pay.
    # "auto" picks dense whenever the budget calibration ran (TPU builds),
    # else oneshot at production batch when calibrated (falling back to
    # planned), loop at small batch. Explicit values pin the strategy.
    aps_mode: str = "auto"
    # Planned/oneshot modes: extra ranks granted to planned queries (in
    # planned mode, those whose plan extends past the prologue scan; in
    # oneshot mode, every query). The recall model is most optimistic on
    # exactly the marginal queries (their k-th radius is still shrinking),
    # and the while-loop hands them a FULL extra chunk (its implicit
    # adherence cushion) where the exact plan hands them the model-minimal
    # count. 0 = exact plan.
    aps_plan_margin: int = 4
    # False = serving mode: skip the exact winner-vector rescore in the v10/v11
    # epilogue and return scores dequantized from the kernel's packed key
    # ((key+0.5)/ginv + gmin - |q|^2). With the default rescore pool
    # (pool_factor=1) the rescore cannot change MEMBERSHIP — only ordering
    # within one quantization step (~range/8k) and the reported distance
    # values lose that much precision. The winner-vector gather it removes
    # is the single largest epilogue op (1.82 ms of a 7.81 ms fused step at
    # bench shape, kernel_ab26/27). Exact by default (reference semantics:
    # list_scanning.h rescores with true distances).
    exact_distances: bool = True

    def copy(self) -> "SearchParams":
        return dataclasses.replace(self)
