"""quake_tpu: a TPU-native dynamic, query-adaptive ANN search framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Quake
(marius-team/quake): dynamic IVF indexing with continuous add/remove,
adaptive partition scanning to a recall target (APS), cost-based automatic
maintenance (split/delete/refine), and partition-parallel query execution —
re-designed for TPU (MXU matmul scans, padded HBM slabs, device meshes)
instead of CPU threads/SIMD/NUMA.
"""

from quake_tpu.params import (
    IndexBuildParams,
    MaintenancePolicyParams,
    SearchParams,
)
from quake_tpu.timing import (
    BuildTimingInfo,
    MaintenanceTimingInfo,
    ModifyTimingInfo,
    SearchResult,
    SearchTimingInfo,
)
from quake_tpu.index import QuakeIndex

__version__ = "0.1.0"

__all__ = [
    "QuakeIndex",
    "IndexBuildParams",
    "SearchParams",
    "MaintenancePolicyParams",
    "SearchResult",
    "BuildTimingInfo",
    "ModifyTimingInfo",
    "SearchTimingInfo",
    "MaintenanceTimingInfo",
]
