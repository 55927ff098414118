from quake_tpu.maintenance.hit_tracker import HitCountTracker
from quake_tpu.maintenance.latency_estimator import ListScanLatencyEstimator
from quake_tpu.maintenance.cost_estimator import MaintenanceCostEstimator
from quake_tpu.maintenance.policy import MaintenancePolicy

__all__ = [
    "HitCountTracker",
    "ListScanLatencyEstimator",
    "MaintenanceCostEstimator",
    "MaintenancePolicy",
]
