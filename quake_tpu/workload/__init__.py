from quake_tpu.workload.generator import (
    DynamicWorkloadGenerator,
    StratifiedClusterSampler,
    UniformSampler,
)
from quake_tpu.workload.evaluator import WorkloadEvaluator

__all__ = [
    "DynamicWorkloadGenerator",
    "WorkloadEvaluator",
    "UniformSampler",
    "StratifiedClusterSampler",
]
