from quake_tpu.parallel.mesh import make_mesh, shard_store_state, SHARD_AXIS
from quake_tpu.parallel.sharded import (
    sharded_flat_search,
    sharded_ivf_search,
    sharded_kmeans_step,
)

__all__ = [
    "make_mesh",
    "shard_store_state",
    "SHARD_AXIS",
    "sharded_flat_search",
    "sharded_ivf_search",
    "sharded_kmeans_step",
]
