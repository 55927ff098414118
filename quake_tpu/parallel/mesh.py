"""Device-mesh utilities: partition sharding across TPU chips.

TPU-native replacement for the reference's worker-pool distribution
(partition->core round-robin ownership + NUMA placement,
src/cpp/src/partition_manager.cpp:557-603, query_coordinator.cpp:50-95).

Two sharding strategies over the store's [P(artitions), C(apacity), D] slabs:

* "slot" (default): shard the slot axis (C) — every device owns a 1/ndev
  slice of every partition. Scans are perfectly load-balanced regardless of
  probe skew (no partition->device ownership imbalance), and any partition
  count divides. The analog of the reference's random flat-index sharding
  (partition_manager.cpp:563-597) generalized to all partitions.
* "partition": shard the partition axis (P) — block ownership, the direct
  analog of partition->core assignment (partition_manager.cpp:599-603).

Queries replicate; per-device local top-k merges over ICI collectives.
"""

from __future__ import annotations

import jax

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D mesh over the partition-shard axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def shard_store_state(state, mesh: Mesh, strategy: str = "slot"):
    """Place store arrays on the mesh (HBM residency per device shard —
    the analog of numa_alloc_onnode, index_partition.cpp:257-274)."""
    from quake_tpu.storage.store import StoreState

    ndev = mesh.devices.size

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    if strategy == "partition":
        if state.codes.shape[0] % ndev != 0:
            raise ValueError(
                f"partition axis {state.codes.shape[0]} not divisible by {ndev}"
            )
        return StoreState(
            codes=put(state.codes, P(SHARD_AXIS)),
            ids=put(state.ids, P(SHARD_AXIS)),
            sizes=put(state.sizes, P(SHARD_AXIS)),
            centroids=put(state.centroids, P()),
            active=put(state.active, P()),
            norms=put(state.norms, P(SHARD_AXIS)),
        )
    if state.codes.shape[1] % ndev != 0:
        raise ValueError(
            f"slot axis {state.codes.shape[1]} not divisible by {ndev}"
        )
    return StoreState(
        codes=put(state.codes, P(None, SHARD_AXIS)),
        ids=put(state.ids, P(None, SHARD_AXIS)),
        sizes=put(state.sizes, P()),
        centroids=put(state.centroids, P()),
        active=put(state.active, P()),
        norms=put(state.norms, P(None, SHARD_AXIS)),
    )


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
