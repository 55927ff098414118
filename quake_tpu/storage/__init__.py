from quake_tpu.storage.store import PartitionStore, StoreState

__all__ = ["PartitionStore", "StoreState"]
