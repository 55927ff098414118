from quake_tpu.native.idmap import NativeIdMap, native_available

__all__ = ["NativeIdMap", "native_available"]
