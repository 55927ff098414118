from quake_tpu.wrappers.wrapper import IndexWrapper, get_index_class

__all__ = ["IndexWrapper", "get_index_class"]
