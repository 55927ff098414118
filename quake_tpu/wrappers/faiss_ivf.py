"""Faiss IVF baseline wrapper (mirrors src/python/index_wrappers/faiss_ivf.py).

Optional: requires `faiss` (not bundled in the TPU image); importing this
module without faiss raises a clear error at wrapper construction.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from quake_tpu.timing import SearchResult, SearchTimingInfo
from quake_tpu.utils import to_f32, to_i64
from quake_tpu.wrappers.wrapper import IndexWrapper

try:
    import faiss  # type: ignore

    _HAVE_FAISS = True
except Exception:  # pragma: no cover - environment-dependent
    faiss = None
    _HAVE_FAISS = False


class FaissIVF(IndexWrapper):
    def __init__(self):
        if not _HAVE_FAISS:
            raise ImportError(
                "faiss is not installed; the FaissIVF baseline wrapper is unavailable"
            )
        self.index = None
        self.metric = "l2"

    def _metric_type(self, metric: str):
        return faiss.METRIC_L2 if metric == "l2" else faiss.METRIC_INNER_PRODUCT

    def build(self, vectors, nc: int = 0, metric: str = "l2",
              ids: Optional[np.ndarray] = None, m: int = -1, code_size: int = -1,
              **kwargs):
        vectors = to_f32(vectors)
        d = vectors.shape[1]
        self.metric = metric
        mt = self._metric_type(metric)
        if nc <= 1:
            base = faiss.IndexFlat(d, mt)
        else:
            quantizer = faiss.IndexFlat(d, mt)
            base = faiss.IndexIVFFlat(quantizer, d, int(nc), mt)
            base.train(vectors)
        self.index = faiss.IndexIDMap2(base)
        if ids is None:
            ids = np.arange(len(vectors), dtype=np.int64)
        self.index.add_with_ids(vectors, to_i64(ids))

    def search(self, query, k: int = 1, nprobe: int = 1, **kwargs) -> SearchResult:
        query = to_f32(query)
        base = faiss.downcast_index(self.index.index)
        if isinstance(base, faiss.IndexIVFFlat):
            base.nprobe = int(nprobe)
        dists, ids = self.index.search(query, int(k))
        if self.metric == "l2":
            dists = np.sqrt(np.maximum(dists, 0))
        return SearchResult(ids=ids, distances=dists, timing_info=SearchTimingInfo())

    def add(self, vectors, ids=None, **kwargs):
        vectors = to_f32(vectors)
        if ids is None:
            ids = np.arange(self.n_total(), self.n_total() + len(vectors), dtype=np.int64)
        self.index.add_with_ids(vectors, to_i64(ids))

    def remove(self, ids):
        self.index.remove_ids(to_i64(ids))

    def save(self, directory: str):
        faiss.write_index(self.index, str(directory))

    def load(self, directory: str, **kwargs):
        self.index = faiss.read_index(str(directory))

    def centroids(self):
        base = faiss.downcast_index(self.index.index)
        if isinstance(base, faiss.IndexIVFFlat):
            return faiss.vector_to_array(base.quantizer.codes).view(np.float32)
        return None

    def n_total(self) -> int:
        return self.index.ntotal if self.index else 0

    def maintenance(self):
        return None

    def d(self) -> int:
        return self.index.d if self.index else 0

    def index_state(self) -> dict:
        base = faiss.downcast_index(self.index.index)
        nlist = base.nlist if isinstance(base, faiss.IndexIVFFlat) else 1
        return {"n_list": nlist, "n_total": self.n_total()}
