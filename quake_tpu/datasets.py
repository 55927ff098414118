"""Dataset loaders for ANN benchmarks.

Mirrors reference src/python/datasets/ann_datasets.py:43-86: a Dataset ABC,
SIFT1M (download + fvecs/ivecs parsing), and a `load_dataset` name registry.
Adds synthetic datasets that work in zero-egress environments.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from abc import ABC, abstractmethod
from pathlib import Path

import numpy as np

from quake_tpu.utils import fvecs_read, ivecs_read


class Dataset(ABC):
    """A dataset is (base vectors, queries, ground truth ids)."""

    url: str = ""
    metric: str = "l2"

    def __init__(self, download_dir: str | None = None):
        # Offline ingestion path: point QUAKE_TPU_DATA_DIR at a directory of
        # pre-downloaded dataset files (e.g. sift/sift_base.fvecs) and every
        # loader picks them up without network access — the zero-egress
        # equivalent of the reference's downloader (ann_datasets.py:43-86).
        # Only the *default* (None) consults the env var: an explicitly
        # passed directory — including "data" — always wins.
        if download_dir is None:
            download_dir = os.environ.get("QUAKE_TPU_DATA_DIR", "data")
        self.download_dir = Path(download_dir)

    @abstractmethod
    def load(self):
        """Returns (vectors [n,d] f32, queries [nq,d] f32, gt_ids [nq,k] i64)."""

    def is_downloaded(self) -> bool:
        return False

    def download(self):
        self.download_dir.mkdir(parents=True, exist_ok=True)
        fname = self.download_dir / os.path.basename(self.url)
        if not fname.exists():
            urllib.request.urlretrieve(self.url, fname)
        if str(fname).endswith(("tar.gz", ".tgz")):
            with tarfile.open(fname) as tar:
                tar.extractall(self.download_dir)


class Sift1m(Dataset):
    """SIFT1M (ann_datasets.py): 1M x 128 L2, fvecs/ivecs format."""

    url = "ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz"
    metric = "l2"

    def _root(self) -> Path:
        # Accept both the extracted tarball layout (<dir>/sift/...) and a
        # flat drop of the three fvecs/ivecs files directly in <dir>.
        if (self.download_dir / "sift" / "sift_base.fvecs").exists():
            return self.download_dir / "sift"
        return self.download_dir

    def is_downloaded(self) -> bool:
        return (self._root() / "sift_base.fvecs").exists()

    def load(self):
        if not self.is_downloaded():
            self.download()
        root = self._root()
        base = fvecs_read(str(root / "sift_base.fvecs"))
        queries = fvecs_read(str(root / "sift_query.fvecs"))
        gt = ivecs_read(str(root / "sift_groundtruth.ivecs"))
        return base, queries, gt.astype(np.int64)


class RandomDataset(Dataset):
    """Synthetic gaussian dataset (no download needed)."""

    metric = "l2"

    def __init__(self, download_dir: str | None = None, n: int = 100_000, d: int = 64,
                 nq: int = 1000, seed: int = 0):
        super().__init__(download_dir)
        self.n, self.d, self.nq, self.seed = n, d, nq, seed

    def is_downloaded(self) -> bool:
        return True

    def load(self):
        from quake_tpu.utils import knn

        rng = np.random.default_rng(self.seed)
        base = rng.standard_normal((self.n, self.d)).astype(np.float32)
        queries = rng.standard_normal((self.nq, self.d)).astype(np.float32)
        gt, _ = knn(queries, base, 100, self.metric)
        return base, queries, gt


class ClusteredDataset(Dataset):
    """Synthetic clustered dataset mimicking SIFT-like IVF behavior
    (recall rises steeply with nprobe). Used by the regression harness when
    real datasets cannot be downloaded."""

    metric = "l2"

    def __init__(self, download_dir: str | None = None, n: int = 100_000, d: int = 64,
                 nq: int = 1000, n_centers: int = 512, spread: float = 4.0,
                 seed: int = 0):
        super().__init__(download_dir)
        self.n, self.d, self.nq = n, d, nq
        self.n_centers, self.spread, self.seed = n_centers, spread, seed

    def is_downloaded(self) -> bool:
        return True

    def load(self):
        from quake_tpu.utils import knn

        rng = np.random.default_rng(self.seed)
        centers = rng.standard_normal((self.n_centers, self.d)).astype(np.float32)
        centers *= self.spread
        assign = rng.integers(0, self.n_centers, self.n)
        base = (centers[assign] + rng.standard_normal((self.n, self.d))).astype(np.float32)
        q_assign = rng.integers(0, self.n_centers, self.nq)
        queries = (centers[q_assign] + rng.standard_normal((self.nq, self.d))).astype(
            np.float32
        )
        gt, _ = knn(queries, base, 100, self.metric)
        return base, queries, gt


_REGISTRY = {
    "sift1m": Sift1m,
    "random": RandomDataset,
    "clustered": ClusteredDataset,
}


def load_dataset(name: str, download_dir: str | None = None, **kwargs):
    """Registry entry point (ann_datasets.py:76-86)."""
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"Unknown dataset {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key](download_dir, **kwargs).load()
