"""Decoded-sample cache: pre-materialized preprocessed arrays on disk.

The reference re-runs JPEG decode + crop/dilate/resize for every image on
every epoch (image_translation.py:321-333) — its dominant wall-clock cost
and, measured on this host, ~1% of the TPU compute path's throughput
(PERF.md). The preprocessing is deterministic (pure function of file
bytes, domain, size), so the first decode of each sample is written to a
disk-backed float32 memmap keyed by a dataset fingerprint
(paths + file sizes/mtimes + domain + image_size); every later access —
epochs >= 1, and later runs over the same dataset — is a memmap read that
the OS page cache serves at RAM speed. Numerics are bit-identical: the
cache stores the exact preprocessed float32 output.

A single flat memmap (one .dat per dataset) beats per-sample .npy files
(no per-file open syscalls in the hot loop) and an in-RAM LRU (which
thrashes to a 0% hit rate whenever the dataset exceeds the budget, while
the page cache degrades gracefully). Disabled with DISCOGAN_DATA_CACHE=0
or when the cache would not fit on disk; cache root overridable with
DISCOGAN_CACHE_DIR.

Failure semantics mirror the reference call sites: samples whose decode
fails are remembered as failed and skipped thereafter (dataset.py:44-46),
without retrying the broken file every epoch.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from pathlib import Path
from typing import Optional

import numpy as np

_STATUS_UNKNOWN = 0
_STATUS_OK = 1
_STATUS_FAILED = 2


def cache_root() -> Path:
    return Path(os.environ.get(
        "DISCOGAN_CACHE_DIR",
        str(Path.home() / ".cache" / "discogan_data")))


def cache_enabled() -> bool:
    return os.environ.get("DISCOGAN_DATA_CACHE", "1") != "0"


def _fingerprint(paths, domain: Optional[str], image_size: int) -> str:
    h = hashlib.sha1()
    h.update(f"v1|{domain}|{image_size}|{len(paths)}".encode())
    for p in paths:
        p = str(p)
        try:
            st = os.stat(p)
            h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
        except OSError:
            h.update(f"{p}|missing".encode())
    return h.hexdigest()[:20]


class DecodedCache:
    """Memmap of preprocessed samples for one (path list, domain, size).

    load(path)  -> (status, array|None); array is a fresh copy.
    store(path, array|None) -> records a decoded sample / a failure.
    """

    def __init__(self, paths, domain: Optional[str], image_size: int,
                 root: Optional[Path] = None):
        self.paths = [str(p) for p in paths]
        self.index = {p: i for i, p in enumerate(self.paths)}
        self.image_size = image_size
        self.domain = domain
        n = len(self.paths)
        self.shape = (n, image_size, image_size, 3)

        root = Path(root) if root else cache_root()
        digest = _fingerprint(self.paths, domain, image_size)
        self.data_path = root / f"{digest}.dat"
        self.status_path = root / f"{digest}.status"
        root.mkdir(parents=True, exist_ok=True)

        nbytes = int(np.prod(self.shape)) * 4 + n
        exists = self.data_path.exists() and self.status_path.exists() \
            and self.data_path.stat().st_size == nbytes - n
        if not exists:
            free = shutil.disk_usage(root).free
            if nbytes > free * 0.8:
                raise OSError(
                    f"decoded-sample cache needs {nbytes / 1e9:.1f} GB, "
                    f"only {free / 1e9:.1f} GB free under {root}")
        mode = "r+" if exists else "w+"
        self.data = np.memmap(self.data_path, dtype=np.float32, mode=mode,
                              shape=self.shape)
        self.status = np.memmap(self.status_path, dtype=np.uint8, mode=mode,
                                shape=(n,))
        meta = root / f"{digest}.json"
        if not meta.exists():
            meta.write_text(json.dumps({
                "domain": domain, "image_size": image_size, "n": n,
                "first_path": self.paths[0] if self.paths else None}))

    def load(self, path: str):
        i = self.index.get(str(path))
        if i is None:
            return _STATUS_UNKNOWN, None
        st = int(self.status[i])
        if st == _STATUS_OK:
            return st, np.array(self.data[i], copy=True)
        return st, None

    def store(self, path: str, arr: Optional[np.ndarray]):
        i = self.index.get(str(path))
        if i is None:
            return
        if arr is None:
            self.status[i] = _STATUS_FAILED
        else:
            self.data[i] = arr
            self.status[i] = _STATUS_OK

    @property
    def hit_fraction(self) -> float:
        return float(np.mean(self.status != _STATUS_UNKNOWN)) if len(self.paths) else 1.0

    def flush(self):
        self.data.flush()
        self.status.flush()
