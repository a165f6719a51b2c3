"""Input pipeline: background-decoded, prefetched, device-fed batches.

The reference's hot loop decodes every JPEG synchronously on the main
thread, every epoch, with no caching or prefetch (image_translation.py:
321-333 — its dominant input bottleneck per SURVEY §3.1); the distributed
trainer instead uses 4 DataLoader worker processes. Here a background
thread decodes ahead into a bounded queue while the accelerator computes,
and batches are handed to JAX asynchronously (dispatch returns before the
H2D copy completes, giving double buffering for free). Pre-decoded array
datasets (car2car, synthetic) bypass decode entirely.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from .preprocess import read_images, shuffle_data


def synthetic_pair(n: int, image_size: int, seed: int = 0):
    """Deterministic random image pairs for smoke tests / benchmarks
    (framework extension; not a reference task)."""
    rng = np.random.RandomState(seed)
    a = rng.rand(n, image_size, image_size, 3).astype(np.float32)
    b = rng.rand(n, image_size, image_size, 3).astype(np.float32)
    return a, b


def _is_paths(data) -> bool:
    return len(data) > 0 and isinstance(
        np.asarray(data).ravel()[0], (str, np.str_, bytes)
    )


class PrefetchLoader:
    """Per-epoch iterator over (A, B) batches.

    data_A/data_B: arrays of file paths OR pre-decoded (N,H,W,3) float32.
    domain_A/domain_B: decode-time domain tags ('A'/'B'/None), see
    preprocess.read_images.
    """

    def __init__(self, data_A, data_B, batch_size: int, image_size: int,
                 domain_A: Optional[str] = None, domain_B: Optional[str] = None,
                 prefetch: int = 3, device_put: bool = True,
                 workers: Optional[int] = None):
        self.data_A = np.asarray(data_A)
        self.data_B = np.asarray(data_B)
        self.batch_size = batch_size
        self.image_size = image_size
        self.domain_A = domain_A
        self.domain_B = domain_B
        self.prefetch = prefetch
        self.device_put = device_put
        self.paths_A = _is_paths(self.data_A)
        self.paths_B = _is_paths(self.data_B)
        # Per-image decode parallelism: PIL decode and cv2 ops release the
        # GIL, so threads scale with host cores (the reference decodes
        # serially on the main thread — its dominant bottleneck, or with 4
        # DataLoader worker processes in the DDP trainer).
        import os

        if workers is None:
            workers = min(8, os.cpu_count() or 1)
        self.workers = max(1, workers)
        self._pool = None

    @property
    def n_batches(self) -> int:
        return min(len(self.data_A), len(self.data_B)) // self.batch_size

    def _decode(self, batch, is_paths: bool, domain):
        if not is_paths:
            return np.asarray(batch, np.float32)
        if self.workers > 1 and len(batch) > 1:
            from concurrent.futures import ThreadPoolExecutor

            from .preprocess import decode_image

            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=self.workers)
            results = list(self._pool.map(
                lambda fn: decode_image(fn, domain, self.image_size,
                                        on_error="none"),
                list(batch)))
            images = [r for r in results if r is not None]
            if not images:
                raise ValueError("유효한 이미지가 없습니다.")
            return np.stack(images)
        return read_images(list(batch), domain, self.image_size)

    def epoch(self, shuffle: bool = True):
        """Yield (A, B) batches; independent per-domain shuffle each epoch
        (unpaired training, ref dataset.py:24-35)."""
        da, db = (shuffle_data(self.data_A, self.data_B) if shuffle
                  else (self.data_A, self.data_B))
        n = self.n_batches
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for i in range(n):
                    if stop.is_set():
                        return
                    sl = slice(i * self.batch_size, (i + 1) * self.batch_size)
                    A = self._decode(da[sl], self.paths_A, self.domain_A)
                    B = self._decode(db[sl], self.paths_B, self.domain_B)
                    q.put((A, B))
                q.put(None)
            except Exception as e:  # surface decode crashes to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            if self.device_put:
                import jax
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                A, B = item
                if self.device_put:
                    yield jax.device_put(A), jax.device_put(B)
                else:
                    yield A, B
        finally:
            stop.set()
