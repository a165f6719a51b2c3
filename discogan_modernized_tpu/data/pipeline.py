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

import os
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
                 workers: Optional[int] = None, cache: Optional[bool] = None,
                 device_cache: Optional[bool] = None):
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
        if workers is None:
            workers = min(8, os.cpu_count() or 1)
        self.workers = max(1, workers)
        self._pool = None
        # Decoded-sample cache: first touch of each sample pays the decode,
        # every later epoch is a page-cache-speed memmap read with
        # bit-identical numerics (data/cache.py). Opt out with cache=False
        # or DISCOGAN_DATA_CACHE=0.
        self.cache_A = self.cache_B = None
        from .cache import DecodedCache, cache_enabled

        if cache is None:
            cache = cache_enabled()
        if cache:
            try:
                if self.paths_A:
                    self.cache_A = DecodedCache(self.data_A, domain_A, image_size)
                if self.paths_B:
                    self.cache_B = DecodedCache(self.data_B, domain_B, image_size)
            except OSError as e:  # cache larger than free disk: run uncached
                print(f"디코딩 캐시 비활성화: {e}")
                self.cache_A = self.cache_B = None
        # Device-resident dataset: when the decoded dataset fits an HBM
        # budget, keep BOTH domains on the chip and gather batches on
        # device — zero per-step H2D (the per-batch transfer otherwise
        # bounds throughput; through the dev tunnel it is ~50 MB/s).
        self._dev_A = self._dev_B = None
        if device_cache is None:
            device_cache = (device_put
                            and os.environ.get("DISCOGAN_DEVICE_CACHE", "1") != "0"
                            and self._fits_device_budget())
        self.device_cache = bool(device_cache) and device_put

    @property
    def n_batches(self) -> int:
        return min(len(self.data_A), len(self.data_B)) // self.batch_size

    @staticmethod
    def _device_dtype():
        """HBM-resident dataset dtype. DISCOGAN_DEVICE_CACHE_BF16=1 stores
        bf16 instead of f32 — double the resident images per budget and
        half the one-time H2D bytes. Under the (default-on-TPU) bf16
        compute policy this is numerically transparent up to the recon
        target: the step's first op casts inputs to bf16 anyway, so only
        MSE(ABA, A)'s reference image carries the one-time rounding. Keep
        f32 (default) for f32-policy runs and the fidelity gates."""
        if os.environ.get("DISCOGAN_DEVICE_CACHE_BF16") == "1":
            import jax.numpy as jnp

            return jnp.bfloat16
        return np.float32

    def _fits_device_budget(self, n_shards: int = 1) -> bool:
        """True when both decoded domains fit the PER-DEVICE HBM budget
        (DISCOGAN_DEVICE_CACHE_BUDGET bytes; default 30% of the reported
        HBM limit, or 4 GB when the backend hides memory stats).
        n_shards: devices the LOCAL data will be row-sharded over
        (device_data_sharded) — each device holds 1/n_shards of it."""
        per = (self.image_size * self.image_size * 3
               * np.dtype(self._device_dtype()).itemsize)
        need = (len(self.data_A) + len(self.data_B)) * per / max(1, n_shards)
        budget = os.environ.get("DISCOGAN_DEVICE_CACHE_BUDGET")
        if budget is not None:
            return need <= int(float(budget))
        limit = None
        try:
            import jax

            stats = jax.devices()[0].memory_stats()
            limit = (stats or {}).get("bytes_limit")
        except Exception:  # backend without memory stats (the dev tunnel)
            limit = None
        return need <= (0.3 * limit if limit else 4e9)

    def _build_device_dataset(self):
        """Decode every sample once (through the disk cache) and pin both
        domains in HBM. Decode failures substitute a random image, like the
        reference's DataLoader path (dataset.py:258-261), keeping counts —
        and therefore jitted batch shapes — stable."""
        import jax
        import jax.numpy as jnp

        dtype = self._device_dtype()

        def build(data, is_paths, domain, cache):
            if not is_paths:
                return jax.device_put(np.asarray(data, np.float32)
                                      .astype(dtype))
            chunks = []
            chunk = 256
            paths = [str(p) for p in data]
            for i in range(0, len(paths), chunk):
                # Thread-pool decode through the shared path (cache
                # read/fill + parallel workers — the one-time cold decode
                # is the only decode cost the scan path ever pays).
                arrs = self._decode_paths(paths[i:i + chunk], domain,
                                          cache, keep_positions=True)
                arrs = [a if a is not None else np.random.rand(
                            self.image_size, self.image_size, 3
                        ).astype(np.float32)
                        for a in arrs]
                chunks.append(jax.device_put(np.stack(arrs).astype(dtype)))
            return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 \
                else chunks[0]

        self._dev_A = build(self.data_A, self.paths_A, self.domain_A,
                            self.cache_A)
        self._dev_B = build(self.data_B, self.paths_B, self.domain_B,
                            self.cache_B)
        for c in (self.cache_A, self.cache_B):
            if c is not None:
                c.flush()

    def device_data(self):
        """(dev_A, dev_B): the HBM-resident decoded datasets (built on
        first use). Only valid when device_cache is enabled."""
        if not self.device_cache:
            raise RuntimeError("device_data() requires device_cache=True")
        if self._dev_A is None:
            self._build_device_dataset()
        return self._dev_A, self._dev_B

    def device_data_sharded(self, mesh):
        """HBM-resident decoded datasets SHARDED over `mesh`'s data axis.

        Returns (dev_A, dev_B, shard_len_A, shard_len_B): global
        (N, H, W, 3) jax.Arrays laid out P(data) — every device pins its
        own private row block of the decoded dataset (the
        DistributedSampler shard analog, ref distributed_image_translation
        .py:203-208, but resident in HBM) — plus the per-device shard
        lengths the index generator needs. This process decodes only its
        own rows (self.data_* is already the per-host shard in multi-
        process runs), truncated to a multiple of its local device count
        so shards stay equal; the consumer gathers per-device batches
        with LOCAL indices in [0, shard_len) (parallel/dp.py
        make_dp_scan_train_step).
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..core.mesh import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
        n_local = max(1, n_data // jax.process_count())
        sharding = NamedSharding(mesh, P(DATA_AXIS))
        dtype = self._device_dtype()

        def build(data, is_paths, domain, cache):
            L = len(data) // n_local
            if L == 0:
                raise ValueError(
                    f"dataset smaller than the local device count "
                    f"({len(data)} < {n_local}) — every device shard "
                    f"needs at least one sample")
            keep = L * n_local
            if not is_paths:
                local = np.asarray(data[:keep], np.float32)
            else:
                local = np.empty(
                    (keep, self.image_size, self.image_size, 3), np.float32)
                paths = [str(p) for p in data[:keep]]
                chunk = 256
                for i in range(0, keep, chunk):
                    arrs = self._decode_paths(paths[i:i + chunk], domain,
                                              cache, keep_positions=True)
                    arrs = [a if a is not None else np.random.rand(
                                self.image_size, self.image_size, 3
                            ).astype(np.float32)
                            for a in arrs]
                    local[i:i + len(arrs)] = np.stack(arrs)
            if np.dtype(dtype) != np.float32:
                local = local.astype(dtype)
            return jax.make_array_from_process_local_data(sharding, local), L

        dev_A, L_A = build(self.data_A, self.paths_A, self.domain_A,
                           self.cache_A)
        dev_B, L_B = build(self.data_B, self.paths_B, self.domain_B,
                           self.cache_B)
        for c in (self.cache_A, self.cache_B):
            if c is not None:
                c.flush()
        return dev_A, dev_B, L_A, L_B

    def sharded_epoch_indices(self, mesh, batch_size: int, n_batches: int,
                              shard_len_A: int, shard_len_B: int,
                              shuffle: bool = True):
        """One epoch of LOCAL gather-index rows for the DP scan program.

        Returns (idx_A, idx_B): (n_batches, batch_size) int32, where
        batch_size is this process's local batch and columns are blocked
        per local device — column block j holds indices into local device
        j's own dataset shard (an independent permutation per shard: the
        per-rank unpaired shuffle, ref dataset.py:24-35 under
        DistributedSampler). Row i, assembled across processes with
        P(None, data) sharding, is the global batch of step i."""
        import jax

        from ..core.mesh import DATA_AXIS

        n_local = max(1, mesh.shape[DATA_AXIS] // jax.process_count())
        if batch_size % n_local:
            raise ValueError(
                f"batch_size {batch_size} must divide over the "
                f"{n_local} local devices")
        pdb = batch_size // n_local
        # DISCOGAN_EPOCH_SHUFFLE=0: deterministic arange order instead of
        # per-shard permutations — lets multi-process trajectories be
        # replayed exactly in tests (tests/test_multihost.py DP-scan
        # equality). Training semantics are unchanged by default.
        if os.environ.get("DISCOGAN_EPOCH_SHUFFLE", "1") == "0":
            shuffle = False

        def perms(L):
            out = np.empty((n_batches, n_local, pdb), np.int32)
            for j in range(n_local):
                p = (np.random.permutation(L) if shuffle
                     else np.arange(L, dtype=np.int64))
                # L >= pdb * n_batches always holds (both are floor-
                # truncations of the same host shard), so one epoch never
                # repeats a sample within a shard.
                out[:, j, :] = p[:n_batches * pdb].reshape(n_batches, pdb)
            return out.reshape(n_batches, batch_size)

        return perms(shard_len_A), perms(shard_len_B)

    def release_device_cache(self):
        """Drop the HBM-resident datasets and fall back to host-side batch
        feeding. Used when a consumer's device program failed for memory
        reasons (train/loop.py scan-compile fallback at 512px) — the
        decoded-sample disk cache still serves the host path, so decode
        work is not repeated."""
        self._dev_A = self._dev_B = None
        self.device_cache = False

    def epoch_perms(self, shuffle: bool = True):
        """One epoch's independent per-domain permutations (unpaired
        shuffle semantics, ref dataset.py:24-35) as host index arrays —
        for index-driven consumers (the scanned multi-step train program)."""
        nA, nB = len(self.data_A), len(self.data_B)
        if shuffle:
            return np.random.permutation(nA), np.random.permutation(nB)
        return np.arange(nA), np.arange(nB)

    def _device_epoch(self, shuffle: bool, skip: int = 0):
        """On-device batch gathering: per-domain permutations generated on
        host (same unpaired-shuffle semantics as shuffle_data), batches
        sliced out of the HBM-resident dataset — no image bytes cross the
        host<->device boundary after the one-time build."""
        if self._dev_A is None:
            self._build_device_dataset()
        import jax.numpy as jnp

        nA, nB = self._dev_A.shape[0], self._dev_B.shape[0]
        pa = np.random.permutation(nA) if shuffle else np.arange(nA)
        pb = np.random.permutation(nB) if shuffle else np.arange(nB)
        b = self.batch_size
        for i in range(skip, self.n_batches):
            ia = jnp.asarray(pa[i * b:(i + 1) * b])
            ib = jnp.asarray(pb[i * b:(i + 1) * b])
            yield self._dev_A[ia], self._dev_B[ib]

    def _decode_paths(self, paths, domain, cache, keep_positions=False):
        """Decode a list of paths, reading/filling the sample cache.
        Failed decodes are skipped (ref dataset.py:44-46) and remembered.
        keep_positions=True returns the raw per-path list (None for
        failures) instead of the compacted stack — required by consumers
        whose downstream shapes must stay len(paths) (the HBM device
        dataset)."""
        from .preprocess import decode_image

        out = [None] * len(paths)
        missing = []
        if cache is not None:
            from .cache import _STATUS_OK, _STATUS_UNKNOWN

            for j, p in enumerate(paths):
                st, arr = cache.load(p)
                if st == _STATUS_OK:
                    out[j] = arr
                elif st == _STATUS_UNKNOWN:
                    missing.append(j)
                # failed: leave None, skip without re-decoding every epoch
        else:
            missing = list(range(len(paths)))

        if missing:
            def work(j):
                return j, decode_image(paths[j], domain, self.image_size,
                                       on_error="none")

            if self.workers > 1 and len(missing) > 1:
                from concurrent.futures import ThreadPoolExecutor

                if self._pool is None:
                    self._pool = ThreadPoolExecutor(max_workers=self.workers)
                results = self._pool.map(work, missing)
            else:
                results = map(work, missing)
            for j, arr in results:
                out[j] = arr
                if cache is not None:
                    cache.store(paths[j], arr)

        if keep_positions:
            return out
        images = [o for o in out if o is not None]
        if not images:
            raise ValueError("유효한 이미지가 없습니다.")
        return np.stack(images)

    def _decode(self, batch, is_paths: bool, domain, cache=None):
        if not is_paths:
            return np.asarray(batch, np.float32)
        return self._decode_paths([str(p) for p in batch], domain, cache)

    def epoch(self, shuffle: bool = True, skip: int = 0):
        """Yield (A, B) batches; independent per-domain shuffle each epoch
        (unpaired training, ref dataset.py:24-35). skip: start at batch
        index `skip` WITHOUT decoding/transferring the skipped prefix
        (mid-epoch --resume; shuffles are fresh per epoch, so skipping by
        index loses nothing)."""
        if self.device_cache:
            return self._device_epoch(shuffle, skip)
        return self._host_epoch(shuffle, skip)

    def _host_epoch(self, shuffle: bool, skip: int = 0):
        da, db = (shuffle_data(self.data_A, self.data_B) if shuffle
                  else (self.data_A, self.data_B))
        n = self.n_batches
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # A plain q.put can block forever if the consumer abandons the
            # generator mid-epoch (preemption return, exception) with the
            # queue full — leaking this thread and its decoded batches.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for i in range(skip, n):
                    if stop.is_set():
                        return
                    sl = slice(i * self.batch_size, (i + 1) * self.batch_size)
                    A = self._decode(da[sl], self.paths_A, self.domain_A,
                                     self.cache_A)
                    B = self._decode(db[sl], self.paths_B, self.domain_B,
                                     self.cache_B)
                    if not put_or_stop((A, B)):
                        return
                put_or_stop(None)
            except Exception as e:  # surface decode crashes to the consumer
                put_or_stop(e)

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
            for c in (self.cache_A, self.cache_B):
                if c is not None:
                    c.flush()
