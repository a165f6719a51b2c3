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
        if not self._complete():
            free = shutil.disk_usage(root).free
            if nbytes > free * 0.8:
                raise OSError(
                    f"decoded-sample cache needs {nbytes / 1e9:.1f} GB, "
                    f"only {free / 1e9:.1f} GB free under {root}")
            # Serialize CREATION under an exclusive-create lock: if two
            # processes (concurrent HP-search trials of the same task)
            # both miss, the second 'w+' open would TRUNCATE data the
            # first already wrote through its live mapping — a zeroed
            # sample could then be recorded STATUS_OK forever. Once the
            # files exist at full size, concurrent 'r+' writers are safe:
            # decode is deterministic (identical bytes) and validity is
            # per-sample via the status flags.
            self._create_locked(root, digest)
            self._evict_stale(root, digest)
        self.data = np.memmap(self.data_path, dtype=np.float32, mode="r+",
                              shape=self.shape)
        self.status = np.memmap(self.status_path, dtype=np.uint8, mode="r+",
                                shape=(len(self.paths),))
        # Stored samples whose STATUS_OK flag is withheld until their data
        # pages are msync'd (see store(); flushed in batches — a per-sample
        # synchronous msync added a disk-flush stall to every cold-path
        # decode, ~3MB/sample at 512px).
        self._pending: list[int] = []
        self._pending_set: set[int] = set()
        meta = root / f"{digest}.json"
        if not meta.exists():
            meta.write_text(json.dumps({
                "domain": domain, "image_size": image_size, "n": n,
                "first_path": self.paths[0] if self.paths else None}))

    def _complete(self) -> bool:
        """Both backing files exist at their final size."""
        n = len(self.paths)
        try:
            return (self.data_path.stat().st_size
                    == int(np.prod(self.shape)) * 4
                    and self.status_path.stat().st_size == n)
        except OSError:
            return False

    def _create_locked(self, root: Path, digest: str):
        """Allocate the backing files exactly once across processes."""
        import time

        lock = root / f"{digest}.lock"
        # > the 600s recycled-pid steal horizon, so a waiter steals a
        # stuck lock before its own deadline kills it.
        deadline = time.time() + 900

        def _lock_stale(path) -> bool:
            """A lock is stale iff its recorded owner pid is dead (pid
            liveness, not mtime — a live creator never needs stealing,
            and a dead one can never truncate concurrently). Pid-less or
            unreadable locks (older format / mid-write) fall back to the
            120s mtime heuristic."""
            try:
                txt = path.read_text().strip()
            except OSError:
                return False  # vanished — not ours to steal
            if txt.isdigit():
                try:
                    os.kill(int(txt), 0)
                    # Owner pid alive — but pids recycle: a crashed
                    # creator's pid reused by an unrelated long-lived
                    # process would otherwise hold the lock forever
                    # (waiters would spin to the 600s deadline and die).
                    # A creator only needs the lock for one file
                    # allocation, so anything older than 600s is stale
                    # regardless; stealing wrongly is harmless now that
                    # creation is non-truncating.
                    try:
                        return time.time() - path.stat().st_mtime > 600
                    except OSError:
                        return False
                except ProcessLookupError:
                    return True
                except OSError:
                    return False  # e.g. EPERM: alive, different user
            try:
                return time.time() - path.stat().st_mtime > 120
            except OSError:
                return False

        while not self._complete():
            try:
                fd = os.open(str(lock),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o666)
                # Record the owner so waiters can distinguish a crashed
                # creator from a slow one.
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
            except FileExistsError:
                # Another process is creating; wait. Locks left by a
                # CRASHED creator are stolen via ATOMIC RENAME: a plain
                # stat-then-unlink has a TOCTOU where the unlink can remove
                # a lock a NEW creator just acquired, letting two processes
                # run the truncating 'w+' creation concurrently. Renaming
                # gives us exclusive ownership of whatever instance was at
                # the lock path; we re-verify THAT instance's owner and, if
                # we raced a live creator, restore it with os.link — which
                # FAILS rather than clobbering any newer lock (the hole a
                # rename-back restore would reopen).
                try:
                    if _lock_stale(lock):
                        grabbed = lock.with_suffix(
                            f".lock.stale.{os.getpid()}")
                        try:
                            os.rename(lock, grabbed)
                        except OSError:
                            continue  # creator finished or another stealer won
                        if _lock_stale(grabbed):
                            grabbed.unlink(missing_ok=True)
                            continue
                        # Grabbed a LIVE lock (a new creator raced in
                        # between our check and rename) — restore it
                        # without clobbering anything newer.
                        try:
                            os.link(grabbed, lock)
                        except OSError:
                            pass  # an even newer lock exists; leave it be
                        grabbed.unlink(missing_ok=True)
                except OSError:
                    continue
                if time.time() > deadline:
                    raise OSError(f"timed out waiting for cache creation "
                                  f"lock {lock}")
                time.sleep(0.1)
                continue
            try:
                if not self._complete():
                    # NON-DESTRUCTIVE allocation: O_CREAT without O_TRUNC
                    # + ftruncate to the final size. ftruncate to the
                    # same size is a no-op on existing content, and newly
                    # extended bytes read as zeros = the correct
                    # "not yet decoded" status. So even if two processes
                    # ever reach this block concurrently (the lock is
                    # best-effort against crashed-creator races), neither
                    # can zero samples a sibling already decoded — unlike
                    # the truncating memmap 'w+' this replaces.
                    def _needs(path, size) -> bool:
                        try:
                            return os.stat(path).st_size != size
                        except OSError:
                            return True

                    def _alloc(path, size):
                        fd = os.open(str(path), os.O_CREAT | os.O_RDWR,
                                     0o666)
                        try:
                            os.ftruncate(fd, size)
                        finally:
                            os.close(fd)

                    if _needs(self.data_path,
                              int(np.prod(self.shape)) * 4):
                        # The data file is about to be (re)created or
                        # resized: any surviving STATUS_OK flags would mark
                        # zeroed / re-based samples as valid (e.g. the .dat
                        # was deleted by disk cleanup while the tiny
                        # .status survived). Invalidate them BEFORE the new
                        # data file can exist, and fsync, so no crash or
                        # power-loss ordering can leave a complete-looking
                        # (data, stale-OK-status) pair behind.
                        try:
                            fd = os.open(str(self.status_path), os.O_RDWR)
                        except OSError:
                            pass  # no status file yet — created zeroed below
                        else:
                            try:
                                os.write(fd, b"\x00" * len(self.paths))
                                os.fsync(fd)
                            finally:
                                os.close(fd)
                    _alloc(self.data_path, int(np.prod(self.shape)) * 4)
                    _alloc(self.status_path, len(self.paths))
            finally:
                try:
                    lock.unlink()
                except OSError:
                    pass
            return

    def _evict_stale(self, root: Path, digest: str):
        """Delete older cache generations of the SAME dataset.

        Touching/re-exporting a source image changes the fingerprint, so
        without eviction every edit would orphan a full-dataset-size
        memmap forever. Identity = (first_path, domain, image_size, n)
        recorded in each digest's meta json."""
        ident = {"domain": self.domain, "image_size": self.image_size,
                 "n": len(self.paths),
                 "first_path": self.paths[0] if self.paths else None}
        for meta in root.glob("*.json"):
            if meta.stem == digest:
                continue
            try:
                other = json.loads(meta.read_text())
            except (OSError, ValueError):
                continue
            if all(other.get(k) == v for k, v in ident.items()):
                for suffix in (".dat", ".status", ".json", ".lock"):
                    try:
                        (root / (meta.stem + suffix)).unlink()
                    except OSError:
                        pass

    def load(self, path: str):
        i = self.index.get(str(path))
        if i is None:
            return _STATUS_UNKNOWN, None
        st = int(self.status[i])
        if st != _STATUS_OK and i in self._pending_set:
            st = _STATUS_OK  # stored in-process, OK flag awaiting batch sync
        if st == _STATUS_OK:
            return st, np.array(self.data[i], copy=True)
        return st, None

    # STATUS_OK publication batch size: one msync per N stores instead of
    # per sample (the sync guards a rare OS/power-crash write-reorder
    # window; batching keeps the guarantee — OK flags only ever follow
    # their data pages to disk — without a per-sample flush stall on the
    # cold decode path).
    _SYNC_EVERY = 64

    def store(self, path: str, arr: Optional[np.ndarray]):
        i = self.index.get(str(path))
        if i is None:
            return
        if arr is None:
            self.status[i] = _STATUS_FAILED
        else:
            self.data[i] = arr
            # Write-ordering: the kernel flushes dirty pages of the two
            # memmaps in arbitrary order, so an OS/power crash could
            # persist STATUS_OK while the data page holds zeros — a
            # permanently poisoned sample the fingerprint can't catch
            # (the same window the creation path closes with its fsync'd
            # status invalidation, _create_locked). Defer the OK flag
            # until the data pages are msync'd — in batches, so the cold
            # path pays one flush per _SYNC_EVERY decodes. A crash before
            # publication re-decodes at most one batch (deterministic
            # output — no correctness cost).
            self._pending.append(i)
            self._pending_set.add(i)
            if len(self._pending) >= self._SYNC_EVERY:
                self._publish_pending()

    def _publish_pending(self):
        """msync the pending samples' data pages, THEN set their OK flags."""
        if not self._pending:
            return
        import mmap as _mmap

        try:
            stride = self.data.strides[0]
            gran = _mmap.ALLOCATIONGRANULARITY
            lo, hi = min(self._pending), max(self._pending)
            start = (lo * stride // gran) * gran
            end = min((hi + 1) * stride, self.data.nbytes)
            # One coalesced range: clean pages inside it cost nothing.
            self.data.base.flush(start, end - start)
        except Exception:
            # Fall back to a full flush (correct, just coarser).
            self.data.flush()
        for i in self._pending:
            self.status[i] = _STATUS_OK
        self._pending.clear()
        self._pending_set.clear()

    @property
    def hit_fraction(self) -> float:
        return float(np.mean(self.status != _STATUS_UNKNOWN)) if len(self.paths) else 1.0

    def flush(self):
        self._publish_pending()
        self.data.flush()
        self.status.flush()
