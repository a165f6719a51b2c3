"""Decoded-sample cache: bit-identical numerics, decode skipped on hits,
fingerprint invalidation, failure memoization, opt-out."""

import os
import time

import numpy as np
import pytest
from PIL import Image
from pathlib import Path

from discogan_modernized_tpu.data.pipeline import PrefetchLoader


@pytest.fixture()
def ab_files(tmp_path):
    rng = np.random.RandomState(7)
    files = []
    for i in range(12):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray((rng.rand(64, 512, 3) * 255).astype(np.uint8)).save(p)
        files.append(str(p))
    return files


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    monkeypatch.setenv("DISCOGAN_CACHE_DIR", str(d))
    return d


def _count_decodes(monkeypatch):
    import discogan_modernized_tpu.data.preprocess as pp

    calls = {"n": 0}
    real = pp.decode_image

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(
        "discogan_modernized_tpu.data.pipeline.decode_image", counting,
        raising=False)
    import discogan_modernized_tpu.data.pipeline as pl  # noqa: F401
    # _decode_paths imports decode_image from .preprocess at call time:
    monkeypatch.setattr(pp, "decode_image", counting)
    return calls


def test_cache_hits_are_bit_identical_and_skip_decode(ab_files, cache_dir,
                                                      monkeypatch):
    calls = _count_decodes(monkeypatch)
    loader = PrefetchLoader(ab_files, ab_files, batch_size=4, image_size=16,
                            domain_A="A", domain_B="B", device_put=False)
    epoch0 = [(
        a.copy(), b.copy()) for a, b in loader.epoch(shuffle=False)]
    n_after_epoch0 = calls["n"]
    assert n_after_epoch0 == 24  # 12 per domain, each decoded once

    epoch1 = [(a.copy(), b.copy()) for a, b in loader.epoch(shuffle=False)]
    assert calls["n"] == n_after_epoch0  # zero decodes on epoch 1
    for (a0, b0), (a1, b1) in zip(epoch0, epoch1):
        np.testing.assert_array_equal(a0, a1)
        np.testing.assert_array_equal(b0, b1)

    # A new loader over the same dataset reuses the on-disk cache.
    loader2 = PrefetchLoader(ab_files, ab_files, batch_size=4, image_size=16,
                             domain_A="A", domain_B="B", device_put=False)
    _ = list(loader2.epoch(shuffle=False))
    assert calls["n"] == n_after_epoch0


def test_cache_fingerprint_invalidates_on_file_change(ab_files, cache_dir,
                                                      monkeypatch):
    calls = _count_decodes(monkeypatch)
    loader = PrefetchLoader(ab_files[:2], ab_files[:2], 2, 16,
                            domain_A="A", domain_B="B", device_put=False)
    _ = list(loader.epoch(shuffle=False))
    base = calls["n"]

    # Touch one file with different content -> new fingerprint -> re-decode.
    rng = np.random.RandomState(99)
    Image.fromarray((rng.rand(64, 512, 3) * 255).astype(np.uint8)) \
        .save(ab_files[0])
    now = time.time() + 10
    os.utime(ab_files[0], (now, now))
    loader2 = PrefetchLoader(ab_files[:2], ab_files[:2], 2, 16,
                             domain_A="A", domain_B="B", device_put=False)
    _ = list(loader2.epoch(shuffle=False))
    assert calls["n"] > base


def test_cache_remembers_failures(tmp_path, cache_dir, monkeypatch):
    good = tmp_path / "good.jpg"
    Image.fromarray((np.random.RandomState(0).rand(64, 512, 3) * 255)
                    .astype(np.uint8)).save(good)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"junk")
    files = [str(good), str(bad)]

    calls = _count_decodes(monkeypatch)
    loader = PrefetchLoader(files, files, batch_size=2, image_size=16,
                            device_put=False, workers=1)
    (A0, _), = list(loader.epoch(shuffle=False))
    assert A0.shape[0] == 1  # bad skipped
    n0 = calls["n"]
    (A1, _), = list(loader.epoch(shuffle=False))
    assert A1.shape[0] == 1
    assert calls["n"] == n0  # failure memoized: no re-decode of bad.jpg
    np.testing.assert_array_equal(A0, A1)


def test_device_cache_serves_batches_without_host_decode(ab_files, cache_dir,
                                                         monkeypatch):
    """Device-resident dataset: one decode pass at build, then every epoch
    gathers batches on device — no further decode_image calls, contents
    identical to the host path."""
    calls = _count_decodes(monkeypatch)
    host = PrefetchLoader(ab_files, ab_files, 4, 16, domain_A="A",
                          domain_B="B", device_put=False, device_cache=False)
    host_batches = [(np.asarray(a), np.asarray(b))
                    for a, b in host.epoch(shuffle=False)]

    dev = PrefetchLoader(ab_files, ab_files, 4, 16, domain_A="A",
                         domain_B="B", device_put=True, device_cache=True)
    dev_batches = [(np.asarray(a), np.asarray(b))
                   for a, b in dev.epoch(shuffle=False)]
    n_after_build = calls["n"]
    assert len(dev_batches) == len(host_batches) == 3
    for (ha, hb), (da, db) in zip(host_batches, dev_batches):
        np.testing.assert_array_equal(ha, da)
        np.testing.assert_array_equal(hb, db)

    _ = list(dev.epoch(shuffle=False))
    assert calls["n"] == n_after_build  # epochs >= 1: zero host decodes


def test_device_cache_budget_gate(ab_files, cache_dir, monkeypatch):
    monkeypatch.setenv("DISCOGAN_DEVICE_CACHE_BUDGET", "1")  # 1 byte
    loader = PrefetchLoader(ab_files, ab_files, 4, 16, domain_A="A",
                            domain_B="B", device_put=True)
    assert not loader.device_cache  # too big for the budget -> host path
    monkeypatch.setenv("DISCOGAN_DEVICE_CACHE_BUDGET", str(10 ** 9))
    loader2 = PrefetchLoader(ab_files, ab_files, 4, 16, domain_A="A",
                             domain_B="B", device_put=True)
    assert loader2.device_cache


def test_cache_opt_out(ab_files, cache_dir, monkeypatch):
    calls = _count_decodes(monkeypatch)
    monkeypatch.setenv("DISCOGAN_DATA_CACHE", "0")
    loader = PrefetchLoader(ab_files[:4], ab_files[:4], 2, 16,
                            domain_A="A", domain_B="B", device_put=False)
    assert loader.cache_A is None and loader.cache_B is None
    _ = list(loader.epoch(shuffle=False))
    n0 = calls["n"]
    _ = list(loader.epoch(shuffle=False))
    assert calls["n"] == 2 * n0  # every epoch re-decodes without the cache
    assert not list(cache_dir.glob("*.dat"))


def test_cache_creation_is_race_safe(tmp_path):
    """A second DecodedCache over the same dataset must NOT truncate data
    the first already wrote (the 'w+' race: creation is serialized by an
    exclusive lock, later opens are 'r+')."""
    from discogan_modernized_tpu.data.cache import DecodedCache

    paths = [str(tmp_path / f"img{i}.jpg") for i in range(3)]
    for p in paths:
        Path(p).write_bytes(b"x")

    c1 = DecodedCache(paths, "B", 8, root=tmp_path / "cache")
    arr = np.full((8, 8, 3), 0.5, np.float32)
    c1.store(paths[0], arr)
    c1.flush()

    c2 = DecodedCache(paths, "B", 8, root=tmp_path / "cache")
    st, got = c2.load(paths[0])
    assert st == 1
    np.testing.assert_array_equal(got, arr)
    # And c1's live mapping still reads its own write.
    st, got = c1.load(paths[0])
    np.testing.assert_array_equal(got, arr)


def test_cache_evicts_stale_generation(tmp_path):
    """Re-touching a source file changes the fingerprint; the new cache
    generation deletes the orphaned previous one (same dataset identity)."""
    from discogan_modernized_tpu.data.cache import DecodedCache

    paths = [str(tmp_path / f"img{i}.jpg") for i in range(3)]
    for p in paths:
        Path(p).write_bytes(b"x")
    root = tmp_path / "cache"

    c1 = DecodedCache(paths, "B", 8, root=root)
    old_dat = c1.data_path
    assert old_dat.exists()
    del c1

    st = os.stat(paths[1])
    os.utime(paths[1], ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    c2 = DecodedCache(paths, "B", 8, root=root)
    assert c2.data_path != old_dat
    assert not old_dat.exists()  # stale generation evicted
    # A DIFFERENT dataset's cache must not be touched.
    other = DecodedCache(paths[:2], "A", 8, root=root)
    assert other.data_path.exists() and c2.data_path.exists()


def test_cache_recreation_never_truncates_existing_data(tmp_path):
    """The creation block must be NON-DESTRUCTIVE: if it runs again over
    an existing data file (lost status file, stale-lock steal racing a
    live creator), already-decoded samples survive. The old truncating
    memmap 'w+' allocation zeroed them."""
    from discogan_modernized_tpu.data.cache import DecodedCache

    paths = [str(tmp_path / f"img{i}.jpg") for i in range(3)]
    for p in paths:
        Path(p).write_bytes(b"x")

    c1 = DecodedCache(paths, "B", 8, root=tmp_path / "cache")
    arr = np.full((8, 8, 3), 0.25, np.float32)
    c1.store(paths[1], arr)
    c1.flush()
    data_path, status_path = c1.data_path, c1.status_path
    del c1

    # Lose the status file -> _complete() is False -> the next open runs
    # the creation block again over the EXISTING data file.
    status_path.unlink()
    c2 = DecodedCache(paths, "B", 8, root=tmp_path / "cache")
    assert c2.data_path == data_path
    # Status was re-zeroed (sample must be re-decoded)...
    st, _ = c2.load(paths[1])
    assert st == 0
    # ...but the data bytes themselves were NOT zeroed by the re-creation.
    raw = np.memmap(data_path, dtype=np.float32, mode="r",
                    shape=c2.shape)
    np.testing.assert_array_equal(np.asarray(raw[1]), arr)


def test_cache_data_loss_invalidates_surviving_status(tmp_path):
    """The corrupting direction of re-creation: if the DATA file is lost
    (disk cleanup) while the tiny status file survives with STATUS_OK
    flags, re-creation must invalidate those flags — otherwise zeroed
    samples would be served as valid black images forever."""
    from discogan_modernized_tpu.data.cache import DecodedCache

    paths = [str(tmp_path / f"img{i}.jpg") for i in range(3)]
    for p in paths:
        Path(p).write_bytes(b"x")

    c1 = DecodedCache(paths, "B", 8, root=tmp_path / "cache")
    arr = np.full((8, 8, 3), 0.25, np.float32)
    c1.store(paths[1], arr)
    c1.flush()
    data_path = c1.data_path
    del c1

    data_path.unlink()  # lose the data, keep the status
    c2 = DecodedCache(paths, "B", 8, root=tmp_path / "cache")
    st, _ = c2.load(paths[1])
    assert st == 0  # NOT served as a valid all-zero image
