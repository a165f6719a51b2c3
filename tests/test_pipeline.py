"""Input pipeline: prefetch loader behavior with paths and arrays."""

import numpy as np
import pytest
from PIL import Image

from discogan_modernized_tpu.data.pipeline import PrefetchLoader, synthetic_pair


@pytest.fixture()
def image_files(tmp_path):
    rng = np.random.RandomState(0)
    files = []
    for i in range(20):
        p = tmp_path / f"{i}.jpg"
        # 512-wide AB images (256 edge + 256 photo), like edges2shoes.
        Image.fromarray((rng.rand(64, 512, 3) * 255).astype(np.uint8)).save(p)
        files.append(str(p))
    return files


def test_loader_paths_with_parallel_decode(image_files):
    loader = PrefetchLoader(image_files, image_files, batch_size=4,
                            image_size=16, domain_A="A", domain_B="B",
                            device_put=False, workers=4)
    batches = list(loader.epoch(shuffle=False))
    assert len(batches) == 5
    A, B = batches[0]
    assert A.shape == (4, 16, 16, 3) and B.shape == (4, 16, 16, 3)
    assert A.dtype == np.float32


def test_parallel_decode_equals_serial(image_files):
    l1 = PrefetchLoader(image_files, image_files, 4, 16, domain_A="A",
                        device_put=False, workers=1)
    l8 = PrefetchLoader(image_files, image_files, 4, 16, domain_A="A",
                        device_put=False, workers=8)
    for (a1, b1), (a8, b8) in zip(l1.epoch(shuffle=False),
                                  l8.epoch(shuffle=False)):
        np.testing.assert_array_equal(a1, a8)
        np.testing.assert_array_equal(b1, b8)


def test_loader_skips_bad_files(image_files, tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"junk")
    files = image_files[:3] + [str(bad)]
    loader = PrefetchLoader(files, files, batch_size=4, image_size=16,
                            device_put=False, workers=4)
    (A, B), = list(loader.epoch(shuffle=False))
    assert A.shape[0] == 3  # bad file skipped (ref read_images behavior)


def test_loader_arrays_passthrough():
    a, b = synthetic_pair(12, 16)
    loader = PrefetchLoader(a, b, batch_size=4, image_size=16,
                            device_put=False)
    batches = list(loader.epoch(shuffle=False))
    assert len(batches) == 3
    np.testing.assert_array_equal(batches[0][0], a[:4])


def test_epoch_shuffle_is_unpaired():
    a, b = synthetic_pair(32, 8, seed=0)
    loader = PrefetchLoader(a, b, batch_size=32, image_size=8,
                            device_put=False)
    np.random.seed(0)
    (A1, B1), = list(loader.epoch(shuffle=True))
    # Contents preserved under independent permutations.
    assert sorted(A1.sum(axis=(1, 2, 3)).tolist()) == \
        pytest.approx(sorted(a.sum(axis=(1, 2, 3)).tolist()))
