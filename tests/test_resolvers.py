"""Task resolver behavior over a fabricated ./datasets tree
(ref dataset.py:75-191 + the restored cars/chairs/faces3d resolvers)."""

import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def fake_datasets(tmp_path, monkeypatch):
    root = tmp_path / "datasets"
    rng = np.random.RandomState(0)

    def write_img(path, w=32, h=32):
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)

    # edges2shoes train/test
    for split, n in (("train", 6), ("test", 3)):
        for i in range(n):
            write_img(root / "edges2shoes" / split / f"{i}_AB.jpg", w=512, h=256)
    # celebA
    celeba = root / "celebA"
    (celeba / "img_align_celeba").mkdir(parents=True)
    names = [f"{i:06d}.jpg" for i in range(1, 11)]
    for n_ in names:
        write_img(celeba / "img_align_celeba" / n_)
    attrs = ["Male", "Smiling"]
    lines = ["10", " ".join(attrs)]
    for i, n_ in enumerate(names):
        male = "1" if i % 2 == 0 else "-1"
        smiling = "1" if i < 5 else "-1"
        lines.append(f"{n_} {male} {smiling}")
    (celeba / "list_attr_celeba.txt").write_text("\n".join(lines) + "\n")
    # facescrub
    for grp, n in (("actors", 5), ("actresses", 5)):
        for i in range(n):
            write_img(root / "facescrub" / grp / f"face_{i}.jpg")
    # custom tops/hanbok
    for item in ("tops", "hanbok"):
        for split in ("train", "test"):
            for i in range(3):
                write_img(root / "custom" / item / split / f"{i}.jpg")
    # cars (azimuth sweep)
    for az in range(0, 180, 20):
        write_img(root / "data" / "cars" / f"car_a_{az:03d}.png")
        write_img(root / "data" / "cars" / f"car_b_{az:03d}.png")
    # chairs
    for az in range(0, 360, 30):
        write_img(root / "rendered_chairs" / "chair1" / f"render_{az:03d}.png")

    monkeypatch.setenv("DISCOGAN_DATASETS_ROOT", str(root))
    return root


def test_edge2photo_same_list_both_domains(fake_datasets):
    from discogan_modernized_tpu.data.resolvers import get_edge2photo_files

    a, b = get_edge2photo_files("edges2shoes", test=False)
    assert a == b and len(a) == 6
    at, _ = get_edge2photo_files("edges2shoes", test=True)
    assert len(at) == 3


def test_celebA_attribute_split(fake_datasets):
    from discogan_modernized_tpu.data.resolvers import get_celebA_files

    a, b = get_celebA_files("Male", "Smiling", None, None, test=False, n_test=1)
    # 5 Male rows and 5 Smiling rows, minus 1 test each.
    assert len(a) == 4 and len(b) == 4
    a2, b2 = get_celebA_files("Male", None, None, None, test=False, n_test=1)
    assert len(b2) == 4  # style_A == -1 complement


def test_facescrub_split(fake_datasets):
    from discogan_modernized_tpu.data.resolvers import get_facescrub_files

    m, f = get_facescrub_files(test=False, n_test=2)
    assert len(m) == 3 and len(f) == 3
    assert all("actors" in p for p in m)
    assert all("actresses" in p for p in f)


def test_custom_data(fake_datasets):
    from discogan_modernized_tpu.data.resolvers import get_custom_data

    a, b = get_custom_data("tops", "hanbok", test=False)
    assert len(a) == 3 and len(b) == 3


def test_cars_chairs_resolvers(fake_datasets):
    from discogan_modernized_tpu.data.resolvers import get_cars, get_chairs

    first = get_cars(test=False, ver=180, half="first", image_size=16)
    last = get_cars(test=False, ver=180, half="last", image_size=16)
    # Pre-decoded arrays (angle_pairing consumes without read_images).
    assert first.ndim == 4 and first.shape[1:] == (16, 16, 3)
    assert last.ndim == 4
    chairs = get_chairs(test=False, half="first", ver=360)
    assert chairs.dtype.kind in ("U", "S")  # paths
    assert len(chairs) > 0


def test_get_task_data_dispatch(fake_datasets):
    from types import SimpleNamespace

    from discogan_modernized_tpu.data.resolvers import get_task_data

    args = SimpleNamespace(task_name="edges2shoes", image_size=16, n_test=1,
                           style_A=None, style_B=None, constraint=None,
                           constraint_type=None)
    da, db, ta, tb = get_task_data(args)
    assert len(da) == 6 and len(ta) == 3

    args.task_name = "car2car"
    da, db, ta, tb = get_task_data(args)
    assert da.ndim == 4 and db.ndim == 4 and ta.ndim == 4


def test_celebA_constraint_filter(fake_datasets):
    from discogan_modernized_tpu.data.resolvers import get_celebA_files

    # constraint=Smiling, constraint_type='1' keeps only the 5 smiling rows.
    a, b = get_celebA_files("Male", None, "Smiling", "1", test=False, n_test=1)
    # Smiling rows are the first 5; Male alternates -> 3 male smiling, 2 not.
    assert len(a) == 2  # 3 male-smiling minus 1 test
    assert len(b) == 1  # 2 non-male-smiling minus 1 test


def test_style_A_directory_layout(tmp_path):
    """results/<task>/<style_A>/<arch>/<ts> when --style_A given
    (ref image_translation.py:226-235)."""
    from types import SimpleNamespace

    from discogan_modernized_tpu.train.loop import build_paths

    args = SimpleNamespace(results_dir=str(tmp_path / "r"),
                           models_dir=str(tmp_path / "m"),
                           task_name="celebA", style_A="Male",
                           model_arch="discogan")
    rp, mp = build_paths(args, "20260101_000000", angle_variant=False)
    assert str(rp).endswith("r/celebA/Male/discogan/20260101_000000")
    # Angle variant never inserts the style level (angle_pairing.py:190-191).
    args.task_name = "car2car"
    rp2, _ = build_paths(args, "20260101_000000", angle_variant=True)
    assert "Male" not in str(rp2)


def test_shoes2handbags_swapped_pairing(fake_datasets, tmp_path):
    """shoes2handbags = the swapped pairing (the reference's get_data has no
    branch for it and would crash with UnboundLocalError)."""
    from types import SimpleNamespace

    # Needs an edges2handbags dir too.
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(9)
    for split, n in (("train", 4), ("test", 2)):
        d = fake_datasets / "edges2handbags" / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            Image.fromarray((rng.rand(64, 512, 3) * 255).astype(np.uint8)
                            ).save(d / f"hb{i}_AB.jpg")

    from discogan_modernized_tpu.data.resolvers import get_task_data

    args = SimpleNamespace(task_name="shoes2handbags", image_size=16, n_test=1)
    da, db, ta, tb = get_task_data(args)
    assert all("edges2shoes" in p for p in da)     # A = shoes
    assert all("edges2handbags" in p for p in db)  # B = handbags
    args.task_name = "handbags2shoes"
    da2, db2, _, _ = get_task_data(args)
    assert all("edges2handbags" in p for p in da2)
    assert all("edges2shoes" in p for p in db2)
