"""End-to-end CLI smoke tests on synthetic data (tiny shapes, CPU).

The reference shipped three broken scripts that an import+tiny-run test
would have caught (SURVEY.md §4); these are those tests for the rebuild:
full train->log->samples->checkpoint->inference flows through the same
argv surface the reference documents.
"""

import re
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


def _run_translation(tmp_path, extra=()):
    from discogan_modernized_tpu.cli.image_translation import main

    argv = [
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--log_interval=10",
        "--image_save_interval=20", "--model_save_interval=20",
        f"--results_dir={tmp_path}/results", f"--models_dir={tmp_path}/models",
        "--precision=f32", *extra,
    ]
    return main(argv)


def test_image_translation_end_to_end(tmp_path):
    result_path, model_path = _run_translation(tmp_path)

    log = (result_path / "training_log.txt").read_text()
    # The C21 machine-read contract (hyperparameter_search.py regex).
    lines = re.findall(
        r"Iter \[\d+/\d+\] GEN: \d+\.\d{4}/\d+\.\d{4}, FM: \d+\.\d{4}/\d+\.\d{4}, "
        r"RECON: \d+\.\d{4}/\d+\.\d{4}, DIS: \d+\.\d{4}/\d+\.\d{4}", log)
    assert len(lines) >= 3, log

    assert (result_path / "samples" / "samples_iter_0.png").exists()
    for name in ("gen_A", "gen_B", "dis_A", "dis_B"):
        assert (model_path / f"{name}_final.pth").exists()
        assert (model_path / f"{name}_0.pth").exists()
    assert (model_path / "train_state.npz").exists()

    # Inference over the produced checkpoint, via the reference flag surface.
    from discogan_modernized_tpu.cli.inference import main as infer_main

    img = tmp_path / "input.png"
    Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    ).save(img)
    rc = infer_main([
        f"--model_path={model_path}", f"--input_path={img}",
        f"--output_dir={tmp_path}/inference", "--image_size=16",
        "--direction=AtoB", "--use_extra_layers",
    ])
    assert rc == 0
    assert (tmp_path / "inference" / "input_result.png").exists()


def test_pth_checkpoints_load_in_torch(tmp_path):
    """The exported .pth files must be loadable by the reference's torch
    modules with strict=True — a user can move checkpoints between
    frameworks."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from torch_ref import RefGenerator, RefDiscriminator

    _, model_path = _run_translation(tmp_path)
    g = RefGenerator(16)
    g.load_state_dict(torch.load(model_path / "gen_B_final.pth",
                                 weights_only=True), strict=True)
    d = RefDiscriminator(16)
    d.load_state_dict(torch.load(model_path / "dis_B_final.pth",
                                 weights_only=True), strict=True)


def test_distributed_translation_dp8(tmp_path):
    from discogan_modernized_tpu.cli.distributed_image_translation import main

    result_path, model_path = main([
        "--task_name=synthetic", "--model_arch=discogan", "--image_size=16",
        "--batch_size=16", "--epochs=1", "--log_interval=8",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/results", f"--models_dir={tmp_path}/models",
        "--precision=f32", "--distributed", "--world_size=8",
    ])
    log = (result_path / "training_log.txt").read_text()
    assert "Iter [0/" in log
    assert (model_path / "gen_A_final.pth").exists()


def test_angle_pairing_end_to_end(tmp_path):
    from discogan_modernized_tpu.cli.angle_pairing import main

    result_path, model_path = main([
        "--task_name=synthetic", "--model_arch=discogan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--log_interval=10",
        "--image_save_interval=30", "--model_save_interval=1000000",
        "--n_test=2",
        f"--results_dir={tmp_path}/results", f"--models_dir={tmp_path}/models",
        "--precision=f32",
    ])
    log = (result_path / "training_log.txt").read_text()
    # Angle-variant log has no FM field (ref angle_pairing.py:350-354).
    lines = re.findall(
        r"Iter \[\d+/\d+\] GEN: \d+\.\d{4}/\d+\.\d{4}, "
        r"RECON: \d+\.\d{4}/\d+\.\d{4}, DIS: \d+\.\d{4}/\d+\.\d{4}", log)
    assert len(lines) >= 2, log
    # Per-image JPEG dumps into numbered subdirs (ref :366-423).
    assert (result_path / "0" / "0.A.jpg").exists()
    assert (result_path / "0" / "0.BAB.jpg").exists()
    assert (result_path / "sample_grids" / "samples_iter_0.png").exists()
    assert (model_path / "gen_B_final.pth").exists()


def test_full_state_resume(tmp_path):
    """--resume restores optimizer + iteration (the reference can't)."""
    from discogan_modernized_tpu.cli.distributed_image_translation import main

    _, model_path = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--log_interval=1000",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r1", f"--models_dir={tmp_path}/m1",
        "--precision=f32",
    ])
    # Resume continues toward the requested total: epoch 1 is already
    # done, so --epochs=2 trains exactly the second epoch (iters 32..63).
    result2, _ = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=2", "--log_interval=10",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r2", f"--models_dir={tmp_path}/m2",
        "--precision=f32", f"--resume={model_path}",
    ])
    log = (result2 / "training_log.txt").read_text()
    # 256 synthetic samples / batch 8 = 32 steps/epoch; resumed run starts
    # at iter 32 (first multiple of log_interval=10 after that is 40).
    assert "Iter [40/" in log, log
    assert "Iter [30/" not in log, log  # completed epoch 1 is not re-run


def test_yaml_config_defaults(tmp_path):
    """--config YAML sets flag defaults; explicit CLI flags override."""
    import yaml

    conf = tmp_path / "run.yaml"
    conf.write_text(yaml.safe_dump({
        "task_name": "synthetic", "model_arch": "gan", "image_size": 16,
        "batch_size": 8, "epochs": 1, "log_interval": 16,
        "image_save_interval": 1000000, "model_save_interval": 1000000,
        "precision": "f32",
        "results_dir": str(tmp_path / "r"), "models_dir": str(tmp_path / "m"),
    }))
    from discogan_modernized_tpu.cli.image_translation import main

    # CLI override: log_interval 8 beats the YAML's 16.
    result_path, _ = main([f"--config={conf}", "--log_interval=8"])
    log = (result_path / "training_log.txt").read_text()
    assert "Task: synthetic, Model: gan" in log
    assert "Iter [8/" in log  # proves the CLI override took effect


def test_yaml_config_rejects_unknown_keys(tmp_path):
    import pytest as _pytest
    import yaml

    conf = tmp_path / "bad.yaml"
    conf.write_text(yaml.safe_dump({"task_name": "synthetic", "typo_key": 1}))
    from discogan_modernized_tpu.cli.image_translation import main

    with _pytest.raises(SystemExit):
        main([f"--config={conf}"])


def test_edges2shoes_real_data_end_to_end(tmp_path, monkeypatch):
    """Full trainer flow over an actual edges2shoes-layout dataset on disk:
    resolver -> AB-crop decode -> prefetch pipeline -> training."""
    rng = np.random.RandomState(0)
    root = tmp_path / "datasets"
    for split, n in (("train", 12), ("test", 3)):
        d = root / "edges2shoes" / split
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray((rng.rand(256, 512, 3) * 255).astype(np.uint8)
                            ).save(d / f"{i}_AB.jpg")
    monkeypatch.setenv("DISCOGAN_DATASETS_ROOT", str(root))

    from discogan_modernized_tpu.cli.image_translation import main

    result_path, model_path = main([
        "--task_name=edges2shoes", "--model_arch=discogan", "--image_size=16",
        "--batch_size=4", "--epochs=2", "--log_interval=2",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
        "--precision=f32",
    ])
    log = (result_path / "training_log.txt").read_text()
    # 12 images / batch 4 = 3 steps/epoch, 2 epochs = 6 iterations.
    assert "Iter [4/6]" in log or "Iter [2/6]" in log, log
    assert (model_path / "gen_B_final.pth").exists()


def test_orbax_checkpoint_backend(tmp_path):
    """--ckpt_backend orbax writes a restorable OCDBT checkpoint."""
    pytest.importorskip("orbax.checkpoint")
    from discogan_modernized_tpu.cli.image_translation import main

    _, model_path = _run_translation(tmp_path, extra=("--ckpt_backend=orbax",))
    assert (model_path / "train_state_orbax").exists()

    # --resume lives on the distributed trainer's surface.
    from discogan_modernized_tpu.cli.distributed_image_translation import (
        main as dmain,
    )

    result2, _ = dmain([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=2", "--log_interval=10",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r2", f"--models_dir={tmp_path}/m2",
        "--precision=f32", f"--resume={model_path}",
    ])
    log = (result2 / "training_log.txt").read_text()
    assert "Iter [40/" in log, log  # resumes at iter 32, not from scratch


def test_batch_larger_than_dataset_fails_fast(tmp_path):
    from discogan_modernized_tpu.cli.image_translation import main

    with pytest.raises(SystemExit, match="exceeds the usable dataset"):
        main([
            "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
            "--batch_size=512", "--epochs=1",
            f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
            "--precision=f32",
        ])


def test_profile_trace_capture(tmp_path):
    """--profile captures a jax.profiler trace window during training
    (SURVEY §5: the reference's only profiling is nvidia-smi sampling)."""
    _run_translation(tmp_path, extra=[f"--profile={tmp_path}/trace"])
    trace_dir = Path(tmp_path / "trace")
    # CPU backend supports trace capture: plugins/profile/<ts>/*.pb etc.
    files = list(trace_dir.rglob("*")) if trace_dir.exists() else []
    assert any(f.is_file() for f in files), files
