"""Preemption safety: SIGTERM mid-training checkpoints the full state and
exits cleanly; --resume continues from the preemption point."""

import json
import os
import signal
import threading

import pytest


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_sigterm_checkpoints_and_resumes(tmp_path, backend):
    if backend == "orbax":
        pytest.importorskip("orbax.checkpoint")
    from discogan_modernized_tpu.cli.image_translation import main

    # Long enough run that the 4s timer fires mid-training.
    timer = threading.Timer(4.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        result_path, model_path = main([
            "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
            "--batch_size=8", "--epochs=200", "--log_interval=1000000",
            "--image_save_interval=1000000", "--model_save_interval=1000000",
            f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
            "--precision=f32", f"--ckpt_backend={backend}",
        ])
    finally:
        timer.cancel()

    meta = json.loads((model_path / "train_state_meta.json").read_text())
    assert meta.get("preempted") is True
    assert meta.get("backend") == backend
    if backend == "orbax":
        assert (model_path / "train_state_orbax").is_dir()
    saved_iter = meta["iters"]
    assert 0 < saved_iter < 200 * 32  # stopped mid-run
    # The reference .pth layout is also written at the preemption point.
    assert any(model_path.glob("gen_B_*.pth"))

    # Resume picks up at the saved iteration and trains only the REMAINDER
    # of the requested total (epochs * n_batches), not epochs more — the
    # monitor's lossless auto-restart must not over-train.
    from discogan_modernized_tpu.cli.distributed_image_translation import main as dmain

    n_batches = 256 // 8  # synthetic task: 256 pairs (data/resolvers.py)
    resume_epochs = saved_iter // n_batches + 1
    total = resume_epochs * n_batches
    result2, _ = dmain([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        f"--epochs={resume_epochs}", "--batch_size=8", "--log_interval=1",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r2", f"--models_dir={tmp_path}/m2",
        "--precision=f32", f"--resume={model_path}",
    ])
    log = (result2 / "training_log.txt").read_text()
    assert f"Iter [{saved_iter}/{total}]" in log  # first resumed step
    logged = [int(m) for m in __import__("re").findall(r"Iter \[(\d+)/", log)]
    assert min(logged) == saved_iter  # completed prefix is skipped
    assert max(logged) == total - 1  # ends at the original total, exactly
    assert len(logged) == total - saved_iter  # trains only the remainder
