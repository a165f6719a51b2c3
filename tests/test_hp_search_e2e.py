"""End-to-end hyperparameter search: one real trial subprocess on CPU
(synthetic task), verifying the full trial protocol the reference defines
but ships broken (hyperparameter_search.py truncated at :361)."""

import json
import os

import pytest


@pytest.mark.slow
def test_single_trial_end_to_end(tmp_path, monkeypatch):
    from discogan_modernized_tpu.tools import hyperparameter_search as hps

    monkeypatch.setenv("DISCOGAN_FORCE_CPU", "1")
    monkeypatch.chdir(tmp_path)

    analysis = hps.main([
        "--task_name=synthetic", "--model_arch=gan", "--trials=1",
        "--base_epochs=1", "--batch_size=8", "--image_size=16",
        f"--output_dir={tmp_path}/hp", "--workers=1", "--seed=0",
        "--poll_interval=2",
    ])
    assert analysis is not None
    base = tmp_path / "hp" / "synthetic" / "gan"
    trial_dirs = list(base.glob("trial_0_*"))
    assert len(trial_dirs) == 1
    td = trial_dirs[0]
    assert (td / "hyperparameters.json").exists()
    info = json.loads((td / "trial_info.json").read_text())
    assert info["status"] == "completed"
    assert info["returncode"] == 0
    assert (td / "train.log").exists()
    assert analysis["best"] is not None
    assert analysis["best"]["metrics"]["avg_recon_loss"] is not None
    assert (base / "analysis.json").exists()
