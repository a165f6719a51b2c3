"""Round-3 memory-aware auto-remat: with --remat unset at a large image
size the trainer ATTEMPTS the no-remat fused scan (slim mv fits 512px b32
without remat, ~+22% over the remat-on per-step route — PERF.md) and the
abstract probe compile falls back to the remat-on per-step path when the
geometry doesn't fit.

These tests exercise the real trainer routing on CPU by monkeypatching
train.step.LARGE_IMAGE down to the test geometry (the property and the
chunk planner read it at call time) instead of paying >=256px compiles.
"""

import re
import types

import pytest


def _train(tmp_path, sub, extra=()):
    import numpy as np

    from discogan_modernized_tpu.cli.image_translation import main

    # Epoch shuffles draw from the global numpy stream (reference
    # behavior); pin it so two in-process runs see identical batches.
    np.random.seed(7)
    argv = [
        "--task_name=synthetic", "--model_arch=discogan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--log_interval=6",
        "--image_save_interval=1000", "--model_save_interval=1000",
        f"--results_dir={tmp_path}/{sub}/results",
        f"--models_dir={tmp_path}/{sub}/models",
        "--precision=f32", *extra,
    ]
    return main(argv)


def _log_lines(result_path):
    log = (result_path / "training_log.txt").read_text()
    return re.findall(r"Iter \[\d+/\d+\] GEN: .*", log)


def test_auto_remat_candidate_logic(monkeypatch):
    from discogan_modernized_tpu.train.step import (
        TrainConfig, auto_remat_scan_candidate)

    cand = auto_remat_scan_candidate(TrainConfig(image_size=512), 512)
    assert cand is not None
    cfg_off, k = cand
    assert cfg_off.remat is False and k == 6

    # Small sizes, explicit --remat, explicit remat granularity, and the
    # env kill-switch all decline the candidate.
    assert auto_remat_scan_candidate(TrainConfig(image_size=64), 64) is None
    assert auto_remat_scan_candidate(
        TrainConfig(image_size=512, remat=True), 512) is None
    assert auto_remat_scan_candidate(
        TrainConfig(image_size=512, remat=False), 512) is None
    assert auto_remat_scan_candidate(
        TrainConfig(image_size=512, remat_policy="conv"), 512) is None
    monkeypatch.setenv("DISCOGAN_AUTO_REMAT", "0")
    assert auto_remat_scan_candidate(TrainConfig(image_size=512), 512) is None


def test_auto_remat_routes_noremat_scan_like_explicit_off(
        tmp_path, monkeypatch, capsys):
    """Default flags at a (patched-)large size route the no-remat fused
    scan after a successful probe, and the run is identical to an
    explicit `--remat off` run (same programs, same index streams →
    byte-equal training logs). Remat-on/off numeric equality and
    scan-vs-per-step trajectory equality are gated separately
    (test_remat.py, test_scan_step.py); this test pins the ROUTING."""
    from discogan_modernized_tpu.train import step as step_mod

    monkeypatch.setattr(step_mod, "LARGE_IMAGE", 16)

    result_auto, _ = _train(tmp_path, "auto")
    out = capsys.readouterr().out
    assert "auto-remat: no-remat fused scan fits at 16px" in out
    auto_lines = _log_lines(result_auto)
    assert len(auto_lines) >= 3

    result_off, _ = _train(tmp_path, "off", extra=("--remat=off",))
    out2 = capsys.readouterr().out
    # Explicit --remat off takes the same scan route without the
    # auto-remat candidate machinery.
    assert "auto-remat" not in out2
    assert auto_lines == _log_lines(result_off)


def test_auto_remat_probe_failure_falls_back_to_remat_on(
        tmp_path, monkeypatch, capsys):
    """A probe compile failure (the 512px-b32-doesn't-fit case) restores
    the remat-on resolution and completes on the per-step path."""
    from discogan_modernized_tpu.train import step as step_mod

    monkeypatch.setattr(step_mod, "LARGE_IMAGE", 16)

    def broken_scan(cfg, steps, variant="switch"):
        def lower(*a, **k):
            raise RuntimeError("synthetic compile OOM")
        return types.SimpleNamespace(lower=lower)

    monkeypatch.setattr(step_mod, "make_scan_train_step", broken_scan)

    result_path, _ = _train(tmp_path, "fallback")
    out = capsys.readouterr().out
    assert "단일 스텝 경로로 폴백합니다" in out
    assert "auto-remat: no-remat 스캔 부적합 — remat-on" in out
    assert len(_log_lines(result_path)) >= 3
