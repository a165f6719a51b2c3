"""Tooling tests: HP search protocol, batch probe, monitor (ref C22-C24)."""

import json
import re
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest


def test_hp_sampling_spaces():
    from discogan_modernized_tpu.tools.hyperparameter_search import (
        sample_hyperparameters,
        generate_hyperparameters,
        PARAM_RANGES_RANDOM,
    )

    samples = sample_hyperparameters(10)
    assert len(samples) == 10
    for s in samples:
        assert set(s) == set(PARAM_RANGES_RANDOM)
        for k, v in s.items():
            assert v in PARAM_RANGES_RANDOM[k]
    grid = generate_hyperparameters()
    assert len(grid) == 4 * 3 * 3 * 4 * 4 * 4 * 4


def test_hp_extract_metrics_parses_log_contract(tmp_path):
    from discogan_modernized_tpu.tools.hyperparameter_search import extract_metrics

    log = tmp_path / "train.log"
    log.write_text(
        "Training started at x\n"
        "Iter [0/100] GEN: 0.6716/0.5718, FM: 0.3292/0.3587, "
        "RECON: 0.1222/0.1181, DIS: 0.7311/0.7452\n"
        "Iter [50/100] GEN: 0.5000/0.4000, FM: 0.2000/0.2100, "
        "RECON: 0.0800/0.0900, DIS: 0.6000/0.6100\n"
    )
    m = extract_metrics(log)
    assert m["final_gen_loss_A"] == 0.5
    assert m["final_recon_loss_B"] == 0.09
    assert abs(m["avg_recon_loss"] - 0.085) < 1e-9


def test_hp_early_stop_logic(tmp_path):
    from discogan_modernized_tpu.tools.hyperparameter_search import check_early_stop

    log = tmp_path / "t.log"
    state = {}
    log.write_text("RECON: 0.5000/0.5000\n")
    assert not check_early_stop(log, state, patience=2)
    log.write_text("RECON: 0.5000/0.5000\nRECON: 0.6000/0.6000\n")
    assert not check_early_stop(log, state, patience=2)
    log.write_text("RECON: 0.5000/0.5000\nRECON: 0.6000/0.6000\nRECON: 0.7000/0.7000\n")
    assert check_early_stop(log, state, patience=2)


def test_hp_analyze_results(tmp_path):
    from discogan_modernized_tpu.tools.hyperparameter_search import analyze_results

    base = tmp_path / "edges2shoes" / "discogan"
    for tid, recon in ((0, 0.2), (1, 0.1)):
        d = base / f"trial_{tid}_x"
        d.mkdir(parents=True)
        log = d / "train.log"
        log.write_text(f"Iter [0/1] GEN: 0.1000/0.1000, FM: 0.1000/0.1000, "
                       f"RECON: {recon:.4f}/{recon:.4f}, DIS: 0.1000/0.1000\n")
        (d / "hyperparameters.json").write_text(json.dumps({"learning_rate": 2e-4}))
        (d / "trial_info.json").write_text(json.dumps({
            "trial_id": tid, "status": "completed", "log_file": str(log)}))
    analysis = analyze_results(tmp_path, "edges2shoes", "discogan")
    assert analysis["best"]["trial_id"] == 1
    assert (base / "analysis.json").exists()


def test_batch_probe_bisection(monkeypatch, tmp_path):
    """Binary search honors OOM boundary + safety margin without a device."""
    import discogan_modernized_tpu.tools.batch_size_optimization as bso

    monkeypatch.setattr(
        bso, "test_batch_size",
        lambda bs, size, train_step=False, device_id=0,
        model_arch="discogan":
            (bs <= 96, 0.5 if bs <= 96 else None))
    args = bso.parse_args([
        "--min_batch=16", "--max_batch=512", "--step=16",
        f"--output={tmp_path}/out.json"])
    result = bso.find_optimal_batch_size(args)
    assert result["max_working_batch_size"] == 96
    assert result["recommended_batch_size"] == 80  # 96*0.9 step-quantized


def test_batch_probe_real_forward_tiny():
    """One real probe at tiny size on CPU (the jitted forward graph path)."""
    from discogan_modernized_tpu.tools.batch_size_optimization import test_batch_size

    ok, util = test_batch_size(2, 16)
    assert ok


def test_monitor_poll_and_restart_tracking(tmp_path, monkeypatch):
    from discogan_modernized_tpu.tools.monitor import Monitor, parse_args

    args = parse_args([f"--log_dir={tmp_path}", "--iterations=1",
                       "--no-interactive", "--auto-restart"])
    mon = Monitor(args)
    fake_jobs = [{"pid": 12345, "cmdline": "python image_translation.py "
                  "--task_name=edges2shoes", "task_name": "edges2shoes"}]
    monkeypatch.setattr("discogan_modernized_tpu.tools.monitor.find_training_jobs",
                        lambda: fake_jobs)
    mon.poll_once()
    assert 12345 in mon.known_jobs

    launched = []
    monkeypatch.setattr("discogan_modernized_tpu.tools.monitor.find_training_jobs",
                        lambda: [])
    monkeypatch.setattr("subprocess.Popen",
                        lambda cmd, **kw: launched.append(cmd) or SimpleNamespace(pid=1))
    mon.poll_once()
    assert launched and "--task_name=edges2shoes" in " ".join(launched[0])
    assert (tmp_path / "monitor.log").exists()
    assert (tmp_path / "telemetry.json").exists()


def test_monitor_restart_cap(tmp_path, monkeypatch):
    from discogan_modernized_tpu.tools.monitor import Monitor, parse_args, MAX_RESTARTS

    args = parse_args([f"--log_dir={tmp_path}", "--no-interactive",
                       "--auto-restart"])
    mon = Monitor(args)
    launched = []
    monkeypatch.setattr("subprocess.Popen",
                        lambda cmd, **kw: launched.append(cmd) or SimpleNamespace(pid=1))
    job = {"pid": 1, "cmdline": "python image_translation.py --task_name=x",
           "task_name": "x"}
    for _ in range(MAX_RESTARTS + 2):
        mon.check_and_restart_jobs([job])
        mon.check_and_restart_jobs([])
    assert len(launched) == MAX_RESTARTS


def test_monitor_restart_resumes_from_checkpoint(tmp_path, monkeypatch):
    """Auto-restart appends --resume to the relaunch command when the
    job's models_dir holds a full train-state checkpoint (lossless crash
    recovery — the reference restarts from scratch)."""
    from discogan_modernized_tpu.tools.monitor import Monitor, parse_args

    ckpt = tmp_path / "models" / "edges2shoes" / "discogan" / "20260101_000000"
    ckpt.mkdir(parents=True)
    (ckpt / "train_state_meta.json").write_text('{"iters": 7}')

    args = parse_args([f"--log_dir={tmp_path}/logs", "--no-interactive",
                       "--auto-restart"])
    mon = Monitor(args)
    launched = []
    monkeypatch.setattr(
        "subprocess.Popen",
        lambda cmd, **kw: launched.append(cmd) or SimpleNamespace(pid=1))
    job = {"pid": 9, "task_name": "edges2shoes",
           "cmdline": ("python image_translation.py --task_name=edges2shoes "
                       f"--models_dir={tmp_path}/models")}
    mon.check_and_restart_jobs([job])
    mon.check_and_restart_jobs([])
    assert launched, "no relaunch"
    assert any(a.startswith("--resume=") and str(ckpt) in a
               for a in launched[0]), launched[0]

    # Without a checkpoint: plain relaunch, no --resume.
    mon2 = Monitor(parse_args([f"--log_dir={tmp_path}/logs2",
                               "--no-interactive", "--auto-restart"]))
    launched.clear()
    job2 = {"pid": 10, "task_name": "x",
            "cmdline": f"python image_translation.py --task_name=x "
                       f"--models_dir={tmp_path}/nothing"}
    mon2.check_and_restart_jobs([job2])
    mon2.check_and_restart_jobs([])
    assert launched and not any(a.startswith("--resume=") for a in launched[0])


def test_monitor_job_hbm_sidecar(tmp_path, monkeypatch):
    """The trainer's hbm_telemetry.jsonl sidecar (train/loop.py
    hbm_sample) surfaces in the monitor's job snapshot — the per-device
    telemetry path (ref gpu_monitor.py:41-66 analog) on backends that
    expose memory_stats."""
    import json

    from discogan_modernized_tpu.tools.monitor import Monitor, parse_args

    base = tmp_path / "results" / "edges2shoes" / "discogan"
    # An OLDER run with a sidecar: a restarted job must NOT inherit it.
    old = base / "20250101_000000"
    old.mkdir(parents=True)
    (old / "training_log.txt").write_text("Iter [100/1000]\n")
    (old / "hbm_telemetry.jsonl").write_text(json.dumps(
        {"t": 0.5, "iter": 100,
         "devices": [{"id": 0, "bytes_in_use": 99, "bytes_limit": 16}]}) + "\n")
    run = base / "20260101_000000"
    run.mkdir(parents=True)
    (run / "training_log.txt").write_text("Iter [500/1000]\n")
    rows = [{"t": 1.0, "iter": 0,
             "devices": [{"id": 0, "bytes_in_use": 1, "bytes_limit": 16}]},
            {"t": 2.0, "iter": 500,
             "devices": [{"id": 0, "bytes_in_use": 8, "bytes_limit": 16}]}]
    (run / "hbm_telemetry.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in rows))

    args = parse_args([f"--log_dir={tmp_path}/logs", "--iterations=1",
                       "--no-interactive"])
    mon = Monitor(args)
    fake_jobs = [{"pid": 77, "task_name": "edges2shoes", "cwd": str(tmp_path),
                  "argv": ["python", "image_translation.py",
                           "--task_name=edges2shoes"],
                  "cmdline": "python image_translation.py "
                             "--task_name=edges2shoes"}]
    monkeypatch.setattr(
        "discogan_modernized_tpu.tools.monitor.find_training_jobs",
        lambda: fake_jobs)
    snap = mon.poll_once()
    hbm = snap["jobs"][0].get("hbm")
    assert hbm is not None and hbm["iter"] == 500  # newest line wins
    assert hbm["devices"][0]["bytes_in_use"] == 8


def test_step_itemize_chains_smoke():
    """step_itemize's four program-level chains + the per-layer
    conv/epilogue accounting run end-to-end (tiny geometry, CPU): every
    measured value must be finite and the accounting keys present.
    Timings are meaningless on CPU — this gates the harness code, which
    otherwise only runs on the real chip (PERF.md round-3 itemization)."""
    import jax.numpy as jnp

    from discogan_modernized_tpu.tools import step_itemize as si
    from discogan_modernized_tpu.train.step import TrainConfig

    cfg = TrainConfig(image_size=8, lean_dis=True, slim_state="mv")
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)
    B = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)

    kw = dict(n1=1, n2=3, reps=1)
    assert np.isfinite(si.forward_chain_time(cfg, A, B, **kw))
    assert np.isfinite(si.forward_chain_time(cfg, A, B, dis_only=True, **kw))
    for which in ("gen", "dis"):
        assert np.isfinite(si.step_chain_time(cfg, which, A, B, **kw))
        assert np.isfinite(si.grad_chain_time(cfg, which, A, B, **kw))
        assert np.isfinite(si.adam_chain_time(cfg, which, **kw))

    acc = si.conv_accounting(8, 2, jnp.float32, **kw)
    for key in ("gen_conv_us", "gen_epi_us", "dis_conv_us", "dis_epi_us",
                "fwd_conv_us", "fwd_epi_us"):
        assert np.isfinite(acc[key]), key
    # 8px geometry: enc0/latent/dec0/head + dis0/dis_head = 6 layers
    assert len(acc["per_layer"]) == 6
    for name, vals in acc["per_layer"].items():
        assert len(vals) == 5, name
        assert all(np.isfinite(v) for v in vals), name


# ---------------------------------------------------------------- tpu_smoke


def test_tpu_smoke_stages_on_cpu():
    """The on-chip smoke gate's train-step and scan-chunk stages must run
    (and pass) on the CPU backend too — same compiled surfaces, smaller
    numbers. The pallas stage is chip-only (compiled Mosaic kernels) and
    covered by bench.pallas_selfcheck on the real device."""
    from discogan_modernized_tpu.tools import tpu_smoke as sm

    assert "backend=" in sm.stage_probe()
    assert "dis_A=" in sm.stage_train_step()
    assert "variant=" in sm.stage_scan_chunk(batch=2, image_size=16)


def test_tpu_smoke_main_reports_stage_failures(monkeypatch, capsys):
    """main() must run every stage, report per-stage FAIL without
    aborting, and exit nonzero when any stage failed."""
    from discogan_modernized_tpu.tools import tpu_smoke as sm

    def boom():
        raise RuntimeError("synthetic failure")

    monkeypatch.setattr(sm, "STAGES", [("good", lambda: "fine"),
                                       ("bad", boom),
                                       ("after", lambda: "still runs")])
    rc = sm.main(["--deadline_s", "0", "--probe_deadline_s", "0"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "good: ok" in out and "bad: FAIL" in out and "after: ok" in out
    assert "[tpu_smoke] FAIL" in out


def test_tpu_smoke_main_passes_with_stubbed_stages(monkeypatch, capsys):
    from discogan_modernized_tpu.tools import tpu_smoke as sm

    monkeypatch.setattr(sm, "STAGES", [("probe", lambda: "stub")])
    rc = sm.main(["--deadline_s", "0"])
    assert rc == 0
    assert "[tpu_smoke] PASS" in capsys.readouterr().out
