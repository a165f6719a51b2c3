"""Round-2 correctness fixes: monitor utilization proxy + faithful
relaunch, HP-search concurrent-trial polling, checkpoint pickle gating."""

import json
import os
import pickle
import subprocess
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest


# ---------------------------------------------------------------- monitor

def _make_training_log(root: Path, task="edges2shoes", arch="discogan",
                       iters=10, total=100):
    d = root / "results" / task / arch / "20260101_000000"
    d.mkdir(parents=True, exist_ok=True)
    (d / "training_log.txt").write_text(
        f"Iter [{iters}/{total}] GEN: 0.1000/0.1000, FM: 0.1000/0.1000, "
        f"RECON: 0.1000/0.1000, DIS: 0.1000/0.1000\n")
    return d / "training_log.txt"


def test_monitor_step_rate_proxy_and_stall_alert(tmp_path):
    from discogan_modernized_tpu.tools.monitor import Monitor, parse_args

    args = parse_args([f"--log_dir={tmp_path}/logs", "--no-interactive",
                       "--stall-polls=2"])
    mon = Monitor(args)
    argv = ["python", "image_translation.py", "--task_name=edges2shoes",
            f"--results_dir={tmp_path}/results"]
    job = {"pid": 77, "cmdline": " ".join(argv),
           "task_name": "edges2shoes", "argv": argv, "cwd": str(tmp_path)}

    _make_training_log(tmp_path, iters=10)
    mon.update_job_progress([job])
    assert job["iters"] == 10  # baseline poll

    _make_training_log(tmp_path, iters=30)
    job2 = dict(job)
    mon.update_job_progress([job2])
    assert job2["iters"] == 30
    assert job2["step_rate"] > 0  # utilization proxy derived from the log

    # No progress for --stall-polls consecutive polls AND silence of at
    # least 3x the job's observed log cadence -> alert logged. (The gap
    # floor keeps healthy slow-cadence jobs — 512px + large
    # --log_interval — from misfiring; here the observed cadence is
    # milliseconds, so a short sleep satisfies it.)
    time.sleep(3.0 * mon._log_gap[77] + 0.05)
    for _ in range(2):
        mon.update_job_progress([dict(job)])
    assert "정체" in (tmp_path / "logs" / "monitor.log").read_text()

    # Progress resumes -> stall counter resets, rate recomputed.
    _make_training_log(tmp_path, iters=40)
    job3 = dict(job)
    mon.update_job_progress([job3])
    assert job3["step_rate"] > 0


def test_monitor_proc_argv_cwd_roundtrip(tmp_path):
    """/proc capture preserves space-containing argv and the job's cwd."""
    from discogan_modernized_tpu.tools.monitor import _proc_argv_cwd

    p = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(30)",
         "--task_name=has space"],
        cwd=tmp_path)
    try:
        deadline = time.time() + 5
        argv = cwd = None
        while time.time() < deadline:
            argv, cwd = _proc_argv_cwd(p.pid)
            if argv:
                break
            time.sleep(0.05)
        assert argv is not None
        assert argv[-1] == "--task_name=has space"  # not mangled
        assert Path(cwd) == tmp_path
    finally:
        p.kill()
        p.wait()


def test_monitor_restart_uses_argv_and_cwd(tmp_path, monkeypatch):
    """Relaunch uses the exact argv + the job's cwd, output to a log file
    (ADVICE: ps-split relaunch mangled quoted args, ran in monitor cwd,
    discarded output)."""
    from discogan_modernized_tpu.tools.monitor import Monitor, parse_args

    args = parse_args([f"--log_dir={tmp_path}/logs", "--no-interactive",
                       "--auto-restart"])
    mon = Monitor(args)
    calls = []
    monkeypatch.setattr(
        "subprocess.Popen",
        lambda cmd, **kw: calls.append((cmd, kw)) or SimpleNamespace(pid=1))
    argv = ["python", "image_translation.py", "--task_name=x",
            "--results_dir=./my dir"]
    job = {"pid": 5, "cmdline": " ".join(argv), "task_name": "x",
           "argv": argv, "cwd": str(tmp_path)}
    mon.check_and_restart_jobs([job])
    mon.check_and_restart_jobs([])
    assert calls, "no relaunch"
    cmd, kw = calls[0]
    assert "--results_dir=./my dir" in cmd  # argv preserved verbatim
    assert kw.get("cwd") == str(tmp_path)  # job cwd, not monitor cwd
    assert kw.get("stdout") is not subprocess.DEVNULL  # output kept


# ------------------------------------------------------------- HP search

class _FakeProc:
    def __init__(self, name, events, finish_after=None):
        self.name = name
        self.events = events
        self.finish_after = finish_after  # polls until self-exit
        self.polls = 0
        self.pid = 4242
        self.returncode = None

    def poll(self):
        if self.returncode is not None:
            return self.returncode
        self.polls += 1
        if self.finish_after is not None and self.polls >= self.finish_after:
            self.returncode = 0
            self.events.append(("finish", self.name))
        return self.returncode

    def terminate(self):
        if self.returncode is None:
            self.returncode = -15
            self.events.append(("terminate", self.name))

    def kill(self):
        self.terminate()

    def wait(self, timeout=None):
        if self.returncode is None:
            self.returncode = 0
        return self.returncode


def test_hp_search_early_stops_any_concurrent_trial(tmp_path, monkeypatch):
    """Early stopping must fire on a LATER concurrent trial while the
    oldest is still running (the round-1 loop watched only the oldest)."""
    from discogan_modernized_tpu.tools import hyperparameter_search as hps

    events = []
    # Trial 0: no RECON lines (never early-stops), self-exits after 6 polls.
    # Trial 1: stagnating RECON, never self-exits -> must be terminated
    # by the poll-all loop well before trial 0 finishes.
    logs = {}

    def fake_run_trial(hp, args, slot, trial_id):
        rdir = tmp_path / f"t{trial_id}"
        rdir.mkdir()
        log = rdir / "train.log"
        if trial_id == 1:
            # TWO stagnant lines: check_early_stop only consumes patience
            # on NEW log lines (stale polls are ignored — see
            # test_early_stop_ignores_stale_polls), so the non-improving
            # second observation is what triggers termination.
            log.write_text("RECON: 0.5000/0.5000\nRECON: 0.5000/0.5000\n")
        else:
            log.write_text("no recon lines here\n")
        logs[trial_id] = log
        proc = _FakeProc(f"trial{trial_id}", events,
                         finish_after=6 if trial_id == 0 else None)
        info = {"trial_id": trial_id, "slot_id": slot,
                "log_file": str(log), "start_timestamp": time.time(),
                "status": "running", "hyperparameters": hp}
        return proc, rdir, info

    monkeypatch.setattr(hps, "run_trial", fake_run_trial)
    monkeypatch.setattr(hps, "analyze_results", lambda *a, **k: {"ok": True})
    hps.main([
        "--task_name=edges2shoes", "--trials=2", "--workers=2",
        "--early_stopping", "--patience=1", "--poll_interval=0.01",
        f"--output_dir={tmp_path}/hp", "--seed=0",
    ])
    names = [e for e in events]
    assert ("terminate", "trial1") in names
    assert ("finish", "trial0") in names
    # trial1 was stopped while trial0 was still running:
    assert names.index(("terminate", "trial1")) < names.index(("finish", "trial0"))


def test_hp_search_overflow_slots_forced_to_cpu(tmp_path, monkeypatch):
    """Slots beyond the chip count must not share the single TPU
    (ADVICE: DISCOGAN_WORKER_SLOT was set but never consumed)."""
    from discogan_modernized_tpu.tools import hyperparameter_search as hps

    captured = []

    def fake_popen(cmd, stdout=None, stderr=None, env=None):
        captured.append(env)
        return _FakeProc(f"t{len(captured)}", [], finish_after=1)

    monkeypatch.setattr(hps.subprocess, "Popen", fake_popen)
    monkeypatch.setenv("DISCOGAN_NUM_CHIPS", "1")
    args = hps.parse_args([f"--output_dir={tmp_path}", "--workers=2"])
    hps.run_trial({"learning_rate": 2e-4, "beta1": 0.5, "beta2": 0.999,
                   "starting_rate": 0.01, "default_rate": 0.5,
                   "gan_curriculum": 10000, "update_interval": 3},
                  args, slot_id=0, trial_id=0)
    hps.run_trial({"learning_rate": 2e-4, "beta1": 0.5, "beta2": 0.999,
                   "starting_rate": 0.01, "default_rate": 0.5,
                   "gan_curriculum": 10000, "update_interval": 3},
                  args, slot_id=1, trial_id=1)
    assert captured[0].get("DISCOGAN_FORCE_CPU") != "1"  # slot 0 -> chip
    assert captured[1].get("DISCOGAN_FORCE_CPU") == "1"  # overflow -> CPU
    assert captured[0]["DISCOGAN_WORKER_SLOT"] == "0"
    assert captured[1]["DISCOGAN_WORKER_SLOT"] == "1"


# ----------------------------------------------------------- checkpoints

def test_reference_weights_pickle_requires_opt_in(tmp_path, monkeypatch):
    """A failed torch.load(weights_only=True) must NOT silently fall back
    to unrestricted pickle (arbitrary-code-execution path); raw pickle
    loads only with DISCOGAN_ALLOW_PICKLE=1."""
    pytest.importorskip("torch")
    import jax

    from discogan_modernized_tpu.models import generator_init
    from discogan_modernized_tpu.models.torch_compat import generator_to_state_dict
    from discogan_modernized_tpu.train.checkpoint import load_reference_weights

    params, state = generator_init(jax.random.PRNGKey(0), 16)
    sd = {k: np.asarray(v) for k, v in
          generator_to_state_dict(params, state).items()}
    path = tmp_path / "gen_A_final.pth"
    with open(path, "wb") as f:
        pickle.dump(sd, f)

    monkeypatch.delenv("DISCOGAN_ALLOW_PICKLE", raising=False)
    with pytest.raises(Exception):
        load_reference_weights(path, "gen_A", 16)

    monkeypatch.setenv("DISCOGAN_ALLOW_PICKLE", "1")
    params2, state2 = load_reference_weights(path, "gen_A", 16)
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert all(np.allclose(a, b) for a, b in zip(flat1, flat2))


# ------------------------------------------------- XLA compiler options

def test_env_compiler_options_parsing(monkeypatch):
    """DISCOGAN_XLA_COPTS="k=v,k2=v2" -> jit compiler_options dict; unset
    or empty must return None so jit-cache keys stay unchanged."""
    from discogan_modernized_tpu.train.step import env_compiler_options

    monkeypatch.delenv("DISCOGAN_XLA_COPTS", raising=False)
    assert env_compiler_options() is None
    monkeypatch.setenv("DISCOGAN_XLA_COPTS", "")
    assert env_compiler_options() is None
    monkeypatch.setenv("DISCOGAN_XLA_COPTS",
                       "xla_tpu_scoped_vmem_limit_kib=32768")
    assert env_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"}
    monkeypatch.setenv("DISCOGAN_XLA_COPTS", " a=1 , b=two ")
    assert env_compiler_options() == {"a": "1", "b": "two"}
    monkeypatch.setenv("DISCOGAN_XLA_COPTS", "missing_value")
    with pytest.raises(ValueError):
        env_compiler_options()


def test_use_lean_dis_routing():
    """cfg.use_lean_dis centralizes the lean-D routing predicate: lean on
    non-logged D iterations only (logged lines need the full graph)."""
    from discogan_modernized_tpu.train.step import TrainConfig

    cfg = TrainConfig(lean_dis=True, update_interval=3, log_interval=50)
    assert not cfg.use_lean_dis(0)        # D iter but logged
    assert not cfg.use_lean_dis(1)        # G iter
    assert cfg.use_lean_dis(3)            # first lean D iter
    assert cfg.use_lean_dis(6)
    assert not cfg.use_lean_dis(150)      # D iter AND logged -> full
    assert not cfg.use_lean_dis(151)      # G iter
    off = TrainConfig(lean_dis=False)
    assert not any(off.use_lean_dis(j) for j in range(10))


def test_cli_xla_copts_validation(tmp_path, monkeypatch):
    """--xla_copts is validated up front (a typo must fail immediately,
    not minutes into a remote compile) — and since the round-3 advisor
    fix, run_training's finally strips the bad value from the env knob
    on the error path too (a caller that catches the ValueError must not
    inherit it; see tests/test_round3_fixes.py for the happy-path
    restore)."""
    import pytest as _pytest

    from discogan_modernized_tpu.cli.image_translation import main

    monkeypatch.delenv("DISCOGAN_XLA_COPTS", raising=False)
    argv = [
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1",
        f"--results_dir={tmp_path}/results",
        f"--models_dir={tmp_path}/models",
        "--xla_copts=oops_no_value",
    ]
    try:
        with _pytest.raises(ValueError, match="key=value"):
            main(argv)
        # The malformed value must NOT survive the failed run.
        assert "DISCOGAN_XLA_COPTS" not in os.environ
    finally:
        # delenv(raising=False) on an UNSET var registers no undo; keep
        # later tests' subprocesses clean even if the contract regresses.
        os.environ.pop("DISCOGAN_XLA_COPTS", None)


# --------------------------------------------- review-hunt regressions

def test_device_dataset_count_survives_corrupt_file(tmp_path):
    """A corrupt JPEG must not shrink the HBM-resident dataset: the
    random-image substitution (ref dataset.py:258-261) has to land at the
    failed POSITION, keeping every index-driven consumer's shapes valid."""
    from PIL import Image

    from discogan_modernized_tpu.data.pipeline import PrefetchLoader

    rng = np.random.RandomState(0)
    paths = []
    for j in range(6):
        p = tmp_path / f"{j}.jpg"
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    (tmp_path / "3.jpg").write_bytes(b"not a jpeg")  # corrupt one mid-list

    loader = PrefetchLoader(paths, paths, batch_size=2, image_size=16,
                            domain_A=None, domain_B=None)
    if not loader.device_cache:
        import pytest as _pytest

        _pytest.skip("device cache disabled in this environment")
    dev_A, dev_B = loader.device_data()
    assert dev_A.shape[0] == len(paths), dev_A.shape
    assert dev_B.shape[0] == len(paths), dev_B.shape
    # The substituted sample is a valid image in [0, 1].
    a3 = np.asarray(dev_A[3], np.float32)
    assert np.isfinite(a3).all() and 0.0 <= a3.min() and a3.max() <= 1.0


def test_decode_paths_keep_positions(tmp_path):
    """keep_positions=True preserves per-path slots (None on failure);
    the default stays compacted (ref read_images skip semantics)."""
    from PIL import Image

    from discogan_modernized_tpu.data.pipeline import PrefetchLoader

    rng = np.random.RandomState(1)
    paths = []
    for j in range(3):
        p = tmp_path / f"{j}.jpg"
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    (tmp_path / "1.jpg").write_bytes(b"junk")

    loader = PrefetchLoader(paths, paths, batch_size=1, image_size=16,
                            domain_A=None, domain_B=None)
    kept = loader._decode_paths(paths, None, None, keep_positions=True)
    assert len(kept) == 3 and kept[1] is None
    assert kept[0] is not None and kept[2] is not None
    compact = loader._decode_paths(paths, None, None)
    assert compact.shape[0] == 2


def test_config_values_get_argparse_validation(tmp_path):
    """YAML --config values must pass the same type/choices checks as CLI
    strings (set_defaults alone skips both)."""
    import yaml

    from discogan_modernized_tpu.cli.common import (
        parse_with_config, translation_parser)

    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump({"task_name": "synthetic",
                                   "precision": "f64"}))
    with pytest.raises(SystemExit, match="precision"):
        parse_with_config(translation_parser(), [f"--config={bad}"])

    typed = tmp_path / "typed.yaml"
    typed.write_text(yaml.safe_dump({"task_name": "synthetic",
                                     "image_size": "256",
                                     "slim_state": "mv"}))
    args = parse_with_config(translation_parser(), [f"--config={typed}"])
    assert args.image_size == 256 and isinstance(args.image_size, int)
    assert args.slim_state == "mv"


def test_inference_exit_code_and_precision_flag(tmp_path):
    """inference.py must exit nonzero on a load failure and expose
    --precision (f32 reproduces reference outputs at the fidelity level)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [_sys.executable, str(repo / "inference.py"),
         f"--model_path={tmp_path}/missing", f"--input_path={tmp_path}",
         "--device=cpu", "--precision=f32",
         f"--output_dir={tmp_path}/out"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "DISCOGAN_FORCE_CPU": "1"})
    assert r.returncode != 0, (r.stdout, r.stderr)


def test_early_stop_ignores_stale_polls(tmp_path):
    """Polling an unchanged log must not consume patience: slow log
    cadence (512px) or block-buffered stdout would otherwise kill a
    healthy improving trial."""
    from discogan_modernized_tpu.tools.hyperparameter_search import (
        check_early_stop)

    log = tmp_path / "train.log"
    log.write_text("Iter [0/100] GEN: 1.0/1.0, FM: 0.1/0.1, "
                   "RECON: 0.5000/0.5000, DIS: 0.7/0.7\n")
    state: dict = {}
    assert not check_early_stop(log, state, patience=2)
    # Same content polled many times: no patience consumed.
    for _ in range(10):
        assert not check_early_stop(log, state, patience=2)
    # Two genuinely new non-improving lines -> terminate.
    for i, v in enumerate(("0.6000", "0.7000")):
        log.write_text(log.read_text() +
                       f"Iter [{i+1}/100] GEN: 1.0/1.0, FM: 0.1/0.1, "
                       f"RECON: {v}/{v}, DIS: 0.7/0.7\n")
        stop = check_early_stop(log, state, patience=2)
    assert stop


def test_native_domain_b_narrow_image_raises():
    """B-domain right crop of a <=256px-wide image is empty; the native
    fast path must raise like the cv2 path, not read out of bounds."""
    from discogan_modernized_tpu.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    img = np.zeros((64, 200, 3), np.uint8)
    with pytest.raises(ValueError, match="domain 'B'"):
        native.preprocess(img, "B", 16)
