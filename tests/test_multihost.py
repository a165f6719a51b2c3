"""--multihost end-to-end: two REAL jax.distributed processes on the CPU
backend (2 virtual devices each -> a 4-device global mesh), driving the
distributed trainer through the per-host data shard, global-batch
assembly (make_array_from_process_local_data), shard_map psum across
processes, and process-0 I/O gating (train/loop.py:118-132, 187-198)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_multihost_two_process_training(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = os.environ.copy()
        env["DISCOGAN_FORCE_CPU"] = "1"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = str(REPO)
        cmd = [
            sys.executable, str(REPO / "distributed_image_translation.py"),
            "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
            "--batch_size=8", "--epochs=1", "--log_interval=4",
            "--image_save_interval=1000000", "--model_save_interval=1000000",
            "--distributed", "--multihost",
            f"--coordinator_address=127.0.0.1:{port}",
            "--num_processes=2", f"--process_id={pid}",
            f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
            "--precision=f32",
        ]
        log = open(tmp_path / f"proc{pid}.log", "w")
        procs.append((subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                       env=env, cwd=tmp_path), log))

    rcs = []
    for p, log in procs:
        try:
            rcs.append(p.wait(timeout=600))
        except subprocess.TimeoutExpired:
            p.kill()
            rcs.append("timeout")
        finally:
            log.close()
    logs = {i: (tmp_path / f"proc{i}.log").read_text() for i in range(2)}
    assert rcs == [0, 0], f"rc={rcs}\n--- proc0:\n{logs[0][-3000:]}" \
                          f"\n--- proc1:\n{logs[1][-3000:]}"

    # Process 0 owns all I/O: log + final checkpoints exist exactly once.
    tlogs = list((tmp_path / "r").glob("synthetic/gan/*/training_log.txt"))
    assert len(tlogs) == 1, tlogs
    content = tlogs[0].read_text()
    # 256 synthetic pairs / 2 hosts = 128 per host; batch 8 -> 16 iters.
    assert "Iter [0/16]" in content and "Iter [12/16]" in content
    finals = list((tmp_path / "m").glob("synthetic/gan/*/gen_B_final.pth"))
    assert len(finals) == 1
    # Only process 0 prints the completion banner.
    assert "Training completed" in logs[0]
    assert "Training completed" not in logs[1]


def test_multihost_requires_distributed(tmp_path):
    from discogan_modernized_tpu.cli.distributed_image_translation import main

    with pytest.raises(SystemExit, match="requires --distributed"):
        main(["--task_name=synthetic", "--multihost",
              f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m"])
