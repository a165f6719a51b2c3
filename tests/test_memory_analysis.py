"""Measured evidence for the spatial/TP memory claims (VERDICT r1 #3):
parallel/gspmd.py asserts in prose that spatial (height) sharding scales
the activation working set ~1/model-axis and channel sharding (TP)
divides parameter+optimizer bytes. These tests pin both with XLA's
ahead-of-time compiled.memory_analysis() on virtual CPU device meshes —
the numbers themselves (512px operating points) are recorded in PERF.md
via tools/memory_report.py.

Subprocess-per-config: the device count is baked into XLA_FLAGS at
backend init, so each mesh size needs a fresh interpreter.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_report(image_size, batch, modes, n_devices, tp=2, which="gen",
               slim=None):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["DISCOGAN_FORCE_CPU"] = "1"
    cmd = [sys.executable, "-m",
           "discogan_modernized_tpu.tools.memory_report",
           "--image_size", str(image_size), "--batch", str(batch),
           "--modes", ",".join(modes), "--n_devices", str(n_devices),
           "--tp", str(tp), "--which", which]
    if slim:
        cmd += ["--slim_state", slim]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout)


@pytest.fixture(scope="module")
def reports():
    """One subprocess per mesh size; 64px keeps CPU compiles quick while
    preserving the sharding structure (channels reach 512, height shards
    cleanly). Batch 64 so activations dominate temp bytes (at b8 the
    ~200MB batch-independent gradient/param working set hides the
    sharding effect). data axis is 1 in every spatial run, so the
    per-device batch is constant and ONLY the height sharding varies."""
    single = run_report(64, 64, ["single"], 1)
    sp2 = run_report(64, 64, ["spatial", "gspmd"], 2, tp=2)
    sp4 = run_report(64, 64, ["spatial"], 4, tp=4)
    return single, sp2, sp4


def _temp(report, mode):
    m = report["modes"][mode]
    assert "temp_size_in_bytes" in m, (
        "memory_analysis unavailable on this backend: " + json.dumps(m))
    return m["temp_size_in_bytes"]


def _args(report, mode):
    return report["modes"][mode]["argument_size_in_bytes"]


def test_spatial_activation_bytes_scale_with_model_axis(reports):
    single, sp2, sp4 = reports
    t1 = _temp(single, "single")
    t2 = _temp(sp2, "spatial")
    t4 = _temp(sp4, "spatial")
    # Height sharding divides the activation working set across the model
    # axis (halo exchange + replicated boundary layers cost slack, hence
    # 0.75/0.62 rather than 0.5/0.25 gates).
    assert t2 < 0.75 * t1, (t2, t1)
    assert t4 < 0.62 * t1, (t4, t1)
    assert t4 < t2, (t4, t2)


def test_spatial_params_replicated(reports):
    """Spatial mode replicates parameters — argument bytes must NOT grow
    with the mesh (and stay within jitter of single-device)."""
    single, sp2, _ = reports
    assert _args(sp2, "spatial") <= 1.05 * _args(single, "single")


def test_tp_divides_parameter_bytes(reports):
    """Channel sharding puts wide conv kernels (and their Adam moments) on
    the model axis: per-device argument bytes must drop vs replicated."""
    single, sp2, _ = reports
    a1 = _args(single, "single")
    a2 = _args(sp2, "gspmd")
    # At 64px the shardable (>=256-ch) kernels hold most of the bytes;
    # batch + unshardable layers keep it above the ideal 0.5.
    assert a2 < 0.85 * a1, (a2, a1)


def test_slim_state_halves_state_bytes():
    """The slim optimizer state must show up in planned argument bytes:
    bf16 m/v + bf16 master params vs f32 everything."""
    base = run_report(64, 8, ["single"], 1)
    slim = run_report(64, 8, ["single"], 1, slim="all")
    a_base = _args(base, "single")
    a_slim = _args(slim, "single")
    # f32 (4B param + 8B moments) -> bf16 (2B + 4B) on trainable nets;
    # the batch and BN states don't shrink, so gate at 0.62.
    assert a_slim < 0.62 * a_base, (a_slim, a_base)
