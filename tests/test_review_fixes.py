"""Round-3 self-review fixes: bench timed-window variant warming, the
orbax .new promotion race, xla_copts validation cleanup, and the CLI
slim_state env-override resolution."""

import os
from types import SimpleNamespace

import numpy as np
import pytest


# --------------------------------------- scan-variant warm-window planning

def _headline_cfg():
    from discogan_modernized_tpu.train.step import TrainConfig

    return TrainConfig(image_size=16, lean_dis=True, slim_state="mv")


def test_scan_variants_for_range_names_the_bench_bug():
    """The exact headline-bench scenario: a 24-step warmup chunk at it0=0
    exercises ONLY phase_cond (iteration 0 is a logged-D iteration under
    lean_dis), while the timed window [24, 408) needs phase (most chunks)
    AND phase_cond (the chunk containing iteration 150 = lcm(3, 50)).
    measure_train uses this map to pre-build every timed-window program —
    a compile inside the timed window under-reports throughput."""
    from discogan_modernized_tpu.train.step import scan_variants_for_range

    cfg = _headline_cfg()
    warm = scan_variants_for_range(cfg, 0, 24, 24)
    assert warm == {"phase_cond": 0}
    timed = scan_variants_for_range(cfg, 24, 384, 24)
    assert timed == {"phase": 24, "phase_cond": 144}


def test_make_scan_program_getter_caches_by_variant_and_size():
    from discogan_modernized_tpu.train.step import (
        make_scan_program_getter, scan_variant)

    cfg = _headline_cfg()
    get = make_scan_program_getter(cfg)
    p0 = get(0, 24)       # phase_cond
    p24 = get(24, 24)     # phase
    p48 = get(48, 24)     # phase again -> cached object
    assert scan_variant(cfg, 0, 24) == "phase_cond"
    assert scan_variant(cfg, 24, 24) == "phase"
    assert p24 is p48 and p0 is not p24
    assert set(get.progs) == {(24, "phase_cond"), (24, "phase")}
    # A different chunk size is a different program.
    p_small = get(24, 3)
    assert (3, "phase") in get.progs and p_small is not p24


def test_measure_train_runs_and_warms_both_variants(monkeypatch):
    """Integration: measure_train on the CPU backend at a tiny geometry
    must return a finite throughput and have built BOTH programs the
    timed window needs before timing starts (tracked via the real
    make_scan_train_step)."""
    import bench
    from discogan_modernized_tpu.train import step as step_mod

    built = []
    real = step_mod.make_scan_train_step

    def spy(cfg, *a, **kw):
        built.append(kw.get("variant"))
        return real(cfg, *a, **kw)

    monkeypatch.setattr(step_mod, "make_scan_train_step", spy)
    v = bench.measure_train(16, 2, n_steps=24, warmup=3, n_data=8,
                            lean_dis=True, slim_state="mv",
                            precision="f32")
    assert np.isfinite(v) and v > 0
    assert set(built) == {"phase_cond", "phase"}


# ------------------------------------------- orbax promotion race (loser)

def test_orbax_new_promotion_race_loser_uses_winners_dir(tmp_path,
                                                         monkeypatch):
    """Two processes resume from a lone .new dir: the rename loser gets
    OSError AFTER the winner's rename produced the final dir — it must
    restore from the final dir, not the renamed-away .new path."""
    pytest.importorskip("orbax.checkpoint")
    from discogan_modernized_tpu.train.checkpoint import (
        save_train_state, load_train_state)

    ts = {"w": np.arange(4, dtype=np.float32)}
    save_train_state(tmp_path, ts, 7, backend="orbax")
    final = tmp_path / "train_state_orbax"
    new = tmp_path / "train_state_orbax.new"
    os.rename(final, new)

    real_rename = os.rename

    def losing_rename(src, dst):
        if str(src) == str(new.absolute()):
            real_rename(src, dst)  # the WINNER's rename lands first...
            raise OSError(2, "No such file or directory", str(src))
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", losing_rename)
    got, iters = load_train_state(tmp_path, {"w": np.zeros(4, np.float32)})
    assert iters == 7 and np.allclose(got["w"], ts["w"])


# ------------------------------------- xla_copts validation inside finally

def test_malformed_xla_copts_does_not_leak_into_env(monkeypatch):
    """A malformed --xla_copts must raise AND leave the environment clean:
    an HP-search driver that catches the error must not inherit the bad
    value in later runs/children."""
    from discogan_modernized_tpu.train import loop as loop_mod

    monkeypatch.delenv("DISCOGAN_XLA_COPTS", raising=False)
    args = SimpleNamespace(xla_copts="not-a-kv-pair")
    with pytest.raises(ValueError):
        loop_mod.run_training(args)
    assert "DISCOGAN_XLA_COPTS" not in os.environ

    monkeypatch.setenv("DISCOGAN_XLA_COPTS", "xla_outer=1")
    with pytest.raises(ValueError):
        loop_mod.run_training(args)
    assert os.environ["DISCOGAN_XLA_COPTS"] == "xla_outer=1"


# --------------------------------------------- CLI slim_state resolution

def _trainer_args(**over):
    from discogan_modernized_tpu.cli.common import translation_parser

    args = translation_parser().parse_args([])
    for k, v in over.items():
        setattr(args, k, v)
    return args


def test_cli_slim_state_default_env_and_flag(monkeypatch):
    """Trainer slim_state: explicit flag > DISCOGAN_SLIM_STATE env >
     'mv' default. The env knob is documented on TrainConfig and must not
    be dead just because the trainer has a non-None default."""
    from discogan_modernized_tpu.train.loop import config_from_args
    from discogan_modernized_tpu.train.step import resolve_slim_state

    monkeypatch.delenv("DISCOGAN_SLIM_STATE", raising=False)
    cfg = config_from_args(_trainer_args(), False)
    assert resolve_slim_state(cfg) == "mv"

    monkeypatch.setenv("DISCOGAN_SLIM_STATE", "off")
    cfg = config_from_args(_trainer_args(), False)
    assert resolve_slim_state(cfg) == "off"

    # An explicit flag beats the env.
    cfg = config_from_args(_trainer_args(slim_state="all"), False)
    assert resolve_slim_state(cfg) == "all"

    # Library-level default (no CLI) stays the fidelity-gate "off".
    monkeypatch.delenv("DISCOGAN_SLIM_STATE", raising=False)
    from discogan_modernized_tpu.train.step import TrainConfig

    assert resolve_slim_state(TrainConfig(image_size=16)) == "off"


def test_auto_steps_per_call_phase_aligned_both_regimes():
    """The shared trainer/bench default chunk size: whole update periods
    (so aligned chunks run the straight-line phase program), ~24 at small
    sizes, 2 periods at >= 256px with remat OFF (the measured scan win,
    PERF.md round 3: +7.0% at 64px b64, +3.3% at 512px b32 slim/no-remat),
    and 1 (per-step) at >= 256px with remat ON — the faithful 512px point
    measured the k=6 phase scan -6.0% vs per-step (PERF.md round 3)."""
    from discogan_modernized_tpu.train.step import (TrainConfig,
                                                    auto_steps_per_call)

    cfg = TrainConfig(image_size=16)
    assert cfg.update_interval == 3
    assert auto_steps_per_call(cfg, 64) == 24
    assert auto_steps_per_call(cfg, 128) == 24
    # remat auto resolves ON at >= 256px -> per-step.
    assert auto_steps_per_call(cfg, 256) == 1
    assert auto_steps_per_call(cfg, 512) == 1
    assert auto_steps_per_call(TrainConfig(image_size=512, remat=True),
                               512) == 1
    # remat explicitly OFF (the slim fast point) -> the k=6 phase scan.
    no_remat = TrainConfig(image_size=512, remat=False)
    assert auto_steps_per_call(no_remat, 256) == 6
    assert auto_steps_per_call(no_remat, 512) == 6
    for size, c in ((64, cfg), (256, no_remat), (512, no_remat)):
        assert auto_steps_per_call(c, size) % c.update_interval == 0
