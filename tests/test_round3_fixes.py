"""Round-3 advisor fixes: xla_copts env restore, orbax lone-.new
promotion, artifact-mode flag cross-check, batched cache msync
publication, config scalar coercion."""

import json
import os
from pathlib import Path

import numpy as np
import pytest


# ------------------------------------------------- xla_copts env restore

def test_run_training_restores_xla_copts_env(tmp_path, monkeypatch):
    """--xla_copts must not leak into the process env after run_training
    returns (HP-search drivers call run_training repeatedly in-process)."""
    from discogan_modernized_tpu.train import loop as loop_mod

    monkeypatch.delenv("DISCOGAN_XLA_COPTS", raising=False)

    seen = {}

    def fake_impl(args, *, angle_variant=False, distributed=False):
        seen["env"] = os.environ.get("DISCOGAN_XLA_COPTS")
        return tmp_path, tmp_path

    monkeypatch.setattr(loop_mod, "_run_training", fake_impl)

    from types import SimpleNamespace

    args = SimpleNamespace(xla_copts="xla_tpu_scoped_vmem_limit_kib=32768")
    loop_mod.run_training(args)
    assert seen["env"] == "xla_tpu_scoped_vmem_limit_kib=32768"
    assert "DISCOGAN_XLA_COPTS" not in os.environ

    # A pre-existing value is restored, not clobbered.
    monkeypatch.setenv("DISCOGAN_XLA_COPTS", "xla_outer=1")
    loop_mod.run_training(args)
    assert os.environ["DISCOGAN_XLA_COPTS"] == "xla_outer=1"

    # Restored on the exception path too.
    def raising_impl(args, **kw):
        raise RuntimeError("boom")

    monkeypatch.setattr(loop_mod, "_run_training", raising_impl)
    with pytest.raises(RuntimeError):
        loop_mod.run_training(args)
    assert os.environ["DISCOGAN_XLA_COPTS"] == "xla_outer=1"


# ------------------------------------------------- orbax .new promotion

def _tiny_ts():
    return {"w": np.arange(4, dtype=np.float32)}


def test_orbax_lone_new_dir_is_promoted_not_deleted(tmp_path):
    """Crash recovery: when a previous crash left only train_state_orbax.new
    (the sole surviving checkpoint), the next save must promote it, never
    rmtree it while reusing the temp name."""
    pytest.importorskip("orbax.checkpoint")
    from discogan_modernized_tpu.train.checkpoint import (
        save_train_state, load_train_state)

    ts = _tiny_ts()
    save_train_state(tmp_path, ts, 7, backend="orbax")
    # Simulate the crash window: final dir gone, .new holds the only copy.
    final = tmp_path / "train_state_orbax"
    new = tmp_path / "train_state_orbax.new"
    os.rename(final, new)

    # Load falls back to .new AND promotes it to the final name.
    got, iters = load_train_state(tmp_path, _tiny_ts())
    assert iters == 7 and np.allclose(got["w"], ts["w"])
    assert final.exists() and not new.exists()

    # Same protection at save time: recreate the lone-.new state and save.
    os.rename(final, new)
    save_train_state(tmp_path, {"w": np.full(4, 9.0, np.float32)}, 8,
                     backend="orbax")
    got, iters = load_train_state(tmp_path, _tiny_ts())
    assert iters == 8 and np.allclose(got["w"], 9.0)


# --------------------------------------- artifact-mode flag cross-check

def test_inference_artifact_direction_mismatch_errors(tmp_path, monkeypatch):
    """--direction BtoA against a gen_B artifact (sidecar present) must
    fail loudly instead of silently serving the wrong generator."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x * 2.0)
    exp = jexport.export(fn)(
        jax.ShapeDtypeStruct((1, 8, 8, 3), jnp.float32))
    art = tmp_path / "gen_B_final.stablehlo"
    art.write_bytes(exp.serialize())
    (tmp_path / "gen_B_final.stablehlo.json").write_text(json.dumps({
        "generator": "gen_B", "direction": "AtoB",
        "image_size": 8, "precision": "f32"}))

    from PIL import Image

    img_dir = tmp_path / "in"
    img_dir.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "a.jpg")

    from discogan_modernized_tpu.cli.inference import main

    with pytest.raises(SystemExit, match="gen_B"):
        main(["--exported", str(art), "--input_path", str(img_dir),
              "--output_dir", str(tmp_path / "out"), "--image_size", "8",
              "--direction", "BtoA", "--device", "cpu"])

    # Precision conflict with the baked dtype also errors.
    with pytest.raises(SystemExit, match="precision"):
        main(["--exported", str(art), "--input_path", str(img_dir),
              "--output_dir", str(tmp_path / "out"), "--image_size", "8",
              "--precision", "bf16", "--device", "cpu"])

    # Matching flags pass through and run.
    rc = main(["--exported", str(art), "--input_path", str(img_dir),
               "--output_dir", str(tmp_path / "out"), "--image_size", "8",
               "--direction", "AtoB", "--precision", "f32",
               "--device", "cpu"])
    assert rc == 0


# --------------------------------------------- batched msync publication

def test_cache_store_batches_status_publication(tmp_path, monkeypatch):
    from discogan_modernized_tpu.data import cache as cache_mod
    from discogan_modernized_tpu.data.cache import (
        DecodedCache, _STATUS_OK)

    paths = []
    for i in range(5):
        p = tmp_path / f"img_{i}.jpg"
        p.write_bytes(b"x" * 10)
        paths.append(str(p))

    c = DecodedCache(paths, None, 4, root=tmp_path / "cache")
    flushes = {"n": 0}
    real_flush = c._publish_pending

    arr = np.ones((4, 4, 3), np.float32)
    c.store(paths[0], arr)
    # Below the batch threshold: status not yet published on disk...
    assert int(c.status[0]) != _STATUS_OK
    # ...but an in-process load still hits (pending-set aware).
    st, got = c.load(paths[0])
    assert st == _STATUS_OK and np.array_equal(got, arr)

    # flush() publishes everything.
    c.flush()
    assert int(c.status[0]) == _STATUS_OK
    st, got = c.load(paths[0])
    assert st == _STATUS_OK and np.array_equal(got, arr)

    # The batch threshold triggers publication without an explicit flush.
    monkeypatch.setattr(DecodedCache, "_SYNC_EVERY", 2)
    c2 = DecodedCache(paths, "A", 4, root=tmp_path / "cache")
    c2.store(paths[1], arr)
    assert int(c2.status[1]) != _STATUS_OK
    c2.store(paths[2], arr)
    assert int(c2.status[1]) == _STATUS_OK
    assert int(c2.status[2]) == _STATUS_OK
    assert not c2._pending


# ------------------------------------------------ config scalar coercion

def test_config_rejects_lossy_and_bool_scalars(tmp_path):
    from discogan_modernized_tpu.cli.common import (
        parse_with_config, translation_parser)

    def write(conf):
        f = tmp_path / "c.yaml"
        import yaml

        f.write_text(yaml.safe_dump(conf))
        return str(f)

    # Lossy float for an int flag: rejected.
    with pytest.raises(SystemExit, match="image_size"):
        parse_with_config(translation_parser(),
                          ["--config", write({"image_size": 64.5})])
    # YAML bool for an int flag: rejected.
    with pytest.raises(SystemExit, match="batch_size"):
        parse_with_config(translation_parser(),
                          ["--config", write({"batch_size": True})])
    # Exact non-lossy scalars coerce to the declared type.
    args = parse_with_config(
        translation_parser(),
        ["--config", write({"image_size": 64.0, "learning_rate": 1,
                            "batch_size": 32})])
    assert args.image_size == 64 and isinstance(args.image_size, int)
    assert args.learning_rate == 1.0 and isinstance(args.learning_rate, float)
    assert args.batch_size == 32
