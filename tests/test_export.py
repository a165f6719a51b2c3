"""jax.export serving artifacts: round trips with no model code at load.

The reference has no serialized-computation deployment path — its serving
unit is a .pth that needs model.py to rebuild the network (ref
inference.py:127-149). tools/export_model bakes weights into a StableHLO
artifact; these tests prove the artifact reproduces the live forward
exactly and that the CLI covers the reference checkpoint layout.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def gen16():
    import jax

    from discogan_modernized_tpu.models import generator_init

    return generator_init(jax.random.PRNGKey(7), 16)


def _direct(params, state, x):
    from discogan_modernized_tpu.core.precision import default_policy
    from discogan_modernized_tpu.models import generator_apply

    y, _ = generator_apply(params, state, x, policy=default_policy("f32"),
                           training=False)
    return np.asarray(y)


def test_export_static_round_trip(gen16, tmp_path):
    from discogan_modernized_tpu.tools.export_model import (
        export_generator,
        load_exported,
    )

    params, state = gen16
    data = export_generator(params, state, 16, batch=2, precision="f32")
    path = tmp_path / "gen.stablehlo"
    path.write_bytes(data)

    exp = load_exported(path)
    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    got = np.asarray(exp.call(x))
    np.testing.assert_allclose(got, _direct(params, state, x), atol=1e-6)


def test_export_symbolic_batch(gen16):
    from discogan_modernized_tpu.tools.export_model import (
        export_generator,
        load_exported,
    )

    params, state = gen16
    exp = load_exported(export_generator(params, state, 16, batch=0,
                                         precision="f32"))
    for b in (1, 3):
        x = np.random.RandomState(b).rand(b, 16, 16, 3).astype(np.float32)
        got = np.asarray(exp.call(x))
        assert got.shape == (b, 16, 16, 3)
        np.testing.assert_allclose(got, _direct(params, state, x), atol=1e-6)


def test_export_cli_from_reference_layout(gen16, tmp_path):
    """main() reads the reference .pth layout and writes the artifact."""
    import jax

    from discogan_modernized_tpu.models import discriminator_init
    from discogan_modernized_tpu.tools.export_model import load_exported, main
    from discogan_modernized_tpu.train.checkpoint import save_reference_layout

    gp, gs = gen16
    ts = {"models": {}, "model_states": {}}
    for name in ("gen_A", "gen_B"):
        ts["models"][name], ts["model_states"][name] = gp, gs
    for name in ("dis_A", "dis_B"):
        dp, ds = discriminator_init(jax.random.PRNGKey(3), 16)
        ts["models"][name], ts["model_states"][name] = dp, ds
    save_reference_layout(tmp_path, ts, "final")

    out = tmp_path / "artifact.stablehlo"
    rc = main([f"--model_path={tmp_path}", "--direction=AtoB",
               "--image_size=16", "--batch=1", "--precision=f32",
               f"--output={out}"])
    assert rc == 0 and out.exists()

    exp = load_exported(out)
    x = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(exp.call(x)),
                               _direct(gp, gs, x), atol=1e-6)


def test_export_cli_missing_checkpoint(tmp_path):
    from discogan_modernized_tpu.tools.export_model import main

    rc = main([f"--model_path={tmp_path / 'nope'}", "--image_size=16"])
    assert rc == 1
