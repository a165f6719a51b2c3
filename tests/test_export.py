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

    import json

    meta = json.loads(out.with_suffix(".stablehlo.json").read_text())
    assert meta["generator"] == "gen_B" and meta["image_size"] == 16
    assert meta["artifact_bytes"] == out.stat().st_size

    exp = load_exported(out)
    x = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(exp.call(x)),
                               _direct(gp, gs, x), atol=1e-6)


def test_export_cli_missing_checkpoint(tmp_path):
    from discogan_modernized_tpu.tools.export_model import main

    rc = main([f"--model_path={tmp_path / 'nope'}", "--image_size=16"])
    assert rc == 1


def test_serve_from_artifact(gen16, tmp_path):
    """The daemon serves a StableHLO artifact with no checkpoint on disk:
    the full code-free deployment chain (export -> HTTP translate)."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from discogan_modernized_tpu.tools.export_model import export_generator
    from discogan_modernized_tpu.tools.serve import parse_args, serve

    params, state = gen16
    fwd = tmp_path / "gen_B.stablehlo"
    fwd.write_bytes(export_generator(params, state, 16, batch=0,
                                     precision="f32"))
    rev = tmp_path / "gen_A.stablehlo"
    rev.write_bytes(export_generator(params, state, 16, batch=1,
                                     precision="f32"))

    args = parse_args([f"--exported={fwd}", f"--exported_rev={rev}",
                       "--image_size=16", "--port=0"])
    srv, translator = serve(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert json.load(r)["exported"] is True
        img = Image.fromarray((np.random.RandomState(0)
                               .rand(16, 16, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        for path in ("/translate", "/reconstruct"):
            req = urllib.request.Request(
                url + path, data=buf.getvalue(),
                headers={"Content-Type": "image/png"})
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == 200
                out = Image.open(io.BytesIO(r.read()))
                assert out.size == (16, 16)
        assert translator.stats()["requests"] == 2
    finally:
        srv.shutdown()


def test_inference_cli_from_artifact(gen16, tmp_path):
    """inference.py --exported runs the full CLI (load -> translate ->
    panel png) from a StableHLO artifact alone — no checkpoint, no
    model-code weight path — and matches the checkpoint-mode forward."""
    from PIL import Image

    from discogan_modernized_tpu.cli.inference import main as infer_main
    from discogan_modernized_tpu.tools.export_model import export_generator

    params, state = gen16
    fwd = tmp_path / "gen_B.stablehlo"
    fwd.write_bytes(export_generator(params, state, 16, batch=1,
                                     precision="f32"))
    rev = tmp_path / "gen_A.stablehlo"
    rev.write_bytes(export_generator(params, state, 16, batch=0,
                                     precision="f32"))

    img = tmp_path / "input.png"
    Image.fromarray((np.random.RandomState(0)
                     .rand(16, 16, 3) * 255).astype(np.uint8)).save(img)

    out_dir = tmp_path / "out"
    rc = infer_main([f"--exported={fwd}", f"--exported_rev={rev}",
                     f"--input_path={img}", f"--output_dir={out_dir}",
                     "--image_size=16", "--device=cpu"])
    assert rc == 0
    assert (out_dir / "input_result.png").exists()

    # Wrong --image_size must be rejected up front, not crash mid-run.
    with pytest.raises(SystemExit):
        infer_main([f"--exported={fwd}", f"--input_path={img}",
                    f"--output_dir={out_dir}", "--image_size=32",
                    "--device=cpu"])

    # Static-batch mismatch: b1 artifact with --batch_size=4.
    with pytest.raises(SystemExit):
        infer_main([f"--exported={fwd}", f"--input_path={img}",
                    f"--output_dir={out_dir}", "--image_size=16",
                    "--batch_size=4", "--device=cpu"])

    # Neither --model_path nor --exported: usage error, exit 2.
    assert infer_main([f"--input_path={img}", f"--output_dir={out_dir}",
                       "--image_size=16", "--device=cpu"]) == 2


def test_inference_cli_artifact_symbolic_batched(gen16, tmp_path):
    """A symbolic-batch artifact serves --batch_size>1 with a padded final
    chunk: 5 images through batch 4 -> one full + one padded flush, all
    result panels written."""
    from PIL import Image

    from discogan_modernized_tpu.cli.inference import main as infer_main
    from discogan_modernized_tpu.tools.export_model import export_generator

    params, state = gen16
    fwd = tmp_path / "gen_B.stablehlo"
    fwd.write_bytes(export_generator(params, state, 16, batch=0,
                                     precision="f32"))

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    for i in range(5):
        Image.fromarray((np.random.RandomState(i)
                         .rand(16, 16, 3) * 255).astype(np.uint8)
                        ).save(in_dir / f"im{i}.jpg")

    out_dir = tmp_path / "out"
    rc = infer_main([f"--exported={fwd}", f"--input_path={in_dir}",
                     f"--output_dir={out_dir}", "--image_size=16",
                     "--batch_size=4", "--device=cpu"])
    assert rc == 0
    for i in range(5):
        assert (out_dir / f"im{i}_result.png").exists()


def test_serve_rejects_static_multi_batch_artifact(gen16, tmp_path):
    from discogan_modernized_tpu.tools.export_model import export_generator
    from discogan_modernized_tpu.tools.serve import ExportedTranslator

    params, state = gen16
    p = tmp_path / "b4.stablehlo"
    p.write_bytes(export_generator(params, state, 16, batch=4,
                                   precision="f32"))
    with pytest.raises(ValueError, match="static batch 4"):
        ExportedTranslator(p, 16)
