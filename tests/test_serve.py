"""Serving daemon: real HTTP round trips against a trained checkpoint."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from discogan_modernized_tpu.cli.image_translation import main

    tmp = tmp_path_factory.mktemp("serve_ckpt")
    _, model_path = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--log_interval=1000",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp}/r", f"--models_dir={tmp}/m", "--precision=f32",
    ])
    return model_path


@pytest.fixture(scope="module")
def server(checkpoint):
    from discogan_modernized_tpu.tools.serve import parse_args, serve

    args = parse_args([f"--model_path={checkpoint}", "--image_size=16",
                       "--port=0", "--precision=f32"])
    srv, translator = serve(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", translator
    srv.shutdown()


def _post_image(url, path):
    img = Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    req = urllib.request.Request(url + path, data=buf.getvalue(),
                                 headers={"Content-Type": "image/png"})
    return urllib.request.urlopen(req, timeout=30)


def test_healthz(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["image_size"] == 16


def test_translate_roundtrip(server):
    url, translator = server
    with _post_image(url, "/translate") as r:
        assert r.headers["Content-Type"] == "image/png"
        out = Image.open(io.BytesIO(r.read()))
    assert out.size == (16, 16)
    assert translator.count >= 1


def test_reconstruct_roundtrip(server):
    url, _ = server
    with _post_image(url, "/reconstruct") as r:
        out = Image.open(io.BytesIO(r.read()))
    assert out.size == (16, 16)


def test_stats_and_bad_requests(server):
    url, _ = server
    with urllib.request.urlopen(url + "/stats", timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1
    assert stats["p50_ms"] is not None

    # Garbage body -> clean 400, not a crash.
    req = urllib.request.Request(url + "/translate", data=b"not an image")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(url + "/nope", timeout=10)
    assert e.value.code == 404
