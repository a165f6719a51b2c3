"""Model-serving daemon: HTTP translation endpoint over a trained checkpoint.

The reference's only deployment path is the batch inference CLI; for
production serving this daemon loads a checkpoint once, jit-compiles and
warms the generator at startup, and serves:

    POST /translate          image bytes (png/jpg) -> translated PNG
    POST /reconstruct        image bytes -> cycle-reconstructed PNG
    GET  /healthz            JSON liveness + model info
    GET  /stats              request count, p50/p99 latency

stdlib-only (ThreadingHTTPServer); device calls serialize behind a lock
(one chip = one compute stream). Run:

    python -m discogan_modernized_tpu.tools.serve \
        --model_path models/edges2shoes/discogan/<ts> --direction AtoB

or serve a jax.export StableHLO artifact (tools/export_model.py) with no
model code or checkpoint on this host:

    python -m discogan_modernized_tpu.tools.serve \
        --exported gen_B_final.stablehlo [--exported_rev gen_A_final.stablehlo]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DiscoGAN 서빙 데몬")
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint dir (omit when serving --exported "
                        "artifacts)")
    p.add_argument("--exported", type=str, default=None,
                   help="serve a jax.export StableHLO artifact "
                        "(tools/export_model.py) instead of a checkpoint — "
                        "no model code or .pth needed on this host")
    p.add_argument("--exported_rev", type=str, default=None,
                   help="reverse-generator artifact for /reconstruct")
    p.add_argument("--direction", type=str, default="AtoB",
                   choices=["AtoB", "BtoA"])
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--dataset_type", type=str, default=None)
    p.add_argument("--domain", type=str, default=None, choices=["A", "B", None])
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--precision", type=str, default=None,
                   choices=["bf16", "f32"])
    return p.parse_args(argv)


class Translator:
    """Checkpoint + jitted forward; thread-safe."""

    def __init__(self, model_path, direction, image_size, precision=None):
        import jax

        # Persistent compile cache: a daemon restart must not pay the
        # full multi-minute remote compile again during warmup.
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/root/.cache/jax_comp")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass

        from ..core.precision import default_policy
        from ..models.generator import generator_apply
        from ..train.checkpoint import load_reference_weights

        self.image_size = image_size
        model_dir = Path(model_path)
        fwd = "gen_B" if direction == "AtoB" else "gen_A"
        rev = "gen_A" if direction == "AtoB" else "gen_B"
        self.params, self.state = load_reference_weights(
            model_dir / f"{fwd}_final.pth", fwd, image_size)
        self.rev = None
        if (model_dir / f"{rev}_final.pth").exists():
            self.rev = load_reference_weights(
                model_dir / f"{rev}_final.pth", rev, image_size)

        policy = default_policy(precision)

        @jax.jit
        def fwd_fn(params, state, x):
            y, _ = generator_apply(params, state, x, policy=policy,
                                   training=False)
            return y

        self._fwd = fwd_fn
        self._lock = threading.Lock()
        self.latencies: list = []
        self.count = 0
        # Warm: compile the batch-1 program before accepting traffic.
        dummy = np.zeros((1, image_size, image_size, 3), np.float32)
        np.asarray(self._fwd(self.params, self.state, dummy))
        if self.rev is not None:
            np.asarray(self._fwd(self.rev[0], self.rev[1], dummy))

    def translate(self, img: np.ndarray, reconstruct: bool = False) -> np.ndarray:
        import jax.numpy as jnp

        x = jnp.asarray(img)[None]
        with self._lock:
            t0 = time.perf_counter()
            y = self._fwd(self.params, self.state, x)
            if reconstruct:
                if self.rev is None:
                    raise RuntimeError("reverse generator checkpoint not found")
                y = self._fwd(self.rev[0], self.rev[1], y)
            out = np.asarray(y[0])
            self.latencies.append(time.perf_counter() - t0)
            self.latencies = self.latencies[-1000:]
            self.count += 1
        return out

    def stats(self) -> dict:
        lat = sorted(self.latencies)
        pct = lambda q: (lat[int(len(lat) * q)] * 1000) if lat else None  # noqa: E731
        return {"requests": self.count,
                "p50_ms": pct(0.5), "p99_ms": pct(0.99)}


class ExportedTranslator:
    """StableHLO serving artifact (tools/export_model.py); thread-safe.

    The artifact carries the compiled computation AND the weights, so this
    host needs neither the model code nor a checkpoint. Accepts batch-1
    static or symbolic-batch artifacts (the daemon serves one image per
    request)."""

    def __init__(self, exported_path, image_size, exported_rev=None):
        import jax

        from .export_model import load_exported

        self.image_size = image_size
        exp = load_exported(exported_path)
        aval = exp.in_avals[0]
        if tuple(aval.shape[1:]) != (image_size, image_size, 3):
            raise ValueError(
                f"artifact expects input {tuple(aval.shape)}, which does "
                f"not match --image_size={image_size}")
        b = aval.shape[0]
        if isinstance(b, int) and b != 1:
            raise ValueError(
                f"artifact was exported with static batch {b}; the daemon "
                "serves one image per request — re-export with --batch 1 "
                "or --batch 0 (symbolic)")
        # Exported.call re-traces on EVERY invocation (measured 1.7-9x
        # the live-jit per-call latency, PERF.md); jit-wrapping it caches
        # the executable per input shape like any jitted function.
        self._fwd = jax.jit(exp.call)
        self._rev = (jax.jit(load_exported(exported_rev).call)
                     if exported_rev else None)
        self._lock = threading.Lock()
        self.latencies: list = []
        self.count = 0
        dummy = np.zeros((1, image_size, image_size, 3), np.float32)
        np.asarray(self._fwd(dummy))
        if self._rev is not None:
            np.asarray(self._rev(dummy))

    def translate(self, img: np.ndarray, reconstruct: bool = False) -> np.ndarray:
        x = np.asarray(img, np.float32)[None]
        with self._lock:
            t0 = time.perf_counter()
            y = self._fwd(x)
            if reconstruct:
                if self._rev is None:
                    raise RuntimeError(
                        "no reverse artifact (--exported_rev) loaded")
                y = self._rev(np.asarray(y))
            out = np.asarray(y)[0]
            self.latencies.append(time.perf_counter() - t0)
            self.latencies = self.latencies[-1000:]
            self.count += 1
        return out

    stats = Translator.stats


def make_handler(translator, args):
    from PIL import Image

    from ..data.preprocess import preprocess_array

    # Artifact mode: --direction does not pick the generator (it is baked
    # at export) — report the sidecar's recorded direction instead of the
    # flag. Resolved ONCE here: it is immutable for the server's lifetime
    # and /healthz is polled every few seconds by load balancers.
    health_direction = args.direction
    if getattr(args, "exported", None):
        from .export_model import load_artifact_sidecar

        meta = load_artifact_sidecar(args.exported)
        health_direction = ((meta or {}).get("direction")
                            or "baked-in-artifact")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "direction": health_direction,
                                 "image_size": args.image_size,
                                 "exported": bool(getattr(args, "exported",
                                                          None))})
            elif self.path == "/stats":
                self._json(200, translator.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/translate", "/reconstruct"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                img = np.array(Image.open(io.BytesIO(raw)).convert("RGB"))
                if args.dataset_type in ("edges2handbags", "edges2shoes"):
                    dom = args.domain
                else:
                    dom = None
                x = preprocess_array(img, dom, args.image_size)
                y = translator.translate(
                    x, reconstruct=self.path == "/reconstruct")
                out = Image.fromarray(
                    (np.clip(y, 0, 1) * 255).astype(np.uint8))
                buf = io.BytesIO()
                out.save(buf, format="PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": str(e)})

    return Handler


def serve(args):
    if args.exported:
        translator = ExportedTranslator(args.exported, args.image_size,
                                        args.exported_rev)
    elif args.model_path:
        translator = Translator(args.model_path, args.direction,
                                args.image_size, args.precision)
    else:
        raise SystemExit("one of --model_path or --exported is required")
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(translator, args))
    print(f"서빙 시작: http://{args.host}:{server.server_address[1]} "
          f"({args.direction}, {args.image_size}px)")
    return server, translator


def main(argv=None):
    args = parse_args(argv)
    server, _ = serve(args)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
