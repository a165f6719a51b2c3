"""Version-stable serving artifacts: jax.export (StableHLO) generators.

The reference's deployment unit is a .pth state_dict that needs the model
code to rebuild the network before it can serve (ref inference.py:127-149).
The TPU-native deployment unit is the compiled computation itself:
`export_generator` lowers the jitted eval-mode forward — weights closed
over, so they are baked into the module as constants — and serializes the
StableHLO artifact; `load_exported` deserializes and calls it with NO
model code or checkpoint on the serving host, on any platform the
artifact was lowered for (``--platforms tpu,cpu`` produces one
dual-backend artifact). jax.export guarantees forward compatibility of
the serialized form, so the artifact outlives framework upgrades.

Batch handling is TPU-first: static by default (fixed shapes, one
compiled program). ``--batch 0`` exports a symbolic batch dimension
instead — one artifact serves any batch size; each backend still
specializes per concrete shape at call time.

Run:
    python -m discogan_modernized_tpu.tools.export_model \
        --model_path models/<task>/<arch>/<ts> --direction AtoB \
        --image_size 64 [--batch 1] [--platforms tpu,cpu] \
        [--output artifact.stablehlo]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def export_generator(params, state, image_size: int, *, batch: int = 1,
                     platforms=None, precision: str | None = None) -> bytes:
    """Serialize the eval-mode generator forward with weights baked in.

    batch=0 exports a symbolic batch dimension ("b"); otherwise the
    artifact is specialized to the given static batch. `platforms` is a
    sequence like ("tpu", "cpu"); None exports for the default backend.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..core.precision import default_policy
    from ..models import generator_apply

    policy = default_policy(precision)

    def translate(x):
        y, _ = generator_apply(params, state, x, policy=policy,
                               training=False)
        return y

    if batch == 0:
        shape = jexport.symbolic_shape(f"b, {image_size}, {image_size}, 3")
    else:
        shape = (batch, image_size, image_size, 3)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    exp = jexport.export(jax.jit(translate),
                         platforms=tuple(platforms) if platforms else None)(spec)
    return exp.serialize()


def export_from_checkpoint(model_path, direction: str, image_size: int, *,
                           batch: int = 1, platforms=None,
                           precision: str | None = None):
    """(artifact bytes, generator name) for a reference-layout checkpoint
    dir; direction AtoB serves gen_B, BtoA serves gen_A — the same mapping
    the inference CLI uses (ref inference.py:127-132)."""
    from ..train.checkpoint import load_reference_weights

    name = "gen_B" if direction == "AtoB" else "gen_A"
    params, state = load_reference_weights(
        Path(model_path) / f"{name}_final.pth", name, image_size)
    data = export_generator(params, state, image_size, batch=batch,
                            platforms=platforms, precision=precision)
    return data, name


def load_exported(path_or_bytes):
    """Deserialize an artifact; returns the jax.export Exported — call it
    via `.call(x)` with a float32 NHWC batch in [0,1]. Needs no model
    code or weights: both live inside the artifact.

    Hot paths must wrap the call once in `jax.jit(exp.call)`: the raw
    `.call` re-traces every invocation (measured 1.7-9x the jitted
    per-call latency — PERF.md 'artifact-serving latency')."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = path_or_bytes
    else:
        data = Path(path_or_bytes).read_bytes()
    return jexport.deserialize(bytearray(data))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model_path", type=str, required=True,
                    help="checkpoint dir holding gen_{A,B}_final.pth")
    ap.add_argument("--direction", type=str, default="AtoB",
                    choices=["AtoB", "BtoA"])
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1,
                    help="static serving batch; 0 = symbolic (any batch)")
    ap.add_argument("--platforms", type=str, default=None,
                    help="comma list to lower for, e.g. 'tpu,cpu'; "
                         "default: the current backend only")
    ap.add_argument("--precision", type=str, default=None,
                    choices=[None, "bf16", "f32"],
                    help="compute dtype baked into the artifact "
                         "(default: backend policy)")
    ap.add_argument("--output", type=str, default=None,
                    help="artifact path (default: "
                         "<model_path>/<gen>_final.stablehlo)")
    return ap.parse_args(argv)


def load_artifact_sidecar(path) -> dict | None:
    """The exporter's ops-traceability sidecar (<artifact>.json), or None
    when absent/unreadable. Consumers use it to cross-check what the
    opaque StableHLO bytes actually embed (generator, direction, baked
    precision) against their own flags."""
    import json

    p = Path(path)
    side = p.with_suffix(p.suffix + ".json")
    try:
        return json.loads(side.read_text())
    except (OSError, ValueError):
        return None


def main(argv=None):
    args = parse_args(argv)
    if args.batch < 0:
        raise SystemExit(f"--batch must be >= 0, got {args.batch}")
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 if args.platforms else None)
    try:
        data, name = export_from_checkpoint(
            args.model_path, args.direction, args.image_size,
            batch=args.batch, platforms=platforms, precision=args.precision)
    except FileNotFoundError as e:
        print(f"모델 로드 실패: {e}")
        return 1
    out = Path(args.output) if args.output else (
        Path(args.model_path) / f"{name}_final.stablehlo")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(data)
    batch_s = "b (symbolic)" if args.batch == 0 else str(args.batch)
    plat_s = ",".join(platforms) if platforms else "default"
    # Ops-traceability sidecar: what the artifact is and where it came
    # from (the artifact itself is opaque StableHLO bytes).
    import json
    import time as _time

    meta = {
        "generator": name,
        "direction": args.direction,
        "image_size": args.image_size,
        "batch": "symbolic" if args.batch == 0 else args.batch,
        "platforms": platforms or ["default"],
        "precision": args.precision or "backend-default",
        "source_checkpoint": str(Path(args.model_path).resolve()),
        "artifact_bytes": len(data),
        "created": _time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    out.with_suffix(out.suffix + ".json").write_text(
        json.dumps(meta, indent=2) + "\n")
    print(f"exported {name} -> {out} ({len(data) / 1e6:.2f} MB, "
          f"batch={batch_s}, platforms={plat_s})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
