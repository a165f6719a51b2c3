"""Per-mode HBM footprint report via compiled.memory_analysis().

Proves (with numbers, on a VIRTUAL device mesh — no hardware needed) the
spatial/TP memory claims that parallel/gspmd.py makes in prose: channel
sharding (TP) divides the parameter+optimizer bytes across the model
axis, and spatial (height) sharding divides the activation working set.
The reference's analog of this probing discipline is the nvidia-smi
free-delta memory probe (ref batch_size_optimization.py:34-44), which
needs real GPUs; XLA's ahead-of-time `jit(...).lower(...).compile()
.memory_analysis()` gives exact per-device planned bytes on any backend.

Run (defaults: 8 virtual CPU devices, 512px, global batch 8):

    python -m discogan_modernized_tpu.tools.memory_report \
        --image_size 512 --batch 8 --modes single,dp,gspmd,spatial

Emits one JSON object with, per mode, the per-device argument bytes
(params + optimizer + batch), temp bytes (activation working set), and
their total. Used by tests/test_memory_analysis.py to assert the
~1/model-axis activation scaling of spatial mode.
"""

from __future__ import annotations

import argparse
import json
import os


def _force_virtual_devices(n: int):
    # XLA_FLAGS is consumed at BACKEND initialization, not at jax import —
    # setting it here works as long as no device has been touched yet in
    # this process (running via `python -m` imports the package first,
    # which imports jax but creates no backend).
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) != n:
        raise RuntimeError(
            f"needed {n} virtual CPU devices, got {len(jax.devices())} — "
            "a backend was already initialized in this process; run "
            "memory_report as a fresh standalone process")
    return jax


def _abstract_state(jax, cfg):
    from ..train.step import init_train_state

    return jax.eval_shape(
        lambda k: init_train_state(k, cfg), jax.random.PRNGKey(0))


def _mem(compiled):
    m = compiled.memory_analysis()
    if m is None:  # backend without the analysis — report zeros, not lies
        return {}
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            out[k] = int(v)
    # live = what must fit in HBM at once: args + temps (outputs alias
    # the donated inputs).
    if "argument_size_in_bytes" in out and "temp_size_in_bytes" in out:
        out["live_bytes"] = (out["argument_size_in_bytes"]
                             + out["temp_size_in_bytes"]
                             - out.get("alias_size_in_bytes", 0))
    return out


def analyze(image_size: int, batch: int, modes, n_devices: int = 8,
            tp: int = 2, which: str = "gen", slim_state: str | None = None):
    """Returns {mode: {"gen"/"dis": memory dict}} for the asked modes.

    `batch` is the GLOBAL batch; per-device working sets are what
    memory_analysis reports (the program is SPMD — all devices identical).
    """
    jax = _force_virtual_devices(n_devices)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
    from ..train.step import TrainConfig, make_train_steps

    # bf16 compute like the real chip (the CPU default policy is f32,
    # which would double every activation byte vs the production config).
    cfg = TrainConfig(image_size=image_size, precision="bf16",
                      slim_state=slim_state)
    ts_abs = _abstract_state(jax, cfg)
    sds = jax.ShapeDtypeStruct
    report = {"image_size": image_size, "global_batch": batch,
              "n_devices": n_devices, "tp": tp, "which": which,
              "slim_state": slim_state or "off", "modes": {}}

    def batch_abs(sharding=None):
        return sds((batch, image_size, image_size, 3), jnp.float32,
                   sharding=sharding)

    def lower_report(jitted, ts_in, A, B, rate):
        compiled = jitted.lower(ts_in, A, B, rate).compile()
        return _mem(compiled)

    for mode in modes:
        if mode == "single":
            gen_step, dis_step = make_train_steps(cfg, jit=True)
            step = gen_step if which == "gen" else dis_step
            report["modes"][mode] = lower_report(
                step, ts_abs, batch_abs(), batch_abs(),
                sds((), jnp.float32))
        elif mode == "dp":
            from ..parallel import make_dp_train_steps, replicate_train_state
            from ..parallel.dp import _ts_specs

            mesh = make_mesh(n_devices)
            ts_rep = jax.eval_shape(
                lambda t: replicate_train_state(t, mesh, cfg), ts_abs)
            # Attach the DP shardings explicitly — abstract avals carry
            # none, and unsharded inputs would misstate argument bytes.
            specs = _ts_specs(cfg)
            ts_in = {
                k: jax.tree.map(
                    lambda l: sds(l.shape, l.dtype,
                                  sharding=NamedSharding(mesh, specs[k])),
                    ts_rep[k])
                for k in ts_rep
            }
            gen_step, dis_step = make_dp_train_steps(cfg, mesh)
            step = gen_step if which == "gen" else dis_step
            b = batch_abs(NamedSharding(mesh, P(DATA_AXIS)))
            report["modes"][mode] = lower_report(
                step, ts_in, b, b, sds((), jnp.float32))
        elif mode in ("gspmd", "spatial"):
            from ..parallel import make_gspmd_train_steps

            spatial = mode == "spatial"
            mesh = make_mesh(n_devices // tp, tp)
            gen_step, dis_step = make_gspmd_train_steps(
                cfg, mesh, spatial=spatial)
            step = gen_step if which == "gen" else dis_step
            jitted = step.jit_for(ts_abs)
            if spatial:
                bspec = P(DATA_AXIS, MODEL_AXIS)
            else:
                bspec = P(DATA_AXIS)
            b = batch_abs(NamedSharding(mesh, bspec))
            report["modes"][mode] = lower_report(
                jitted, ts_abs, b, b, sds((), jnp.float32))
        else:
            raise SystemExit(f"unknown mode {mode!r}")
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8,
                    help="GLOBAL batch size")
    ap.add_argument("--modes", type=str, default="single,dp,gspmd,spatial")
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--tp", type=int, default=2,
                    help="model-axis size for gspmd/spatial")
    ap.add_argument("--which", type=str, default="gen",
                    choices=["gen", "dis"])
    ap.add_argument("--slim_state", type=str, default=None,
                    choices=["off", "mv", "all"])
    args = ap.parse_args(argv)
    report = analyze(args.image_size, args.batch,
                     [m.strip() for m in args.modes.split(",") if m.strip()],
                     n_devices=args.n_devices, tp=args.tp, which=args.which,
                     slim_state=args.slim_state)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
