"""Per-layer emitter steering A/B at arbitrary shapes (round 4).

The 512px programs measure 1.6-1.9x ABOVE their compute-bound roofline
window (tools/roofline.py, PERF.md round 3) — provable emitter headroom.
This tool takes ONE layer op of the architecture (tools/step_itemize.py
geometry) and times its fwd/dx/dw lowering under a list of XLA
compiler-option sets, interleaved in one process (the only A/B protocol
tunnel variance allows, PERF.md), so per-layer offenders found by
step_itemize can be attacked with copt/layout steering one at a time —
the round-2 copt sweep only ever targeted whole programs.

Run:
  python -m discogan_modernized_tpu.tools.layer_ab --size 512 --batch 32 \
      --layer enc1 --modes fwd,dx,dw \
      --copts "base|xla_tpu_scoped_vmem_limit_kib=65536|..." [--rounds 3]

`--copts` is |-separated variants; each variant is ;-separated key=value
pairs ("base" = no overrides). Prints one JSON line per (layer, mode)
with best-of-rounds us per variant.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

from .step_itemize import (_dis_layers, _gen_layers, _op_fns, _w_shape)


def parse_copts(spec: str):
    out = []
    for variant in spec.split("|"):
        variant = variant.strip()
        if variant in ("", "base"):
            out.append(("base", None))
            continue
        d = {}
        for item in variant.split(";"):
            k, _, v = item.partition("=")
            if not k or not v:
                raise SystemExit(f"bad copt entry {item!r}")
            d[k.strip()] = v.strip()
        out.append((variant, d))
    return out


def make_mode_chain(kind, size, cin, cout, batch, dtype, mode,
                    compiler_options):
    """jitted (args..., length) chain for one layer op/mode with the given
    compiler options — same harness rules as step_itemize.time_layer_modes
    (dy threaded as an argument; dx chained through weights, dw through
    x; nonlinear liveness)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    fwd = _op_fns(kind, size, cin, cout, dtype)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(batch, size, size, cin), dtype)
    w = jnp.asarray(rng.randn(*_w_shape(kind, size, cin, cout)) * 0.05,
                    dtype)
    y_shape = jax.eval_shape(fwd, x, w)
    dy = jnp.asarray(rng.randn(*y_shape.shape), y_shape.dtype)

    if mode == "fwd":
        @functools.partial(jax.jit, static_argnums=(2,),
                           compiler_options=compiler_options)
        def chain(x, w, length):
            def body(h, _):
                out = fwd(h, w)
                return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                            ).astype(h.dtype), ()

            h, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(h.astype(jnp.float32))

        return chain, (x, w)

    if mode == "dx":
        @functools.partial(jax.jit, static_argnums=(3,),
                           compiler_options=compiler_options)
        def chain(x, w, dy, length):
            def body(w, _):
                _, vjp = jax.vjp(lambda x_: fwd(x_, w), x)
                dx = vjp(dy)[0]
                return w + (1e-30 * jnp.max(dx.astype(jnp.float32))
                            ).astype(w.dtype), ()

            w, _ = lax.scan(body, w, None, length=length)
            return jnp.sum(w.astype(jnp.float32))

        return chain, (x, w, dy)

    if mode == "dw":
        @functools.partial(jax.jit, static_argnums=(3,),
                           compiler_options=compiler_options)
        def chain(x, w, dy, length):
            def body(x, _):
                _, vjp = jax.vjp(lambda w_: fwd(x, w_), w)
                dw = vjp(dy)[0]
                return x + (1e-30 * jnp.max(dw.astype(jnp.float32))
                            ).astype(x.dtype), ()

            x, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(x.astype(jnp.float32))

        return chain, (x, w, dy)

    raise SystemExit(f"unknown mode {mode!r}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--layer", type=str, required=True,
                    help="substring of the step_itemize layer name, e.g. "
                         "'enc1' or 'dec3' or 'dis2'")
    ap.add_argument("--modes", type=str, default="fwd,dx,dw")
    ap.add_argument("--copts", type=str, default="base")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n1", type=int, default=None)
    ap.add_argument("--n2", type=int, default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..core.precision import default_policy

    dtype = default_policy(None).compute_dtype
    rows = [r for r in _gen_layers(args.size) + _dis_layers(args.size)
            if args.layer in r[0]]
    if not rows:
        raise SystemExit(f"no layer matches {args.layer!r}")
    variants = parse_copts(args.copts)
    # Window: scale like step_itemize (marginal must clear the ~30ms
    # dispatch floor without hour-long chains at 512px shapes).
    w = max(1.0, (args.size / 64) ** 2 * (args.batch / 64))
    n1 = args.n1 if args.n1 is not None else max(3, round(100 / w))
    n2 = args.n2 if args.n2 is not None else max(24, round(1100 / w))

    for (name, kind, size, cin, cout, _epi) in rows:
        for mode in args.modes.split(","):
            chains = []
            for vname, copts in variants:
                chain, cargs = make_mode_chain(kind, size, cin, cout,
                                               args.batch, dtype, mode,
                                               copts)
                _ = float(chain(*cargs, n2))  # compile + warm
                _ = float(chain(*cargs, n1))
                chains.append((vname, chain, cargs))
            best = {vname: float("inf") for vname, *_ in chains}
            for _ in range(args.rounds):
                for vname, chain, cargs in chains:  # interleaved
                    t0 = time.perf_counter()
                    _ = float(chain(*cargs, n2))
                    t_long = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    _ = float(chain(*cargs, n1))
                    t_short = time.perf_counter() - t0
                    us = (t_long - t_short) / (n2 - n1) * 1e6
                    best[vname] = min(best[vname], us)
            base = best.get("base")
            print(json.dumps({
                "layer": name, "mode": mode,
                "us": {v: round(t, 1) for v, t in best.items()},
                "vs_base": {v: round(t / base, 3) for v, t in best.items()}
                if base else None}), flush=True)


if __name__ == "__main__":
    main()
