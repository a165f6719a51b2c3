"""Pallas blocked conv vs XLA's conv emitter, on the real chip.

Run: python -m discogan_modernized_tpu.tools.conv_kernel_bench
     [--size 64] [--batch 64] [--dw] [--fused]

Per k4/s2/p1 layer of the architecture (ref model.py geometry), times
(a) lax.conv_general_dilated and (b) ops/pallas_conv.conv2d_k4s2p1 with
chained-scan differencing (per-dispatch tunnel latency cancels — same
harness as tools/fwd_profile.py, validated at 186-190 TF/s on known
matmuls). --fused adds the conv+BN+LeakyReLU comparison (XLA fusion vs
the Pallas epilogue); --dw compares the weight-grad contraction.

Measurements land in PERF.md; the integration decision (which layers, if
any, route through Pallas) is gated on these numbers.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _layers(image_size: int, batch: int):
    from ..models.geometry import encoder_channels

    chans = encoder_channels(image_size)
    size, cin = image_size, 3
    out = []
    for c in chans:
        out.append((batch, size, cin, c))
        size, cin = size // 2, c
    return out


def make_timer(n1=20, n2=520, reps=5):
    # n2 - n1 = 500 ops: at 10-170us/op the differenced signal is
    # 5-85 ms, far above the observed ~1-3 ms per-call tunnel variance
    # (the old 100-op difference went NEGATIVE on sub-10us layers).
    import jax
    import jax.numpy as jnp
    from jax import lax

    def time_op(op, x, label=""):
        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(x, length):
            def body(h, _):
                y = op(h)
                # NONLINEAR dependency: a linear one (sum) lets XLA
                # algebraically collapse a bare conv out of the chain
                # (observed: 487 "TF/s" > the 197 chip peak) while the
                # opaque Pallas call pays full price — max() blocks the
                # rewrite for both.
                return h + (1e-30 * jnp.max(y.astype(jnp.float32))
                            ).astype(h.dtype), ()

            h, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(h)

        def timed(length):
            _ = float(chain(x, length))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(chain(x, length))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    return time_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dw", action="store_true")
    ap.add_argument("--dx", action="store_true",
                    help="time XLA's input-grad (no Pallas dx kernel "
                         "exists); locates the backward-emitter gap")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--dtype", type=str, default="bf16",
                    choices=["bf16", "f32"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..ops.pallas_conv import conv2d_k4s2p1, conv2d_k4s2p1_dw

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    time_op = make_timer()
    rng = np.random.RandomState(0)
    dn = ("NHWC", "HWIO", "NHWC")
    rows = []
    for (n, s, ci, co) in _layers(args.size, args.batch):
        if ci < 8:
            # The 3-channel boundary layer is no Pallas candidate: its
            # contraction is lane-starved whatever the kernel does, and
            # the 3-lane layout explodes Mosaic relayout compile cost
            # (observed: compile-helper OOM-kill). XLA keeps it.
            print(json.dumps({"layer": f"{s}px {ci}->{co}",
                              "skipped": "in_ch < 8"}), flush=True)
            continue
        x = jnp.asarray(rng.rand(n, s, s, ci), dtype)
        w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.05, dtype)
        flops = 2 * n * (s // 2) ** 2 * co * ci * 16

        def xla_conv(h):
            return lax.conv_general_dilated(
                h, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn)

        def pl_conv(h):
            return conv2d_k4s2p1(h, w)

        # Numerics guard before timing (compiled path, real chip).
        err = float(jnp.max(jnp.abs(
            pl_conv(x).astype(jnp.float32) - xla_conv(x).astype(jnp.float32))))
        ref_mag = float(jnp.max(jnp.abs(xla_conv(x).astype(jnp.float32))))
        assert err <= 3e-2 * max(ref_mag, 1.0), (err, ref_mag)

        t_xla = time_op(xla_conv, x)
        t_pl = time_op(pl_conv, x)
        row = {"layer": f"{s}px {ci}->{co}",
               "xla_us": round(t_xla * 1e6, 1),
               "pallas_us": round(t_pl * 1e6, 1),
               "xla_tf": round(flops / t_xla / 1e12, 1),
               "pallas_tf": round(flops / t_pl / 1e12, 1),
               "ratio": round(t_xla / t_pl, 3)}

        if args.fused and co >= 64:
            sc = jnp.asarray(rng.rand(co), jnp.float32)
            of = jnp.asarray(rng.randn(co), jnp.float32)

            def xla_fused(h):
                y = lax.conv_general_dilated(
                    h, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn)
                y = y.astype(jnp.float32) * sc + of
                return jnp.where(y >= 0, y, 0.2 * y).astype(h.dtype)

            def pl_fused(h):
                return conv2d_k4s2p1(h, w, scale=sc, offset=of, act="leaky")

            row["fused_xla_us"] = round(time_op(xla_fused, x) * 1e6, 1)
            row["fused_pallas_us"] = round(time_op(pl_fused, x) * 1e6, 1)
            row["fused_ratio"] = round(
                row["fused_xla_us"] / row["fused_pallas_us"], 3)

        if args.dx:
            dy = jnp.asarray(rng.randn(n, s // 2, s // 2, co), dtype)

            def xla_dx(h):
                # dx of a linear conv is independent of the INPUT — chain
                # through the (tiny) weights instead, else XLA hoists the
                # whole computation out of the timing loop (observed:
                # 1850 "TF/s" > the 197 chip peak).
                w_dep = w * (1 + 1e-30 * jnp.max(h).astype(w.dtype))
                _, vjp = jax.vjp(
                    lambda x_: lax.conv_general_dilated(
                        x_, w_dep, (2, 2), [(1, 1), (1, 1)],
                        dimension_numbers=dn), h)
                return vjp(dy)[0]

            t_dx = time_op(xla_dx, x)
            row["dx_xla_us"] = round(t_dx * 1e6, 1)
            row["dx_xla_tf"] = round(flops / t_dx / 1e12, 1)

        if args.dw:
            dy = jnp.asarray(rng.randn(n, s // 2, s // 2, co), dtype)

            def xla_dw(h):
                _, vjp = jax.vjp(
                    lambda w_: lax.conv_general_dilated(
                        h, w_, (2, 2), [(1, 1), (1, 1)],
                        dimension_numbers=dn), w)
                return vjp(dy)[0]

            def pl_dw(h):
                return conv2d_k4s2p1_dw(h, dy)

            row["dw_xla_us"] = round(time_op(xla_dw, x) * 1e6, 1)
            row["dw_pallas_us"] = round(time_op(pl_dw, x) * 1e6, 1)
            row["dw_ratio"] = round(row["dw_xla_us"] / row["dw_pallas_us"], 3)

        rows.append(row)
        print(json.dumps(row), flush=True)

    wins = [r for r in rows if r["ratio"] > 1.05]
    print(json.dumps({"summary": "pallas_wins",
                      "layers": [r["layer"] for r in wins]}))


if __name__ == "__main__":
    main()
