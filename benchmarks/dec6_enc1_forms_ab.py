"""Round 5 (VERDICT items 2 & 6): XLA-only reformulations for the two
remaining boundary offenders, isolated chains at 512px shapes.

dec6 (convT 128->64 @ 128px in): dw measured 2978 us (itemize r4).
  Hypothesis: the zero-dilated emitter's dw is the binding term; the
  DENSE k2s1 subpixel form's dw is an (M x 512) x (M x 256) contraction
  — fully MXU-shaped (no thin dims) — plus a dy4 deinterleave at 64
  channels (cheap relative to the 3-channel head's). Round 4 only ever
  measured the dense FWD (~par) and whole-program compiles (HTTP 500);
  the dw-only routing was never isolated.

enc1 (conv k4s2 64->128 @ 256px in): fwd 2441 / dx 1440 / dw 2646 us.
  Hypothesis: the k4s2 halo re-read (~2.5x over operand floor) vanishes
  in the s2d form (k3s1 on s2d(2) input, 256 channels) at 2.25x the
  MACs — a win iff the s1 emitter runs >2.25x the MFU of the k4s2 one
  at this shape. The s2d embedding already exists (ops/conv.py
  _conv2d_s2d_stem works for any CI).

Usage: python benchmarks/dec6_enc1_forms_ab.py [rounds]
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from discogan_modernized_tpu.ops.conv import (_conv2d_s2d_stem,
                                              _conv_transpose_subpixel)

DTYPE = jnp.bfloat16
DN = ("NHWC", "HWIO", "NHWC")
B = 32


def convt_dilated(x, w):
    wf = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x, wf, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=DN)


def conv_k4s2(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                    dimension_numbers=DN)


def make_dw_chain(fn, x_shape, w_shape, y_shape):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*x_shape) * 0.05, DTYPE)
    w = jnp.asarray(rng.randn(*w_shape) * 0.05, DTYPE)
    dy = jnp.asarray(rng.randn(*y_shape) * 0.05, DTYPE)

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(x, w, dy, length):
        def body(x, _):
            _, vjp = jax.vjp(lambda w_: fn(x, w_), w)
            dw = vjp(dy)[0]
            return x + (1e-30 * jnp.max(dw.astype(jnp.float32))
                        ).astype(x.dtype), ()
        x, _ = lax.scan(body, x, None, length=length)
        return jnp.sum(x.astype(jnp.float32))

    return chain, (x, w, dy)


def make_mode_chain(fn, mode, x_shape, w_shape):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*x_shape) * 0.05, DTYPE)
    w = jnp.asarray(rng.randn(*w_shape) * 0.05, DTYPE)
    y_shape = jax.eval_shape(fn, x, w)
    dy = jnp.asarray(rng.randn(*y_shape.shape) * 0.05, y_shape.dtype)

    if mode == "fwd":
        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(x, w, length):
            def body(h, _):
                out = fn(h, w)
                return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                            ).astype(h.dtype), ()
            h, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(h.astype(jnp.float32))
        return chain, (x, w)
    if mode == "dx":
        @functools.partial(jax.jit, static_argnums=(3,))
        def chain(x, w, dy, length):
            def body(w, _):
                _, vjp = jax.vjp(lambda x_: fn(x_, w), x)
                dx = vjp(dy)[0]
                return w + (1e-30 * jnp.max(dx.astype(jnp.float32))
                            ).astype(w.dtype), ()
            w, _ = lax.scan(body, w, None, length=length)
            return jnp.sum(w.astype(jnp.float32))
        return chain, (x, w, dy)
    if mode == "dw":
        return make_dw_chain(fn, x_shape, w_shape,
                             jax.eval_shape(fn,
                                            jnp.zeros(x_shape, DTYPE),
                                            jnp.zeros(w_shape, DTYPE)).shape)
    raise ValueError(mode)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # numerics guards (compiled, real chip, small shapes)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 16, 16, 128) * 0.1, DTYPE)
    ws = jnp.asarray(rng.randn(4, 4, 128, 64) * 0.1, DTYPE)
    e1 = float(jnp.max(jnp.abs(
        _conv_transpose_subpixel(xs, ws).astype(jnp.float32)
        - convt_dilated(xs, ws).astype(jnp.float32))))
    xs2 = jnp.asarray(rng.randn(2, 32, 32, 64) * 0.1, DTYPE)
    ws2 = jnp.asarray(rng.randn(4, 4, 64, 128) * 0.1, DTYPE)
    e2 = float(jnp.max(jnp.abs(
        _conv2d_s2d_stem(xs2, ws2).astype(jnp.float32)
        - conv_k4s2(xs2, ws2).astype(jnp.float32))))
    print(f"guards: subpixel-convt {e1:.2e}  s2d-conv {e2:.2e}", flush=True)

    dec6_x, dec6_w = (B, 128, 128, 128), (4, 4, 128, 64)
    enc1_x, enc1_w = (B, 256, 256, 64), (4, 4, 64, 128)
    cases = [
        ("dec6_dw_dilated", make_mode_chain(convt_dilated, "dw", dec6_x, dec6_w)),
        ("dec6_dw_dense", make_mode_chain(_conv_transpose_subpixel, "dw",
                                          dec6_x, dec6_w)),
        ("dec6_dx_dilated", make_mode_chain(convt_dilated, "dx", dec6_x, dec6_w)),
        ("dec6_dx_dense", make_mode_chain(_conv_transpose_subpixel, "dx",
                                          dec6_x, dec6_w)),
        ("enc1_fwd_k4s2", make_mode_chain(conv_k4s2, "fwd", enc1_x, enc1_w)),
        ("enc1_fwd_s2d", make_mode_chain(_conv2d_s2d_stem, "fwd",
                                         enc1_x, enc1_w)),
        ("enc1_dw_k4s2", make_mode_chain(conv_k4s2, "dw", enc1_x, enc1_w)),
        ("enc1_dw_s2d", make_mode_chain(_conv2d_s2d_stem, "dw",
                                        enc1_x, enc1_w)),
        ("enc1_dx_k4s2", make_mode_chain(conv_k4s2, "dx", enc1_x, enc1_w)),
        ("enc1_dx_s2d", make_mode_chain(_conv2d_s2d_stem, "dx",
                                        enc1_x, enc1_w)),
    ]
    n1, n2 = 3, 24
    ready = []
    for name, (chain, args) in cases:
        t0 = time.perf_counter()
        try:
            _ = float(chain(*args, n2)); _ = float(chain(*args, n1))
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
        ready.append((name, chain, args))
    best = {name: float("inf") for name, *_ in ready}
    for r in range(rounds):
        for name, chain, args in ready:
            t0 = time.perf_counter(); _ = float(chain(*args, n2))
            t_long = time.perf_counter() - t0
            t0 = time.perf_counter(); _ = float(chain(*args, n1))
            t_short = time.perf_counter() - t0
            best[name] = min(best[name], (t_long - t_short) / (n2 - n1) * 1e6)
        print(f"round {r}: " + " ".join(f"{k}={v:.0f}" for k, v in best.items()),
              flush=True)
    out = {k: round(v, 1) for k, v in best.items()}
    print(json.dumps(out))
    with open("/root/repo/benchmarks/dec6_enc1_forms_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
