"""Round 5: decompose the head convT (64->3 @ 256px in, the worst 512px
offender — fwd 3768us / dx 1926 / dw 4952, floors ~400-700us) into its
subpixel-path components, interleaved in one process, to decide where a
hand kernel must intervene.

Variants (fwd):
  full        pad + k2s1 conv to 12ch + class interleave (production path)
  conv_only   pad + k2s1 conv (stop before interleave)
  conv_implicit  k2s1 conv with padding=[(1,1),(1,1)] (no jnp.pad copy)
  interleave  the class interleave alone (from a precomputed out4)
  dilated     XLA's native zero-dilated convT emitter
Variants (dw): vjp of full vs vjp of conv_only (w enters via wbig).
Variants (dx): vjp of full vs vjp of conv_only.

Usage: python benchmarks/head_parts_ab.py [rounds]
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

N, H, W, CI, CO = 32, 256, 256, 64, 3
DTYPE = jnp.bfloat16
DN = ("NHWC", "HWIO", "NHWC")


def wbig_of(w):
    wf = w[::-1, ::-1, :, :]
    return jnp.concatenate(
        [wf[a::2, b::2, :, :] for a in (0, 1) for b in (0, 1)], axis=-1)


def conv_only(x, w, implicit=False):
    wbig = wbig_of(w)
    if implicit:
        return lax.conv_general_dilated(
            x, wbig, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.conv_general_dilated(
        xp, wbig, (1, 1), "VALID", dimension_numbers=DN)


def interleave(out):
    n, h, wd, o = N, H, W, CO
    classes = [out[:, a:h + a, b:wd + b, i * o:(i + 1) * o]
               for i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
    z = jnp.stack(classes, axis=3)
    z = z.reshape(n, h, wd, 2, 2, o)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, 2 * h, 2 * wd, o)


def full(x, w, implicit=False):
    return interleave(conv_only(x, w, implicit))


def dilated(x, w):
    wf = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x, wf, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=DN)


def make_chain(fn, mode, shapes):
    """layer_ab-style chained scan; returns (jitted, args)."""
    rng = np.random.RandomState(1)
    args = [jnp.asarray(rng.randn(*s) * 0.05, DTYPE) for s in shapes]

    if mode == "fwd":
        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(x, w, length):
            def body(h, _):
                out = fn(h, w)
                return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                            ).astype(h.dtype), ()
            h, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(h.astype(jnp.float32))
        return chain, args[:2]

    if mode == "fwd1":  # unary fn(x) chains on x
        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(x, length):
            def body(h, _):
                out = fn(h)
                return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                            ).astype(h.dtype), ()
            h, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(h.astype(jnp.float32))
        return chain, args[:1]

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
        return chain, args

    if mode == "dw":
        @functools.partial(jax.jit, static_argnums=(3,))
        def chain(x, w, dy, length):
            def body(x, _):
                _, vjp = jax.vjp(lambda w_: fn(x, w_), w)
                dw = vjp(dy)[0]
                return x + (1e-30 * jnp.max(dw.astype(jnp.float32))
                            ).astype(x.dtype), ()
            x, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(x.astype(jnp.float32))
        return chain, args
    raise ValueError(mode)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    x_s = (N, H, W, CI)
    w_s = (4, 4, CI, CO)
    y_s = (N, 2 * H, 2 * W, CO)
    o4_s = (N, H + 1, W + 1, 4 * CO)

    cases = [
        ("fwd_full", make_chain(full, "fwd", [x_s, w_s])),
        ("fwd_conv_only", make_chain(conv_only, "fwd", [x_s, w_s])),
        ("fwd_conv_implicit",
         make_chain(lambda x, w: conv_only(x, w, True), "fwd", [x_s, w_s])),
        ("fwd_full_implicit",
         make_chain(lambda x, w: full(x, w, True), "fwd", [x_s, w_s])),
        ("fwd_interleave", make_chain(interleave, "fwd1", [o4_s])),
        ("fwd_dilated", make_chain(dilated, "fwd", [x_s, w_s])),
        ("dx_full", make_chain(full, "dx", [x_s, w_s, y_s])),
        ("dx_conv_only", make_chain(conv_only, "dx", [x_s, w_s, o4_s])),
        ("dw_full", make_chain(full, "dw", [x_s, w_s, y_s])),
        ("dw_conv_only", make_chain(conv_only, "dw", [x_s, w_s, o4_s])),
    ]
    # window like layer_ab at 512-shapes
    n1, n2 = 3, 24
    ready = []
    for name, (chain, args) in cases:
        t0 = time.perf_counter()
        _ = float(chain(*args, n2))
        _ = float(chain(*args, n1))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
        ready.append((name, chain, args))
    best = {name: float("inf") for name, *_ in ready}
    for r in range(rounds):
        for name, chain, args in ready:
            t0 = time.perf_counter()
            _ = float(chain(*args, n2))
            t_long = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(chain(*args, n1))
            t_short = time.perf_counter() - t0
            us = (t_long - t_short) / (n2 - n1) * 1e6
            best[name] = min(best[name], us)
        print(f"round {r}: " + " ".join(
            f"{k}={v:.0f}" for k, v in best.items()), flush=True)
    out = {k: round(v, 1) for k, v in best.items()}
    print(json.dumps(out))
    with open("/root/repo/benchmarks/head_parts_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
