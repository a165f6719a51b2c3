"""Round 5 (VERDICT item 2): the round-2 blocked Pallas conv at the
enc1/dis1 shape (32, 256, 256, 64) -> 128, now that the scoped-VMEM
limit is lifted (the round-4 record said the tb=1 input block needs
42.3 MB against a 16 MB limit — that limit was Mosaic's default, not
the hardware's 128 MB; ops/pallas_conv.py now passes vmem_limit_bytes).

Interleaved chains: XLA conv emitter vs conv2d_k4s2p1, fwd and dw.

Usage: python benchmarks/enc1_kernel_ab.py [rounds]
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

from discogan_modernized_tpu.ops.pallas_conv import (conv2d_k4s2p1,
                                                     conv2d_k4s2p1_dw)
from discogan_modernized_tpu.ops.pallas_halo_conv import (
    halo_conv2d_k4s2p1, halo_conv2d_k4s2p1_dw)

N, S, CI, CO = 32, 256, 64, 128
DTYPE = jnp.bfloat16
DN = ("NHWC", "HWIO", "NHWC")


def xla_conv(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                    dimension_numbers=DN)


def xla_dw(x, w, dy):
    _, vjp = jax.vjp(lambda w_: xla_conv(x, w_), w)
    return vjp(dy)[0]


def pl_dw(x, dy):
    return conv2d_k4s2p1_dw(x, dy)


def make_chain(fn, arity):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(N, S, S, CI) * 0.05, DTYPE)
    w = jnp.asarray(rng.randn(4, 4, CI, CO) * 0.05, DTYPE)
    dy = jnp.asarray(rng.randn(N, S // 2, S // 2, CO) * 0.05, DTYPE)

    if arity == "fwd":
        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(x, w, length):
            def body(h, _):
                out = fn(h, w)
                return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                            ).astype(h.dtype), ()
            h, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(h.astype(jnp.float32))
        return chain, (x, w)

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(x, w, dy, length):
        def body(x, _):
            dw = fn(x, w, dy)
            return x + (1e-30 * jnp.max(dw.astype(jnp.float32))
                        ).astype(x.dtype), ()
        x, _ = lax.scan(body, x, None, length=length)
        return jnp.sum(x.astype(jnp.float32))
    return chain, (x, w, dy)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 64, 64, CI) * 0.1, DTYPE)
    ws = jnp.asarray(rng.randn(4, 4, CI, CO) * 0.1, DTYPE)
    err = float(jnp.max(jnp.abs(conv2d_k4s2p1(xs, ws).astype(jnp.float32)
                                - xla_conv(xs, ws).astype(jnp.float32))))
    print(f"compiled correctness maxerr={err:.2e}", flush=True)

    errh = float(jnp.max(jnp.abs(
        halo_conv2d_k4s2p1(xs, ws).astype(jnp.float32)
        - xla_conv(xs, ws).astype(jnp.float32))))
    print(f"halo compiled correctness maxerr={errh:.2e}", flush=True)

    cases = [
        ("xla_fwd", make_chain(xla_conv, "fwd")),
        ("halo_fwd", make_chain(halo_conv2d_k4s2p1, "fwd")),
        ("xla_dw", make_chain(xla_dw, "dw")),
        ("halo_dw",
         make_chain(lambda x, w, dy: halo_conv2d_k4s2p1_dw(x, dy), "dw")),
    ]
    n1, n2 = 3, 24
    ready = []
    for name, (chain, args) in cases:
        t0 = time.perf_counter()
        try:
            _ = float(chain(*args, n2)); _ = float(chain(*args, n1))
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
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
    with open("/root/repo/benchmarks/enc1_kernel_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
