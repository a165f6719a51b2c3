"""Round 5: the Pallas head kernel vs the XLA subpixel path, isolated
chains at the 512px head shape (32, 256, 256, 64) -> (32, 512, 512, 3),
interleaved in one process.

Usage: python benchmarks/head_kernel_ab.py [rounds] [--f32]
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

from discogan_modernized_tpu.ops.conv import _conv_transpose_subpixel
from discogan_modernized_tpu.ops.pallas_head import head_convt_fwd

N, H, W, CI, CO = 32, 256, 256, 64, 3
DTYPE = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16


def make_fwd_chain(fn):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(N, H, W, CI) * 0.05, DTYPE)
    w = jnp.asarray(rng.randn(4, 4, CI, CO) * 0.05, DTYPE)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(x, w, length):
        def body(h, _):
            out = fn(h, w)
            return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                        ).astype(h.dtype), ()
        h, _ = lax.scan(body, x, None, length=length)
        return jnp.sum(h.astype(jnp.float32))

    return chain, (x, w)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    # correctness on-chip first (compiled, not interpret)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 32, 32, CI) * 0.1, DTYPE)
    ws = jnp.asarray(rng.randn(4, 4, CI, CO) * 0.1, DTYPE)
    yr = np.asarray(_conv_transpose_subpixel(xs, ws), np.float32)
    for layout in ("flat6", "kmajor"):
        yk = np.asarray(head_convt_fwd(xs, ws, layout=layout), np.float32)
        err = np.abs(yk - yr).max()
        print(f"compiled correctness [{layout}] maxerr={err:.2e}", flush=True)
        assert err < (3e-2 if DTYPE == jnp.bfloat16 else 1e-4), err

    cases = [
        ("xla_subpixel", make_fwd_chain(_conv_transpose_subpixel)),
        ("pallas_kmajor",
         make_fwd_chain(lambda x, w: head_convt_fwd(x, w, layout="kmajor"))),
        ("pallas_mm_only",
         make_fwd_chain(lambda x, w: head_convt_fwd(
             x, w, layout="kmajor", _stop_after="matmul"))),
        ("pallas_input_only",
         make_fwd_chain(lambda x, w: head_convt_fwd(
             x, w, layout="kmajor", _stop_after="input"))),
        ("pallas_input_nohalo",
         make_fwd_chain(lambda x, w: head_convt_fwd(
             x, w, layout="kmajor", _stop_after="input_nohalo"))),
        ("pallas_read_only",
         make_fwd_chain(lambda x, w: head_convt_fwd(
             x, w, layout="kmajor", _stop_after="read"))),
    ]
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
        print(f"round {r}: " + " ".join(f"{k}={v:.0f}" for k, v in best.items()),
              flush=True)
    out = {k: round(v, 1) for k, v in best.items()}
    for k in best:
        if k.startswith("pallas"):
            out[k + "_over_xla"] = round(best[k] / best["xla_subpixel"], 4)
    print(json.dumps(out))
    with open("/root/repo/benchmarks/head_kernel_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
