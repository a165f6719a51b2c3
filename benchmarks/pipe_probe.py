"""Probe the Pallas block-pipeline read bandwidth at the head-kernel
input shape (32, 256, 256, 64) bf16 = 268 MB, under different block
geometries. Determines whether the 2.4 ms read cost (head_kernel_ab
round 5) is lane-width (64 of 128) or per-grid-step overhead.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N, H, W, CI = 32, 256, 256, 64
DTYPE = jnp.bfloat16


def make_reader(shape, block):
    """Kernel that reads blocks and writes a scalar-ish reduction."""
    grid = tuple(s // b for s, b in zip(shape, block))

    def kernel(x_ref, y_ref):
        y_ref[...] = jnp.full((1, 128), jnp.max(x_ref[...].astype(jnp.float32)),
                              jnp.float32)

    nblocks = int(np.prod(grid))

    def f(x):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(block, lambda *g: g,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda *g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x.reshape(shape))
        return out[0, 0]

    return f


def chain_of(f, shape):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape) * 0.05, DTYPE)

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, length):
        def body(h, _):
            return h + (1e-30 * f(h)).astype(h.dtype), ()
        h, _ = lax.scan(body, x, None, length=length)
        return jnp.sum(h.astype(jnp.float32))

    return chain, x


CASES = {
    # (logical shape for the reader, block)
    "4d_th32_lane64": ((N, H, W, CI), (1, 32, W, CI)),
    "4d_th128_lane64": ((N, H, W, CI), (1, 128, W, CI)),
    "4d_th32_lane128": ((N, H, W // 2, 2 * CI), (1, 32, W // 2, 2 * CI)),
    "4d_th128_lane128": ((N, H, W // 2, 2 * CI), (1, 128, W // 2, 2 * CI)),
    "3d_th32_flat": ((N, H, W * CI), (1, 32, W * CI)),
    "3d_th128_flat": ((N, H, W * CI), (1, 128, W * CI)),
}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n1, n2 = 3, 24
    ready = []
    for name, (shape, block) in CASES.items():
        f = make_reader(shape, block)
        chain, x = chain_of(f, shape)
        t0 = time.perf_counter()
        _ = float(chain(x, n2)); _ = float(chain(x, n1))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
        ready.append((name, chain, x))
    best = {name: float("inf") for name, *_ in ready}
    for r in range(rounds):
        for name, chain, x in ready:
            t0 = time.perf_counter(); _ = float(chain(x, n2))
            t_long = time.perf_counter() - t0
            t0 = time.perf_counter(); _ = float(chain(x, n1))
            t_short = time.perf_counter() - t0
            best[name] = min(best[name],
                             (t_long - t_short) / (n2 - n1) * 1e6)
        print(f"round {r}: " + " ".join(f"{k}={v:.0f}" for k, v in best.items()),
              flush=True)
    gb = N * H * W * CI * 2 / 1e9
    out = {k: {"us": round(v, 1), "GB_s": round(gb / (v * 1e-6), 1)}
           for k, v in best.items()}
    print(json.dumps(out))
    with open("/root/repo/benchmarks/pipe_probe.json", "w") as fo:
        json.dump(out, fo, indent=1)


if __name__ == "__main__":
    main()
