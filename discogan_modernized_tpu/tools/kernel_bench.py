"""Kernel microbenchmarks on the real chip: Pallas fused BN vs XLA.

Run: python -m discogan_modernized_tpu.tools.kernel_bench
Prints per-shape timings for (a) the XLA batchnorm_apply + activation
path and (b) the Pallas fused kernels, at the activation shapes the
generator actually produces at 64px and 512px. D2H fetches force real
completion (block_until_ready is unreliable through remote tunnels).
"""

from __future__ import annotations

import time

import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


CHAIN = 100


def bench(step_fn, x, iters=3):
    """Time CHAIN chained applications inside ONE jitted dispatch.

    Per-dispatch tunnel latency (~15ms through the axon relay) dwarfs
    kernel runtimes, so each measurement is a single dispatch of a
    lax.scan chain; D2H of the final value forces completion.
    """
    import jax
    from jax import lax

    @jax.jit
    def chained(x):
        def body(h, _):
            return step_fn(h), None

        out, _ = lax.scan(body, x, None, length=CHAIN)
        # Reduce on-device: the sync fetch must be a chain-dependent
        # SCALAR — pulling the whole output through the tunnel costs
        # ~100ms/MB (CLAUDE.md) and would dwarf the kernels under test.
        import jax.numpy as jnp

        return jnp.sum(out.astype(jnp.float32))

    _sync(chained(x))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from discogan_modernized_tpu.ops import pallas_fused as pf
    from discogan_modernized_tpu.ops.batchnorm import batchnorm_apply

    rng = np.random.RandomState(0)
    # (N, H, W, C): generator activation shapes at 64px b64 and 512px b32.
    shapes = [
        (64, 32, 32, 64),
        (64, 8, 8, 256),
        (32, 256, 256, 64),
        (32, 32, 32, 1024),
    ]
    for shape in shapes:
        x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
        c = shape[-1]
        params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
                 "count": jnp.zeros((), jnp.int32)}

        def xla_train(x):
            y, st = batchnorm_apply(params, state, x, training=True)
            return jnp.where(y >= 0, y, y * 0.2).astype(x.dtype)

        def pallas_train(x):
            mean, var = pf.batch_stats(x)
            return pf.fused_batchnorm_act(
                x, mean, var, params["scale"], params["bias"],
                act="leaky_relu", out_dtype=x.dtype)

        t_xla = bench(xla_train, x)
        try:
            t_pal = bench(pallas_train, x)
        except Exception as e:  # noqa: BLE001
            t_pal = None
            err = str(e).splitlines()[0][:80]
        bytes_rw = np.prod(shape) * 2 * 2  # read + write bf16
        gb_s = bytes_rw / t_xla / 1e9
        line = (f"{str(shape):24s} xla {t_xla * 1e6:8.1f} us ({gb_s:6.1f} GB/s)")
        if t_pal is not None:
            line += f"   pallas {t_pal * 1e6:8.1f} us ({t_xla / t_pal:4.2f}x)"
        else:
            line += f"   pallas FAILED: {err}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
