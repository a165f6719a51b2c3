"""Per-layer forward-pass profiler (chained-scan differencing).

The tunnel backend yields empty jax.profiler traces (PERF.md), so this
tool measures layer costs the only trustworthy way on this host: each
layer (conv [+ BN + activation]) is run N times inside one jitted
lax.scan with a synthetic dependency between iterations (x + tiny*sum(y)
— forces sequential execution without changing the math measurably), and
the per-iteration time comes from differencing two chain lengths so
constant dispatch/sync overhead cancels.

Reports per layer: measured time, conv FLOPs, HBM bytes (read input +
weights, write output), the compute/bandwidth rooflines, and achieved
efficiency vs the binding roofline. Run on the real chip:

    python -m discogan_modernized_tpu.tools.fwd_profile --image_size=64 --batch=64
"""

from __future__ import annotations

import argparse
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16
V5E_HBM_BW = 819e9       # bytes/s


def conv_out(size, k=4, s=2, p=1):
    return (size + 2 * p - k) // s + 1


def layer_table(image_size: int):
    """(name, in_size, in_ch, out_ch, stride, padding, bn) per generator
    encoder layer + latent; decoder mirrors (convT costs ~= mirrored conv)."""
    from ..models.geometry import encoder_channels, LATENT_CH

    chans = encoder_channels(image_size)
    rows = []
    size, cin = image_size, 3
    for i, c in enumerate(chans):
        rows.append((f"enc{i} {size}px {cin}->{c}", size, cin, c, 2, 1, i > 0))
        size = conv_out(size)
        cin = c
    rows.append((f"latent {size}px {cin}->{LATENT_CH}", size, cin, LATENT_CH,
                 1, 0, True))
    return rows


def time_layer(batch, in_size, cin, cout, stride, padding, bn, *,
               policy, n1=30, n2=230, reps=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.conv import conv2d, conv_init
    from ..ops.batchnorm import batchnorm_init, batchnorm_apply
    from ..ops.activations import leaky_relu

    key = jax.random.PRNGKey(0)
    w = conv_init(key, cin, cout, 4)
    bn_params, bn_state = batchnorm_init(cout) if bn else (None, None)
    # Carry the chain in the COMPUTE dtype: an f32 carry would double the
    # conv's input HBM bytes vs the bpe-based roofline model (and vs the
    # production network, whose activations are bf16) — bandwidth-bound
    # layers would read up to ~2x slower than modeled.
    x = jnp.asarray(np.random.RandomState(0).rand(batch, in_size, in_size, cin),
                    policy.compute_dtype)

    def one(x):
        h = conv2d(x.astype(policy.compute_dtype), w, stride=stride,
                   padding=padding, policy=policy)
        if bn:
            h, _ = batchnorm_apply(bn_params, bn_state, h, training=True,
                                   out_dtype=policy.compute_dtype)
        return leaky_relu(h, 0.2)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, length):
        def body(h, _):
            y = one(h)
            # dependency: negligible numeric effect, real ordering edge
            return h + (1e-30 * jnp.sum(y)).astype(h.dtype), ()

        h, _ = lax.scan(body, x, None, length=length)
        return jnp.sum(h)

    def timed(length):
        _ = float(chain(x, length))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(chain(x, length))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n2) - timed(n1)) / (n2 - n1)


def profile(image_size: int, batch: int, precision=None):
    from ..core.precision import default_policy

    policy = default_policy(precision)
    bpe = 2 if policy.compute_dtype.__name__ == "bfloat16" else 4
    rows = []
    for name, in_size, cin, cout, stride, padding, bn in layer_table(image_size):
        t = time_layer(batch, in_size, cin, cout, stride, padding, bn,
                       policy=policy)
        out_size = conv_out(in_size, s=stride, p=padding)
        flops = 2 * batch * out_size * out_size * cout * cin * 16
        bytes_ = bpe * (batch * in_size * in_size * cin      # read x
                        + 16 * cin * cout                    # read w
                        + 2 * batch * out_size * out_size * cout)  # rw y
        t_flops = flops / V5E_PEAK_FLOPS
        t_bw = bytes_ / V5E_HBM_BW
        bound = "compute" if t_flops > t_bw else "bandwidth"
        eff = max(t_flops, t_bw) / t
        rows.append({
            "layer": name, "ms": t * 1e3, "gflops": flops / 1e9,
            "mbytes": bytes_ / 1e6, "roofline_ms": max(t_flops, t_bw) * 1e3,
            "bound": bound, "efficiency": eff,
        })
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--precision", type=str, default=None)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rows = profile(args.image_size, args.batch, args.precision)
    total = sum(r["ms"] for r in rows)
    print(f"{'layer':30s} {'ms':>8s} {'roof ms':>8s} {'bound':>9s} "
          f"{'eff':>6s} {'GF':>8s} {'MB':>8s}")
    for r in rows:
        print(f"{r['layer']:30s} {r['ms']:8.3f} {r['roofline_ms']:8.3f} "
              f"{r['bound']:>9s} {r['efficiency']:6.1%} {r['gflops']:8.2f} "
              f"{r['mbytes']:8.1f}")
    print(f"{'TOTAL (encoder+latent)':30s} {total:8.3f} ms")
    return rows


if __name__ == "__main__":
    main()
