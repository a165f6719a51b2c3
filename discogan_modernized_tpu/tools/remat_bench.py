"""Remat-granularity A/B at 512px on the real chip.

Run: python -m discogan_modernized_tpu.tools.remat_bench [--size 512]
    [--batch 32] [--policies full,latent,conv] [--steps 5] [--rounds 4]

Compares jax.checkpoint granularities for the 512px training step
(BASELINE configs[4] geometry): "full" re-runs each network forward in
the backward (~1 extra forward of FLOPs, minimum memory), "conv" saves
every convolution output so the backward recomputes only elementwise
BN/activation chains (no conv recompute, ~bf16 activations resident).

Measurements are interleaved in ONE process (tunnel variance is +-10%,
PERF.md): each round times one fused-scan call per policy, rotating; the
per-policy result is the best round. OOM in a policy is caught and
reported as such rather than killing the comparison.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build(policy_name: str | None, image_size: int, steps: int):
    from ..train import TrainConfig
    from ..train.step import make_scan_train_step

    cfg = TrainConfig(image_size=image_size, model_arch="discogan",
                      remat=True,
                      remat_policy=None if policy_name == "full" else policy_name)
    return cfg, make_scan_train_step(cfg, steps=steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--policies", type=str, default="full,conv")
    ap.add_argument("--steps", type=int, default=5, help="scan steps per call")
    ap.add_argument("--calls", type=int, default=3, help="timed calls per round")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..train import TrainConfig, init_train_state

    policies = args.policies.split(",")
    size, batch, k = args.size, args.batch, args.steps
    n_data = 2 * batch
    rng = np.random.RandomState(0)
    data_A = jnp.asarray(rng.rand(n_data, size, size, 3), jnp.float32)
    data_B = jnp.asarray(rng.rand(n_data, size, size, 3), jnp.float32)

    steps_fns = {}
    for name in policies:
        _, steps_fns[name] = build(name, size, k)

    def one_call(fn, ts, it0):
        ia = jnp.asarray(rng.randint(0, n_data, (k, batch)), jnp.int32)
        ib = jnp.asarray(rng.randint(0, n_data, (k, batch)), jnp.int32)
        ts, losses = fn(ts, data_A, data_B, ia, ib, jnp.int32(it0))
        return ts, losses

    results = {name: [] for name in policies}
    dead = set()
    # Fresh state per policy: donated buffers mean a state consumed by one
    # policy's program can't be reused by another.
    states = {}
    for name in policies:
        cfg = TrainConfig(image_size=size, model_arch="discogan", remat=True,
                          remat_policy=None if name == "full" else name)
        states[name] = init_train_state(jax.random.PRNGKey(0), cfg)

    for rnd in range(args.rounds):
        for name in policies:
            if name in dead:
                continue
            fn = steps_fns[name]
            try:
                # warm (compile on round 0) + sync
                ts, losses = one_call(fn, states[name], 0)
                _ = float(losses["gen_total"][-1])
                t0 = time.perf_counter()
                for c in range(args.calls):
                    ts, losses = one_call(fn, ts, (c + 1) * k)
                _ = float(losses["gen_total"][-1])
                _ = float(jax.tree.leaves(ts["models"]["gen_B"])[0].ravel()[0])
                dt = time.perf_counter() - t0
                states[name] = ts
                ips = batch * k * args.calls / dt
                results[name].append(ips)
                print(f"round {rnd} {name}: {ips:.1f} img/s")
            except Exception as e:  # OOM etc.
                print(f"round {rnd} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                dead.add(name)

    out = {name: (round(max(v), 1) if v else None)
           for name, v in results.items()}
    print(json.dumps({"size": size, "batch": batch, "best_img_per_sec": out}))


if __name__ == "__main__":
    main()
