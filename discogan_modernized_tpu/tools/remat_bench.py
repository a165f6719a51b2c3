"""Remat-granularity A/B at 512px on the real chip.

Run: python -m discogan_modernized_tpu.tools.remat_bench [--size 512]
    [--batch 32] [--policies full,latent,conv] [--steps 12] [--rounds 4]

Compares jax.checkpoint granularities for the 512px training step
(BASELINE configs[4] geometry): "full" re-runs each network forward in
the backward (~1 extra forward of FLOPs, minimum memory), "conv" saves
every convolution output so the backward recomputes only elementwise
BN/activation chains (no conv recompute, ~bf16 activations resident).

Measurement uses the per-step two-program path (the 512px b32 fused-scan
program exceeds the dev backend's compile-helper limits — PERF.md) with
the production 2:1 G/D alternation; dispatches pipeline, one
chain-dependent scalar D2H syncs each timed block. Policies are
interleaved round-robin in ONE process (tunnel variance is +-10%,
PERF.md); the per-policy result is the best round. OOM/compile failure
in a policy is caught and reported rather than killing the comparison.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--policies", type=str, default="full,conv")
    ap.add_argument("--steps", type=int, default=12,
                    help="train iterations per timed block")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..train import TrainConfig, init_train_state, make_train_steps

    policies = args.policies.split(",")
    size, batch = args.size, args.batch
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32)
    B = jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32)

    cfgs, steps_fns = {}, {}
    for name in policies:
        cfg = TrainConfig(image_size=size, model_arch="discogan", remat=True,
                          remat_policy=None if name == "full" else name)
        cfgs[name] = cfg
        steps_fns[name] = make_train_steps(cfg)

    def run_block(name, ts, it0):
        cfg = cfgs[name]
        gen_step, dis_step = steps_fns[name]
        losses = None
        for j in range(it0, it0 + args.steps):
            step = dis_step if cfg.is_dis_iter(j) else gen_step
            ts, losses = step(ts, A, B, jnp.float32(cfg.rate_for(j)))
        _ = float(losses["gen_total"])
        _ = float(jax.tree.leaves(ts["models"]["gen_B"])[0].ravel()[0])
        return ts

    results = {name: [] for name in policies}
    dead = set()
    for rnd in range(args.rounds):
        for name in policies:
            if name in dead:
                continue
            # One train state at a time: a 512px state is ~8GB of HBM
            # (params + Adam moments for 4 networks); co-residing one per
            # policy exhausts the chip. The jit caches keep each policy's
            # compiled programs warm across rounds. init itself is inside
            # the try — after another policy's OOM, the allocation is the
            # likeliest failure site and must not kill the comparison.
            ts = None
            try:
                ts = init_train_state(jax.random.PRNGKey(0), cfgs[name])
                ts = run_block(name, ts, 0)  # warm (compile rnd 0) + settle
                t0 = time.perf_counter()
                ts = run_block(name, ts, args.steps)
                dt = time.perf_counter() - t0
                ips = batch * args.steps / dt
                results[name].append(ips)
                print(f"round {rnd} {name}: {ips:.1f} img/s "
                      f"({dt / args.steps * 1e3:.1f} ms/step)", flush=True)
            except Exception as e:  # OOM / compile failure
                print(f"round {rnd} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                dead.add(name)
            del ts

    out = {name: (round(max(v), 1) if v else None)
           for name, v in results.items()}
    print(json.dumps({"size": size, "batch": batch, "best_img_per_sec": out}))


if __name__ == "__main__":
    main()
