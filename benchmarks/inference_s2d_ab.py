"""VERDICT r4 item 4: did the round-4 s2d stem adoption regress 512px
inference p50 (2.078 -> 2.391 ms in the matrix refresh), or was that
transport noise?

Interleaved A/B in ONE process: the same chained-scan differencing
bench.measure_inference_p50 uses (per-image on-chip ms at 512px, b=1),
with the generator forward traced once under DISCOGAN_S2D_STEM=0 and
once under =1 (the auto gate fires at 512px — ops/conv.py). The env var
is read at trace time, so two jitted chains coexist in one process.

Usage: python benchmarks/inference_s2d_ab.py [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from discogan_modernized_tpu.core.precision import default_policy
from discogan_modernized_tpu.models import generator_init, generator_apply

SIZE = 512
N1, N2 = 10, 110


def build_chain(s2d: str):
    os.environ["DISCOGAN_S2D_STEM"] = s2d
    policy = default_policy()
    params, state = generator_init(jax.random.PRNGKey(0), SIZE)

    def chain_fn(params, state, x, length):
        def body(h, _):
            y, _ = generator_apply(params, state, h, policy=policy,
                                   training=False)
            return y, ()
        y, _ = lax.scan(body, x, None, length=length)
        return y

    import functools
    jitted = jax.jit(functools.partial(chain_fn), static_argnums=(3,))
    x = jnp.asarray(np.random.RandomState(0).rand(1, SIZE, SIZE, 3),
                    jnp.float32)
    # trace/compile both lengths NOW, while the env var is set
    for n in (N1, N2):
        _ = float(jitted(params, state, x, n)[0, 0, 0, 0])
    os.environ["DISCOGAN_S2D_STEM"] = "auto"
    return jitted, params, state, x


def timed(jitted, params, state, x, length, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jitted(params, state, x, length)[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def per_image_ms(arm):
    jitted, params, state, x = arm
    return (timed(jitted, params, state, x, N2)
            - timed(jitted, params, state, x, N1)) / (N2 - N1) * 1000


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("building s2d=0 arm...", flush=True)
    arm_off = build_chain("0")
    print("building s2d=1 arm...", flush=True)
    arm_on = build_chain("1")
    res = {"off": [], "on": []}
    for r in range(rounds):
        res["off"].append(per_image_ms(arm_off))
        res["on"].append(per_image_ms(arm_on))
        print(f"round {r}: off={res['off'][-1]:.3f} ms  "
              f"on={res['on'][-1]:.3f} ms", flush=True)
    best_off, best_on = min(res["off"]), min(res["on"])
    out = {"size": SIZE, "rounds": rounds, "off_ms": res["off"],
           "on_ms": res["on"], "best_off_ms": best_off,
           "best_on_ms": best_on, "on_over_off": best_on / best_off}
    print(json.dumps(out))
    with open("/root/repo/benchmarks/inference_s2d_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
