"""Interleaved A/B of the train step under two env-var settings.

Run: python -m discogan_modernized_tpu.tools.env_ab --var DISCOGAN_SUBPIXEL_DX
    [--size 64] [--batch 64] [--steps 16] [--rounds 6] [--values 1,0]

Trace-time env switches (DISCOGAN_SUBPIXEL, DISCOGAN_SUBPIXEL_DX,
DISCOGAN_PALLAS_BN, ...) select between numerically-equivalent lowerings;
this tool compiles one fused-scan program per value of --var, then times
them round-robin in ONE process (tunnel variance is +-10%, PERF.md — the
only trustworthy comparison is interleaved). Reports best-round img/s per
value and the ratio.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--var", type=str, default=None,
                    help="env var to flip (trace-time lowering switches)")
    ap.add_argument("--field", type=str, default=None,
                    help="TrainConfig field to flip instead of an env var "
                         "(e.g. lean_dis, paired); values are parsed as "
                         "true/false/int/str")
    ap.add_argument("--copt", type=str, default=None,
                    help="XLA compiler option to flip instead (jax.jit "
                         "compiler_options — rides the compile request, so "
                         "it works through remote-compile backends where "
                         "host XLA_FLAGS would not), e.g. "
                         "xla_tpu_scoped_vmem_limit_kib; the value "
                         "'default' means no override")
    ap.add_argument("--values", type=str, default="1,0")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16, help="scan steps per call")
    ap.add_argument("--calls", type=int, default=4, help="timed calls per round")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--fix", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="pin a TrainConfig field for BOTH variants "
                         "(repeatable), e.g. --fix remat=false while "
                         "flipping --var DISCOGAN_SLIM_STATE")
    ap.add_argument("--per_step", action="store_true",
                    help="use the two-program per-step path instead of the "
                         "fused scan (required at shapes where the scan "
                         "program exceeds the backend's compile limits, "
                         "e.g. 512px b32 — PERF.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..train import TrainConfig, init_train_state
    from ..train.step import make_scan_train_step

    n_modes = sum(x is not None for x in (args.var, args.field, args.copt))
    if n_modes != 1:
        ap.error("exactly one of --var / --field / --copt is required")

    def parse_val(s):
        if s in ("true", "false"):
            return s == "true"
        try:
            return int(s)
        except ValueError:
            return s

    values = args.values.split(",")
    size, batch, k = args.size, args.batch, args.steps
    fixed = {}
    for f in args.fix:
        name, _, val = f.partition("=")
        fixed[name] = parse_val(val)
    cfg = dataclasses.replace(
        TrainConfig(image_size=size, model_arch="discogan"), **fixed)
    cfgs = {v: (cfg if args.field is None
                else dataclasses.replace(cfg, **{args.field: parse_val(v)}))
            for v in values}
    n_data = 2 * batch
    rng = np.random.RandomState(0)
    data_A = jnp.asarray(rng.rand(n_data, size, size, 3), jnp.float32)
    data_B = jnp.asarray(rng.rand(n_data, size, size, 3), jnp.float32)

    from ..train.step import make_train_steps

    # One resident train state at 512px is ~9GB (params + Adam for 4
    # nets); keeping one per variant exhausts the chip — re-init per
    # round there (jit caches keep the compiled programs warm).
    fresh_state = size >= 256
    label = args.var or args.field or args.copt
    orig = os.environ.get(args.var) if args.var else None

    def copts(v):
        # Layer the swept option over the DISCOGAN_XLA_COPTS base so a
        # sweep can stack on an adopted option (e.g. flip rwb_fusion while
        # keeping the measured scoped-vmem win); "default" means base-only.
        # Passing None (not {}) keeps make_*'s own env fallback in charge.
        if args.copt is None or v == "default":
            return None
        from ..train.step import env_compiler_options

        base = env_compiler_options() or {}
        base[args.copt] = v
        return base

    fns, states = {}, {}
    for v in values:
        if args.var:
            os.environ[args.var] = v
        # Tracing happens at first call; force it now while the env value
        # is pinned by warming each program below under its own value.
        if args.per_step:
            gen_s, dis_s = make_train_steps(cfgs[v],
                                            compiler_options=copts(v))
            if cfgs[v].lean_dis:
                from ..train.step import make_lean_dis_step

                # Mirror the trainer: lean program on non-logged D iters.
                dis_s = (dis_s, make_lean_dis_step(
                    cfgs[v], compiler_options=copts(v)))
            fns[v] = (gen_s, dis_s)
        else:
            fns[v] = make_scan_train_step(cfgs[v], steps=k,
                                          compiler_options=copts(v))
        if not fresh_state:
            states[v] = init_train_state(jax.random.PRNGKey(0), cfgs[v])

    def one_call(v, ts, it0):
        if args.per_step:
            gen_step, dis_step = fns[v]
            A = jnp.take(data_A, jnp.asarray(
                rng.randint(0, n_data, (batch,)), jnp.int32), axis=0)
            B = jnp.take(data_B, jnp.asarray(
                rng.randint(0, n_data, (batch,)), jnp.int32), axis=0)
            losses = None
            c = cfgs[v]
            for j in range(it0, it0 + k):
                if c.is_dis_iter(j):
                    if isinstance(dis_step, tuple):  # (full, lean)
                        step = (dis_step[1] if c.use_lean_dis(j)
                                else dis_step[0])
                    else:
                        step = dis_step
                else:
                    step = gen_step
                ts, losses = step(ts, A, B, jnp.float32(c.rate_for(j)))
            return ts, {kk: vv[None] for kk, vv in losses.items()}
        ia = jnp.asarray(rng.randint(0, n_data, (k, batch)), jnp.int32)
        ib = jnp.asarray(rng.randint(0, n_data, (k, batch)), jnp.int32)
        ts, losses = fns[v](ts, data_A, data_B, ia, ib, jnp.int32(it0))
        return ts, losses

    # Warm/compile each variant under its env value. A variant that
    # OOMs or fails to compile is marked dead and reported as null
    # instead of killing the comparison (e.g. probing a batch size past
    # the HBM boundary).
    dead = set()
    for v in values:
        if args.var:
            os.environ[args.var] = v
        ts = None
        try:
            ts = init_train_state(jax.random.PRNGKey(0), cfgs[v]) if \
                fresh_state else states[v]
            ts, losses = one_call(v, ts, 0)
            _ = float(losses["gen_total"][-1])
            if fresh_state:
                del ts
            else:
                states[v] = ts
        except Exception as e:
            print(f"warm {label}={v}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            dead.add(v)
            del ts
    results = {v: [] for v in values}
    for rnd in range(args.rounds):
        for v in values:
            if v in dead:
                continue
            # Keep the env pinned to the variant during its round too:
            # some vars (DISCOGAN_SLIM_STATE) are read at RUNTIME by
            # init_train_state, not only at trace time — without this the
            # fresh-state path would silently rebuild the off-variant
            # state and recompile.
            if args.var:
                os.environ[args.var] = v
            ts = None
            try:
                if fresh_state:
                    ts = init_train_state(jax.random.PRNGKey(0), cfgs[v])
                    ts, losses = one_call(v, ts, 0)  # settle (no compile)
                    _ = float(losses["gen_total"][-1])
                else:
                    ts = states[v]
                t0 = time.perf_counter()
                for c in range(args.calls):
                    ts, losses = one_call(v, ts,
                                          (rnd * args.calls + c + 1) * k)
                _ = float(losses["gen_total"][-1])
                _ = float(jax.tree.leaves(ts["models"]["gen_B"])[0]
                          .ravel()[0])
                dt = time.perf_counter() - t0
                ips = batch * k * args.calls / dt
                if fresh_state:
                    del ts
                else:
                    states[v] = ts
                results[v].append(ips)
                print(f"round {rnd} {label}={v}: {ips:.1f} img/s",
                      flush=True)
            except Exception as e:
                print(f"round {rnd} {label}={v}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                dead.add(v)
                del ts

    if args.var:
        if orig is None:
            os.environ.pop(args.var, None)
        else:
            os.environ[args.var] = orig

    best = {v: (round(max(r), 1) if r else None)
            for v, r in results.items()}
    out = {"var": label, "size": size, "batch": batch, "best": best}
    if len(values) == 2 and all(best[v] for v in values):
        a, b = values
        out["ratio"] = round(best[a] / best[b], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
