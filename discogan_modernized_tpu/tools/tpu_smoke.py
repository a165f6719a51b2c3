"""On-chip smoke gate: fast compiled-numerics checks on the REAL backend.

The test suite runs on CPU (1e-3 fidelity gates need f32) and the Pallas
kernels interpret-only; between bench runs a compiled-path regression on
the actual TPU would ship silently (round-2 verdict). This gate runs the
compiled surfaces end-to-end on whatever backend is live, in about a
minute warm (compiles are served by the persistent cache):

  1. transport probe   — a chained scalar round-trip with a hard deadline
                         (the dev tunnel can hang in C where signals never
                         fire; only a watchdog thread + os._exit escapes),
  2. pallas kernels    — compiled-mode numerics vs the XLA reference
                         (bench.pallas_selfcheck),
  3. train-step gate   — iter-0 losses at 16px must be finite, land in the
                         structural golden ranges (tests/test_goldens.py),
                         and be bit-deterministic across two runs,
  4. production scan   — one fused multi-step chunk at 64px through the
                         trainer's own planner (train/step.py), losses
                         finite and parameters actually updated.

Run: python -m discogan_modernized_tpu.tools.tpu_smoke
Exit 0 = all stages pass; 1 = a stage failed; 2 = backend unreachable.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np


def _watchdog(deadline_s: float):
    """os._exit escape hatch for a wedged tunnel (signals never fire when
    the process is blocked in C inside the backend)."""

    def fire():
        print(f"# tpu_smoke: watchdog deadline ({deadline_s:.0f}s) hit — "
              f"backend unresponsive", file=sys.stderr, flush=True)
        os._exit(2)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()
    return t


def stage_probe():
    import jax
    import jax.numpy as jnp

    v = float(jnp.add(jnp.ones(()), 1.0))
    assert v == 2.0, v
    return f"backend={jax.default_backend()} devices={len(jax.devices())}"


def stage_pallas():
    import bench

    return bench.pallas_selfcheck()


def stage_train_step():
    import jax
    import jax.numpy as jnp

    from ..train import TrainConfig, init_train_state, make_train_steps

    def first_losses():
        cfg = TrainConfig(image_size=16)  # default policy: bf16 on TPU
        ts = init_train_state(jax.random.PRNGKey(1234), cfg)
        rng = np.random.RandomState(42)
        A = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
        B = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
        _, dis_step = make_train_steps(cfg)
        _, losses = dis_step(ts, A, B, jnp.float32(0.01))
        return {k: float(v) for k, v in losses.items()}

    losses = first_losses()
    for k, v in losses.items():
        if not np.isfinite(v):
            raise AssertionError(f"non-finite iter-0 loss {k}={v}")
    # Structural golden ranges (tests/test_goldens.py): fresh sigmoid
    # probabilities give BCE near log(2); recon of random images ~ 1/6.
    assert 0.2 < losses["dis_A"] < 2.0, losses
    assert 0.2 < losses["dis_B"] < 2.0, losses
    assert 0.01 < losses["recon_A"] < 0.5, losses
    again = first_losses()
    drift = {k: v for k, v in losses.items() if again[k] != v}
    if drift:
        raise AssertionError(f"nondeterministic compiled step: {drift}")
    return f"dis_A={losses['dis_A']:.4f} recon_A={losses['recon_A']:.4f}"


def stage_scan_chunk(batch: int = 8, image_size: int = 64):
    import jax
    import jax.numpy as jnp

    from ..train import TrainConfig, init_train_state
    from ..train.step import make_scan_train_step, scan_variant

    cfg = TrainConfig(image_size=image_size, lean_dis=True, slim_state="mv")
    steps = 2 * cfg.update_interval  # two whole G/D periods
    variant = scan_variant(cfg, 0, steps)
    prog = make_scan_train_step(cfg, steps=steps, variant=variant)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n_data = 4 * batch
    dA = jnp.asarray(rng.rand(n_data, image_size, image_size, 3), jnp.float32)
    dB = jnp.asarray(rng.rand(n_data, image_size, image_size, 3), jnp.float32)
    ia = jnp.asarray(rng.randint(0, n_data, (steps, batch)), jnp.int32)
    ib = jnp.asarray(rng.randint(0, n_data, (steps, batch)), jnp.int32)
    leaf0 = float(jax.tree.leaves(ts["models"]["gen_B"])[0].ravel()[0])
    ts2, losses = prog(ts, dA, dB, ia, ib, jnp.int32(0))
    g = float(losses["gen_total"][-1])
    if not np.isfinite(g):
        raise AssertionError(f"non-finite gen_total after scan chunk: {g}")
    leaf1 = float(jax.tree.leaves(ts2["models"]["gen_B"])[0].ravel()[0])
    if leaf0 == leaf1:
        raise AssertionError("scan chunk did not update parameters")
    return f"variant={variant} gen_total[-1]={g:.4f}"


STAGES = [
    ("probe", stage_probe),
    ("pallas", stage_pallas),
    ("train_step", stage_train_step),
    ("scan_chunk", stage_scan_chunk),
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--deadline_s", type=float,
                   default=float(os.environ.get(
                       "DISCOGAN_SMOKE_DEADLINE_S", "900")),
                   help="hard watchdog; a wedged tunnel exits 2 (0=off)")
    p.add_argument("--probe_deadline_s", type=float, default=120.0,
                   help="tighter deadline for the first transport probe")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    wd = _watchdog(args.deadline_s) if args.deadline_s > 0 else None
    ok = True
    for name, fn in STAGES:
        # The probe gets its own short fuse: a dead tunnel should report
        # in ~2 min, not hold the full compile-sized deadline.
        pwd = (_watchdog(args.probe_deadline_s)
               if name == "probe" and args.probe_deadline_s > 0 else None)
        t0 = time.perf_counter()
        try:
            detail = fn()
            print(f"[tpu_smoke] {name}: ok ({time.perf_counter() - t0:.1f}s)"
                  f" — {detail}", flush=True)
        except Exception as e:
            ok = False
            print(f"[tpu_smoke] {name}: FAIL ({time.perf_counter() - t0:.1f}s)"
                  f" — {type(e).__name__}: {e}", flush=True)
        finally:
            if pwd is not None:
                pwd.cancel()
    if wd is not None:
        wd.cancel()
    print(f"[tpu_smoke] {'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
