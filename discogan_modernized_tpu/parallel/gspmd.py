"""GSPMD path: DP x TP from sharding annotations, collectives by XLA.

The shard_map path (parallel/dp.py) reproduces DDP semantics explicitly.
This module is the other idiomatic TPU recipe: annotate parameter and
batch shardings on a (data, model) mesh, jit the *unmodified* train step,
and let XLA's SPMD partitioner insert the collectives (psum for the
row-parallel conv contractions and gradient reductions, all-gathers where
layouts demand). Used for channel sharding ("tensor parallelism") of the
wide 512px conv layers — the SURVEY §2 optional TP extension — composed
with data parallelism on the same mesh.

Semantics note: under GSPMD the program is one logical computation, so
BatchNorm statistics are *global* over the batch (equivalent to
bn_sync=True) regardless of the data-axis size; per-replica DDP-style BN
is only available via the shard_map path.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS
from ..core.precision import Policy, default_policy
from ..train.step import TrainConfig, _make_branch, env_compiler_options

# Conv kernels are HWIO; shard the output-channel dim when it's wide
# enough to split. 100-channel latent convs and 3-channel heads stay
# replicated automatically (not divisible / below threshold).
MIN_SHARD_CHANNELS = 256


def _kernel_spec(leaf, tp: int):
    if (
        hasattr(leaf, "ndim") and leaf.ndim == 4
        and leaf.shape[-1] >= MIN_SHARD_CHANNELS
        and leaf.shape[-1] % tp == 0
    ):
        return P(None, None, None, MODEL_AXIS)
    return P()


def train_state_shardings(ts, mesh):
    """NamedSharding tree for a train state: wide conv kernels (and their
    Adam moments) channel-sharded on the model axis, the rest replicated."""
    tp = mesh.shape[MODEL_AXIS]

    def to_sharding(spec):
        return NamedSharding(mesh, spec)

    def shard_params(tree):
        return jax.tree.map(lambda l: to_sharding(_kernel_spec(l, tp)), tree)

    shardings = {
        "models": shard_params(ts["models"]),
        "model_states": jax.tree.map(lambda l: to_sharding(P()),
                                     ts["model_states"]),
        "opt_gen": {
            "m": shard_params(ts["opt_gen"]["m"]),
            "v": shard_params(ts["opt_gen"]["v"]),
            "step": to_sharding(P()),
        },
        "opt_dis": {
            "m": shard_params(ts["opt_dis"]["m"]),
            "v": shard_params(ts["opt_dis"]["v"]),
            "step": to_sharding(P()),
        },
    }
    return shardings


def place_train_state(ts, mesh):
    """Device_put the state onto the mesh with TP shardings."""
    return jax.device_put(ts, train_state_shardings(ts, mesh))


def make_gspmd_train_steps(cfg: TrainConfig, mesh, policy: Policy | None = None,
                           *, spatial: bool = False):
    """Returns (gen_step, dis_step) jitted with sharding annotations.

    Default: batches split on the data axis, wide conv kernels on the
    model axis (tensor parallelism). spatial=True instead shards the
    image HEIGHT dimension over the model axis — the convolutional analog
    of sequence parallelism: XLA inserts the halo exchanges the stride-2
    4x4 convs need at shard boundaries, and activation memory scales down
    with the mesh (relevant for 512px where activations, not params,
    dominate). Params stay replicated in spatial mode.

    Measured (XLA memory_analysis on the virtual mesh, PERF.md r2 and
    tests/test_memory_analysis.py): spatial temp bytes 0.71x at model=2
    and 0.52x at model=4 with a fixed per-device batch; channel-sharded
    TP argument bytes 0.59x at tp=2 (0.50x at 512px where the wide
    kernels dominate).

    The step body is the plain single-device body — no axis_name, no
    explicit collectives.
    """
    cfg_sp = dataclasses.replace(cfg, axis_name=None)
    policy = policy or default_policy(cfg.precision)
    wrap = _make_gspmd_wrap(mesh, spatial)
    gen_step = wrap(_make_branch(cfg_sp, policy, "gen"))
    dis_step = wrap(_make_branch(cfg_sp, policy, "dis"))
    return gen_step, dis_step


def _make_gspmd_wrap(mesh, spatial: bool):
    """The shared GSPMD step wrapper: sharding annotations, spatial latent
    pins, per-pytree-structure jit cache, AOT .jit_for hook."""

    def wrap(raw_body):
        def body(ts, A, B, rate):
            # Pin the 1x1 latent/head activations while tracing: with the
            # height axis sharded the partitioner otherwise flip-flops
            # their layout and replicate-and-repartitions the backward
            # selects ("[SPMD] Involuntary full rematerialization").
            # Layout choice matters: spatial mode pins CHANNELS on the
            # model axis (the 100-ch latent divides; channel-contracted
            # convs partition natively, so no forced reshard and the
            # warning tail is clean), falling back to batch-only where
            # channels don't divide (the 1-ch head). A fully REPLICATED
            # pin is NOT safe — it reproduces the measured 0.2-level
            # gradient corruption test_gspmd's m-gate guards against.
            if not spatial:
                # Channel-sharded TP has no layout flip-flop: the latent
                # shardings propagate consistently from the channel-
                # sharded kernels, and a forced batch-only pin could only
                # insert reshards into the hot path. Pin nothing.
                return raw_body(ts, A, B, rate)

            from ..ops.sharding import (set_latent_constraint,
                                        reset_latent_constraint)

            tp = mesh.shape[MODEL_AXIS]

            def pin(x):
                spec = (P(DATA_AXIS, None, None, MODEL_AXIS)
                        if x.shape[-1] % tp == 0
                        else P(DATA_AXIS))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))

            token = set_latent_constraint(pin)
            try:
                return raw_body(ts, A, B, rate)
            finally:
                reset_latent_constraint(token)

        def jit_with(ts):
            if spatial:
                shardings = jax.tree.map(
                    lambda _: NamedSharding(mesh, P()), ts)
                batch = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
            else:
                shardings = train_state_shardings(ts, mesh)
                batch = NamedSharding(mesh, P(DATA_AXIS))
            scalar = NamedSharding(mesh, P())
            return jax.jit(
                body,
                in_shardings=(shardings, batch, batch, scalar),
                out_shardings=(shardings, scalar),
                donate_argnums=(0,),
                compiler_options=env_compiler_options(),
            )

        compiled = {}

        def step(ts, A, B, rate):
            # Shardings depend only on the pytree structure; cache one
            # jitted callable per structure (treedefs are hashable).
            key = jax.tree.structure(ts)
            if key not in compiled:
                compiled[key] = jit_with(ts)
            return compiled[key](ts, A, B, rate)

        # AOT access for tools/memory_report.py: the underlying jax.jit
        # object (callable .lower(...) with abstract avals) for a state
        # pytree — shardings only need leaf shapes, so ShapeDtypeStructs
        # work.
        step.jit_for = jit_with
        return step

    return wrap


def make_gspmd_scan_train_step(cfg: TrainConfig, mesh, *, steps: int,
                               policy: Policy | None = None, jit: bool = True,
                               compiler_options: dict | None = None,
                               variant: str = "switch", spatial: bool = False):
    """The fused multi-step scan program under GSPMD TP/spatial sharding
    (round 4, VERDICT r3 item 5: the fast input path — HBM-resident
    dataset + on-device batch gather + one dispatch per k iterations —
    previously existed only single-device and under shard_map DP).

    (ts, data_A, data_B, idx_A, idx_B, iters0) -> (ts, losses), the same
    contract as make_scan_train_step / make_dp_scan_train_step:
      data_A/data_B: (N, H, W, 3) decoded datasets laid out P(data) —
                     row-sharded over the data axis, replicated across the
                     model axis (each model-group shares its data-group's
                     rows; HBM cost scales 1/data like DP).
      idx_A/idx_B:   (steps, batch) int32, P(None, data) — column block j
                     holds LOCAL indices into data shard j (the same
                     per-shard index streams PrefetchLoader.
                     sharded_epoch_indices emits for DP-scan).
      iters0:        replicated scalar.

    The batch gather runs inside a data-axis-MANUAL shard_map
    (jax.shard_map(axis_names={data})): each device gathers from its own
    resident shard with local indices — no cross-shard gather lowering,
    no all-gather of the dataset — while the model axis stays AUTO so the
    step body keeps its GSPMD semantics (channel-sharded kernels in TP
    mode, height sharding + halo exchange in spatial mode, global-batch
    BN). Gathered batches are constrained to the per-mode batch layout
    before entering the step.

    Ref analog: the reference feeds every rank a full host-side input
    pipeline per step (distributed_image_translation.py:203-216); here
    the dataset is resident and the gather is device-local.

    spatial=True builds and runs, and single-call losses agree with the
    per-step spatial programs to ~3e-5 — but the trainer does NOT route
    it (train/loop.py): under the scan body the spatial partitioner
    diverges the latent/enc0 weight gradients 0.013-0.033 in the first
    Adam moment (vs the <2e-3 reduction-order envelope; variant-
    independent; "[SPMD] Involuntary full rematerialization" warnings on
    the latent backward), the same fragile-pin class test_gspmd's m-gate
    guards against. Measured round 4, PERF.md.
    """
    import jax.numpy as jnp

    from ..train.step import scan_multi_body

    cfg_sp = dataclasses.replace(cfg, axis_name=None)
    policy = policy or default_policy(cfg.precision)
    gen = _make_branch(cfg_sp, policy, "gen")
    dis = _make_branch(cfg_sp, policy, "dis")
    lean = (_make_branch(cfg_sp, policy, "dis", lean=True)
            if cfg.lean_dis else None)
    tp = mesh.shape[MODEL_AXIS]

    batch_spec = (P(DATA_AXIS, MODEL_AXIS) if spatial else P(DATA_AXIS))

    def take(data, idx):
        # Manual over the data axis only: the local gather semantics of
        # parallel/dp.py, composed with an auto model axis.
        local = jax.shard_map(
            lambda d, i: jnp.take(d, i, axis=0),
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            axis_names={DATA_AXIS},
        )(data, idx)
        return jax.lax.with_sharding_constraint(
            local, NamedSharding(mesh, batch_spec))

    multi_raw = scan_multi_body(cfg, gen, dis, lean, steps, variant=variant,
                                take=take)

    if not spatial:
        multi = multi_raw
    else:
        def multi(ts, data_A, data_B, idx_A, idx_B, iters0):
            # Same latent-activation pins as the per-step spatial wrap
            # (_make_gspmd_wrap): without them the partitioner
            # re-materializes the 1x1 latent layouts per backward.
            from ..ops.sharding import (set_latent_constraint,
                                        reset_latent_constraint)

            def pin(x):
                spec = (P(DATA_AXIS, None, None, MODEL_AXIS)
                        if x.shape[-1] % tp == 0
                        else P(DATA_AXIS))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))

            token = set_latent_constraint(pin)
            try:
                return multi_raw(ts, data_A, data_B, idx_A, idx_B, iters0)
            finally:
                reset_latent_constraint(token)

    if not jit:
        return multi

    if compiler_options is None:
        compiler_options = env_compiler_options()

    def jit_with(ts):
        if spatial:
            ts_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), ts)
        else:
            ts_sh = train_state_shardings(ts, mesh)
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
        scalar = NamedSharding(mesh, P())
        return jax.jit(
            multi,
            in_shardings=(ts_sh, data_sh, data_sh, idx_sh, idx_sh, scalar),
            out_shardings=(ts_sh, scalar),
            donate_argnums=(0,),
            compiler_options=compiler_options,
        )

    compiled = {}

    def step(ts, data_A, data_B, idx_A, idx_B, iters0):
        key = jax.tree.structure(ts)
        if key not in compiled:
            compiled[key] = jit_with(ts)
        return compiled[key](ts, data_A, data_B, idx_A, idx_B, iters0)

    step.jit_for = jit_with
    return step


def make_gspmd_lean_dis_step(cfg: TrainConfig, mesh,
                             policy: Policy | None = None, *,
                             spatial: bool = False):
    """GSPMD variant of the lean D-step (--lean_dis): same D update with
    the ABA/BAB reconstruction forwards skipped on non-logged D
    iterations. The wrap (shardings, latent pins, jit cache) is identical
    to make_gspmd_train_steps' — only the branch body differs. The weight
    trajectory is bit-identical to the full D-step (training-mode BN uses
    batch stats; dis_loss never reads the reconstructions), recon losses
    report 0, and callers must route logged iterations through the full
    dis_step (train/loop.py does, via cfg.use_lean_dis). Ref analog: the
    D-iteration graph of image_translation.py:384-390."""
    cfg_sp = dataclasses.replace(cfg, axis_name=None)
    policy = policy or default_policy(cfg.precision)
    wrap = _make_gspmd_wrap(mesh, spatial)
    return wrap(_make_branch(cfg_sp, policy, "dis", lean=True))
