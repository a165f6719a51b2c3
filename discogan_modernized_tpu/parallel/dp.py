"""Data-parallel training over a device mesh via shard_map.

Replaces the reference's DDP/NCCL layer (distributed_image_translation.py:
26-46 setup, :401-404 DDP wrap, :203-216 DistributedSampler/DataLoader)
with SPMD: the whole per-step body — forwards, losses, backward, gradient
reduction, Adam — is one jitted program over the mesh's `data` axis.
XLA lowers the gradient collective onto ICI within a slice (DCN across
slices); there is no rendezvous, no MASTER_ADDR, no barriers — program
boundaries are the sync points.

Two BN modes (TrainConfig.bn_sync):
- local (default, DDP-faithful): each replica computes its own batch stats,
  so BN state carries a leading `data`-sharded replica axis; gradients are
  pmean'd (DDP averages). Checkpoints take replica 0's stats, exactly like
  the reference saving rank 0's state_dict.
- sync: cross-replica stats; all state is replicated; training is
  step-for-step equal to single-device training on the same global batch
  (tested on the 8-device CPU mesh).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..core.precision import Policy, default_policy
from ..train.step import (TrainConfig, _make_branch, env_compiler_options,
                          scan_multi_body)


def _ts_specs(cfg: TrainConfig):
    """Prefix pytree of PartitionSpecs for the train state."""
    state_spec = P() if cfg.bn_sync else P(DATA_AXIS)
    return {
        "models": P(),
        "model_states": state_spec,
        "opt_gen": P(),
        "opt_dis": P(),
    }


def replicate_train_state(ts, mesh, cfg: TrainConfig):
    """Prepare a single-device train state for DP on `mesh`.

    In local-BN mode each replica needs its own BN-state copy: stack
    n_data copies along a new leading axis (all start identical, like
    DDP's seed-synchronized init — ref :372).
    """
    n = mesh.shape[DATA_AXIS]
    if cfg.bn_sync:
        return ts
    stacked = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), ts["model_states"]
    )
    return dict(ts, model_states=stacked)


def unreplicate_train_state(ts, cfg: TrainConfig):
    """Back to single-device layout; takes replica 0's BN stats (rank-0
    checkpoint semantics, ref distributed_image_translation.py:552-568)."""
    if cfg.bn_sync:
        return ts
    return dict(ts, model_states=jax.tree.map(lambda a: a[0], ts["model_states"]))


def shard_batch(mesh):
    """NamedSharding for a global (N, H, W, C) batch split on the data axis."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P(DATA_AXIS))


def _wrap_dp(cfg: TrainConfig, mesh, body, *, jit: bool):
    """shard_map a single-device step body over the mesh's data axis."""
    specs = _ts_specs(cfg)
    local_state = not cfg.bn_sync

    def shard_body(ts, A, B, rate):
        if local_state:
            ts = dict(ts, model_states=jax.tree.map(
                lambda a: a[0], ts["model_states"]))
        new_ts, losses = body(ts, A, B, rate)
        if local_state:
            new_ts = dict(new_ts, model_states=jax.tree.map(
                lambda a: a[None], new_ts["model_states"]))
            losses = lax.pmean(losses, DATA_AXIS)
        return new_ts, losses

    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(specs, P()),
    )
    if jit:
        # DISCOGAN_XLA_COPTS applies here too — the parallel modes must
        # honor the same production compiler-option knob as the
        # single-device step builders (train/step.py).
        mapped = jax.jit(mapped, donate_argnums=(0,),
                         compiler_options=env_compiler_options())
    return mapped


def make_dp_train_steps(cfg: TrainConfig, mesh, policy: Policy | None = None,
                        *, jit: bool = True):
    """Returns (gen_step, dis_step) operating on mesh-sharded state/batches.

    Signature matches the single-device steps: (ts, A, B, rate) ->
    (new_ts, losses) where A/B are global batches (sharded or shardable on
    the data axis) and losses are replicated global scalars.
    """
    cfg_sp = dataclasses.replace(cfg, axis_name=DATA_AXIS)
    policy = policy or default_policy(cfg.precision)
    gen_step = _wrap_dp(cfg, mesh, _make_branch(cfg_sp, policy, "gen"), jit=jit)
    dis_step = _wrap_dp(cfg, mesh, _make_branch(cfg_sp, policy, "dis"), jit=jit)
    return gen_step, dis_step


def make_dp_scan_train_step(cfg: TrainConfig, mesh, *, steps: int,
                            policy: Policy | None = None, jit: bool = True,
                            compiler_options: dict | None = None,
                            variant: str = "switch"):
    """The fused multi-step scan program under data parallelism: one XLA
    dispatch runs `steps` train iterations over the mesh, gathering each
    per-device batch from a data-axis-SHARDED HBM-resident dataset.

    (ts, data_A, data_B, idx_A, idx_B, iters0) -> (ts, losses)
      data_A/data_B: (N, H, W, 3) global arrays sharded P(data) — each
                     device holds its own N/n_data row block (its private
                     dataset shard, the DistributedSampler analog of ref
                     distributed_image_translation.py:203-216, but resident
                     in HBM with zero per-step H2D).
      idx_A/idx_B:   (steps, global_batch) int32, sharded P(None, data) —
                     each device's column block holds LOCAL indices into
                     its own dataset shard (per-shard independent
                     permutations, the unpaired-shuffle semantics).
      iters0:        replicated int32 scalar.
      losses:        dict of (steps,) replicated arrays (pmean'd across
                     replicas in local-BN mode, exactly like the per-step
                     DP path).

    Semantics match driving make_dp_train_steps per step on global batches
    assembled from the same indices (tests/test_dp_scan.py); the point is
    what it is single-device (PERF.md: 2,993 -> 13.1k img/s): dispatch
    amortization + zero per-step host involvement — here additionally with
    no per-step make_array_from_process_local_data assembly.
    """
    cfg_sp = dataclasses.replace(cfg, axis_name=DATA_AXIS)
    policy = policy or default_policy(cfg.precision)
    gen = _make_branch(cfg_sp, policy, "gen")
    dis = _make_branch(cfg_sp, policy, "dis")
    lean = (_make_branch(cfg_sp, policy, "dis", lean=True)
            if cfg.lean_dis else None)
    if lean is not None and not cfg.bn_sync:
        _lean_raw = lean

        def lean(ts, A, B, rate):  # noqa: F811
            new_ts, losses = _lean_raw(ts, A, B, rate)
            # The lean graph's recon losses are traced CONSTANTS (zeros);
            # under shard_map, lax.switch requires every branch's outputs
            # to agree on which manual axes they vary over — cast them to
            # data-varying to match the full branches (pure type-level;
            # the values stay 0). bn_sync mode needs no cast: there every
            # branch's losses are pmean'd inside the graph, i.e. already
            # axis-invariant on both sides.
            losses = dict(losses, recon_A=lax.pcast(
                losses["recon_A"], DATA_AXIS, to="varying"),
                recon_B=lax.pcast(losses["recon_B"], DATA_AXIS, to="varying"))
            return new_ts, losses

    # variant: same chunk planner as single-device (train/step.py
    # scan_variant) — "phase"/"phase_cond" run one straight-line
    # [D, G, ..., G] period per scan step, eliminating the per-step
    # conditional over the full carried train state.
    multi = scan_multi_body(cfg, gen, dis, lean, steps, variant=variant)
    specs = _ts_specs(cfg)
    local_state = not cfg.bn_sync

    def shard_body(ts, data_A, data_B, idx_A, idx_B, iters0):
        if local_state:
            ts = dict(ts, model_states=jax.tree.map(
                lambda a: a[0], ts["model_states"]))
        new_ts, losses = multi(ts, data_A, data_B, idx_A, idx_B, iters0)
        if local_state:
            new_ts = dict(new_ts, model_states=jax.tree.map(
                lambda a: a[None], new_ts["model_states"]))
            losses = lax.pmean(losses, DATA_AXIS)
        return new_ts, losses

    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS), P(DATA_AXIS),
                  P(None, DATA_AXIS), P(None, DATA_AXIS), P()),
        out_specs=(specs, P()),
    )
    if jit:
        if compiler_options is None:
            compiler_options = env_compiler_options()
        mapped = jax.jit(mapped, donate_argnums=(0,),
                         compiler_options=compiler_options)
    return mapped


def make_dp_lean_dis_step(cfg: TrainConfig, mesh,
                          policy: Policy | None = None, *, jit: bool = True):
    """DP variant of the lean D-step (--lean_dis): skips the ABA/BAB
    reconstruction forwards on non-logged D iterations. Same wrap as the
    full steps; weight trajectory is bit-identical to the full DP D-step
    (training-mode BN uses batch stats; dis_loss never reads the
    reconstructions). Recon losses report 0 — callers must route logged
    iterations through the full dis_step, exactly like the single-device
    loop does."""
    cfg_sp = dataclasses.replace(cfg, axis_name=DATA_AXIS)
    policy = policy or default_policy(cfg.precision)
    return _wrap_dp(cfg, mesh, _make_branch(cfg_sp, policy, "dis", lean=True),
                    jit=jit)
