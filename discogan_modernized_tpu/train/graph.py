"""The DiscoGAN loss graph: forwards, losses, curriculum mixing.

Reproduces the reference per-iteration graph (ref image_translation.py
:342-382) with the exact call order — the order matters because every
train-mode forward advances BatchNorm running statistics:

    AB  = G_B(A);  BA  = G_A(B)
    ABA = G_A(AB); BAB = G_B(BA)
    recon_A = MSE(ABA, A); recon_B = MSE(BAB, B)
    D_A on A then BA -> (dis_loss_A, gen_loss_A, fm_loss_A)
    D_B on B then AB -> (dis_loss_B, gen_loss_B, fm_loss_B)

Curriculum + arch-mode mixing (ref :366-382):

    rate = starting_rate if iters < gan_curriculum else default_rate
    gen_loss_A_total = (fm_B*0.9 + gen_B*0.1)*(1-rate) + recon_A*rate
    gen_loss_B_total = (fm_A*0.9 + gen_A*0.1)*(1-rate) + recon_B*rate
    discogan: gen = A_total + B_total,            dis = dis_A + dis_B
    recongan: gen = A_total,                      dis = dis_B
    gan:      gen = gen_B*0.1 + fm_B*0.9,         dis = dis_B

`rate` is a traced scalar so crossing the curriculum boundary does not
recompile. The whole graph lives inside one jitted step function.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.precision import Policy, F32
from ..models.generator import generator_apply
from ..models.discriminator import discriminator_apply
from ..ops.losses import mse_loss, feature_matching_loss, gan_losses

ARCH_MODES = ("discogan", "recongan", "gan")


def _stack_pair(tree_a, tree_b):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda a, b: jnp.stack([a, b]), tree_a, tree_b)


def _unstack_pair(tree):
    import jax

    return (jax.tree.map(lambda a: a[0], tree),
            jax.tree.map(lambda a: a[1], tree))


def _checkpoint_policies(remat_policy: str | None):
    """(generator, discriminator) jax.checkpoint policies per granularity.

    None     — save only network inputs/outputs; the backward re-runs the
               full forward (max memory saving, ~1 extra forward of FLOPs).
    "latent" — additionally save the generators' tiny 1x1 latents so the
               encoder/decoder halves rematerialize independently.
    "conv"   — save every convolution output (checkpoint_name "conv_out"
               in models/); the backward recomputes only the elementwise
               BN/activation chains, never a convolution. Roughly 1/3 the
               activation memory of no-remat at zero conv recompute — the
               512px sweet spot (PERF.md).
    """
    import jax

    if remat_policy == "conv":
        pol = jax.checkpoint_policies.save_only_these_names(
            "conv_out", "gen_latent")
        return pol, pol
    if remat_policy == "latent":
        return (jax.checkpoint_policies.save_only_these_names("gen_latent"),
                None)
    if remat_policy not in (None, "full"):
        raise ValueError(
            f"remat_policy must be one of None/'full'/'latent'/'conv', "
            f"got {remat_policy!r}")
    return None, None


def discogan_losses_paired(models, model_states, A, B, *, policy: Policy = F32,
                           skip_first_fm: bool = False,
                           axis_name: str | None = None, remat: bool = False,
                           remat_policy: str | None = None,
                           remat_dis: bool | None = None,
                           dis_only: bool = False):
    """The same loss graph with every A-side/B-side op pair fused.

    The DiscoGAN graph is perfectly symmetric: each forward comes in an
    (A-side, B-side) pair with identical shapes and different weights.
    vmap over stacked parameter pytrees lowers each pair to one grouped
    convolution per layer — half the kernel launches, double the work per
    kernel (better MXU utilization at small spatial sizes) — while
    preserving the reference numerics exactly: BN statistics reduce within
    each vmap slice, and the pair schedule reproduces the reference call
    order (G_B/G_A first calls, then their second calls, then the D pairs).
    """
    import jax
    import jax.numpy as jnp

    kw = dict(policy=policy, training=True, axis_name=axis_name)

    def g_one(p, s, x):
        return generator_apply(p, s, x, **kw)

    def d_one(p, s, x):
        return discriminator_apply(p, s, x, **kw)

    g_pair = jax.vmap(g_one)
    d_pair = jax.vmap(d_one)
    if remat:
        g_policy, d_policy = _checkpoint_policies(remat_policy)
        g_pair = jax.checkpoint(g_pair, policy=g_policy)
        if remat_dis is None or remat_dis:
            d_pair = jax.checkpoint(d_pair, policy=d_policy)

    gBA_params = _stack_pair(models["gen_B"], models["gen_A"])
    dAB_params = _stack_pair(models["dis_A"], models["dis_B"])

    # Stage 1: AB = G_B(A), BA = G_A(B).
    st1 = _stack_pair(model_states["gen_B"], model_states["gen_A"])
    out1, st1n = g_pair(gBA_params, st1, jnp.stack([A, B]))
    AB, BA = out1[0], out1[1]
    gb_s1, ga_s1 = _unstack_pair(st1n)

    if dis_only:  # lean D-step: see discogan_losses
        ga_s2, gb_s2 = ga_s1, gb_s1
        recon_A = recon_B = jnp.zeros((), jnp.float32)
    else:
        # Stage 2: ABA = G_A(AB), BAB = G_B(BA) — note the swapped pairing.
        gAB_params = _stack_pair(models["gen_A"], models["gen_B"])
        st2 = _stack_pair(ga_s1, gb_s1)
        out2, st2n = g_pair(gAB_params, st2, jnp.stack([AB, BA]))
        ABA, BAB = out2[0], out2[1]
        ga_s2, gb_s2 = _unstack_pair(st2n)

        recon_A = mse_loss(ABA, A)
        recon_B = mse_loss(BAB, B)

    # Stage 3: D_A(A), D_B(B) then D_A(BA), D_B(AB).
    dst1 = _stack_pair(model_states["dis_A"], model_states["dis_B"])
    (real_p, real_feats), dst1n = d_pair(dAB_params, dst1, jnp.stack([A, B]))
    (fake_p, fake_feats), dst2n = d_pair(dAB_params, dst1n, jnp.stack([BA, AB]))
    da_s2, db_s2 = _unstack_pair(dst2n)

    dis_loss_A, gen_loss_A = gan_losses(real_p[0], fake_p[0])
    dis_loss_B, gen_loss_B = gan_losses(real_p[1], fake_p[1])
    fm_loss_A = feature_matching_loss(
        [f[0] for f in real_feats], [f[0] for f in fake_feats],
        skip_first=skip_first_fm, axis_name=axis_name)
    fm_loss_B = feature_matching_loss(
        [f[1] for f in real_feats], [f[1] for f in fake_feats],
        skip_first=skip_first_fm, axis_name=axis_name)

    losses = {
        "gen_A": gen_loss_A,
        "gen_B": gen_loss_B,
        "fm_A": fm_loss_A,
        "fm_B": fm_loss_B,
        "recon_A": recon_A,
        "recon_B": recon_B,
        "dis_A": dis_loss_A,
        "dis_B": dis_loss_B,
    }
    if axis_name is not None:
        from jax import lax

        losses = {k: lax.pmean(v, axis_name) for k, v in losses.items()}
    new_states = {"gen_A": ga_s2, "gen_B": gb_s2, "dis_A": da_s2, "dis_B": db_s2}
    return losses, new_states


def discogan_losses(models, model_states, A, B, *, policy: Policy = F32,
                    skip_first_fm: bool = False, axis_name: str | None = None,
                    remat: bool = False, remat_policy: str | None = None,
                    remat_dis: bool | None = None, dis_only: bool = False,
                    concat_dis: bool = False):
    """Run the full forward graph.

    dis_only=True (the opt-in "lean" D-step, TrainConfig.lean_dis) skips
    the ABA/BAB reconstruction forwards: the discriminator loss never
    reads them, and in training mode BatchNorm normalizes with batch
    statistics, so the weight trajectory is bit-identical with or without
    them (tests/test_lean_dis.py) — the reference runs them on D
    iterations purely as a side effect of building the full graph every
    step (ref image_translation.py:342-390). What DOES differ is BN
    running-statistic bookkeeping (2 generator forwards per D iteration
    instead of 4), i.e. the eval-mode buffers exported in checkpoints
    accumulate from fewer batches. recon losses are reported as 0 —
    callers must route log-cadence iterations through the full graph to
    keep the training_log contract exact (train/step.py, train/loop.py).

    models / model_states: dicts with keys gen_A, gen_B, dis_A, dis_B.
    Returns (losses, new_model_states) where losses has the eight raw
    components the reference logs plus recon terms.

    remat: rematerialize each network forward during the backward pass
    (jax.checkpoint) instead of keeping all intermediate activations live.
    At 512px/b32 the un-remat'd graph (8 forwards' activations + ~8GB of
    params/Adam state) exceeds a v5e chip's 16GB HBM; remat trades ~1
    extra forward per backward for keeping only network inputs/outputs.

    remat_policy="latent" additionally saves the generators' tiny 1x1
    latents (checkpoint_name in models/generator.py) so the encoder and
    decoder halves rematerialize independently — less recompute for a few
    hundred saved floats.
    """
    import jax

    kw = dict(policy=policy, training=True, axis_name=axis_name)

    def g_apply(p, s, x):
        return generator_apply(p, s, x, **kw)

    def d_apply(p, s, x):
        return discriminator_apply(p, s, x, **kw)

    if concat_dis:
        from ..models.discriminator import discriminator_apply_pair

        def d_pair(p, s, xr, xf):
            return discriminator_apply_pair(p, s, xr, xf, **kw)

    if remat:
        g_policy, d_policy = _checkpoint_policies(remat_policy)
        g_apply = jax.checkpoint(g_apply, policy=g_policy)
        # remat_dis=False stores discriminator activations instead of
        # recomputing them in the backward — numerically identical (remat
        # replays the exact same ops), a pure schedule/memory trade. The
        # D stacks are encoder-only, so their activations are small
        # (~2GB at 512px b32 across all 4 D forwards) next to the
        # generators'; when they fit, not rematerializing them removes
        # every D-forward recompute from both branch backwards.
        if remat_dis is None or remat_dis:
            d_apply = jax.checkpoint(d_apply, policy=d_policy)
            if concat_dis:
                d_pair = jax.checkpoint(d_pair, policy=d_policy)

    AB, gb_s1 = g_apply(models["gen_B"], model_states["gen_B"], A)
    BA, ga_s1 = g_apply(models["gen_A"], model_states["gen_A"], B)
    if dis_only:
        ga_s2, gb_s2 = ga_s1, gb_s1
        recon_A = recon_B = jnp.zeros((), jnp.float32)
    else:
        ABA, ga_s2 = g_apply(models["gen_A"], ga_s1, AB)
        BAB, gb_s2 = g_apply(models["gen_B"], gb_s1, BA)

        recon_A = mse_loss(ABA, A)
        recon_B = mse_loss(BAB, B)

    if concat_dis:
        # Both forwards of each D in one conv-batched pass (2B effective
        # MXU batch), BN statistics per half — exactly the sequential
        # real-then-fake semantics (models/discriminator.py).
        (A_real, A_feats_real), (A_fake, A_feats_fake), da_s2 = d_pair(
            models["dis_A"], model_states["dis_A"], A, BA)
        (B_real, B_feats_real), (B_fake, B_feats_fake), db_s2 = d_pair(
            models["dis_B"], model_states["dis_B"], B, AB)
    else:
        (A_real, A_feats_real), da_s1 = d_apply(
            models["dis_A"], model_states["dis_A"], A)
        (A_fake, A_feats_fake), da_s2 = d_apply(models["dis_A"], da_s1, BA)
        (B_real, B_feats_real), db_s1 = d_apply(
            models["dis_B"], model_states["dis_B"], B)
        (B_fake, B_feats_fake), db_s2 = d_apply(models["dis_B"], db_s1, AB)
    dis_loss_A, gen_loss_A = gan_losses(A_real, A_fake)
    fm_loss_A = feature_matching_loss(
        A_feats_real, A_feats_fake, skip_first=skip_first_fm, axis_name=axis_name
    )
    dis_loss_B, gen_loss_B = gan_losses(B_real, B_fake)
    fm_loss_B = feature_matching_loss(
        B_feats_real, B_feats_fake, skip_first=skip_first_fm, axis_name=axis_name
    )

    losses = {
        "gen_A": gen_loss_A,
        "gen_B": gen_loss_B,
        "fm_A": fm_loss_A,
        "fm_B": fm_loss_B,
        "recon_A": recon_A,
        "recon_B": recon_B,
        "dis_A": dis_loss_A,
        "dis_B": dis_loss_B,
    }
    if axis_name is not None:
        # Sync mode: every scalar becomes the global-batch loss, identical on
        # all replicas (the FM terms already are, via the pmean'd feature
        # means — pmean is idempotent on replicated values).
        from jax import lax

        losses = {k: lax.pmean(v, axis_name) for k, v in losses.items()}
    new_states = {"gen_A": ga_s2, "gen_B": gb_s2, "dis_A": da_s2, "dis_B": db_s2}
    return losses, new_states


def mix_losses(losses, rate, arch: str):
    """Curriculum mixing + arch-mode totals. Returns (gen_total, dis_total)."""
    if arch not in ARCH_MODES:
        raise ValueError(f"model_arch must be one of {ARCH_MODES}, got {arch!r}")
    rate = jnp.asarray(rate, jnp.float32)
    gen_loss_A_total = (
        (losses["fm_B"] * 0.9 + losses["gen_B"] * 0.1) * (1.0 - rate)
        + losses["recon_A"] * rate
    )
    gen_loss_B_total = (
        (losses["fm_A"] * 0.9 + losses["gen_A"] * 0.1) * (1.0 - rate)
        + losses["recon_B"] * rate
    )
    if arch == "discogan":
        return gen_loss_A_total + gen_loss_B_total, losses["dis_A"] + losses["dis_B"]
    if arch == "recongan":
        return gen_loss_A_total, losses["dis_B"]
    return losses["gen_B"] * 0.1 + losses["fm_B"] * 0.9, losses["dis_B"]


def trainable_subsets(arch: str):
    """Which models each optimizer updates, per arch mode.

    Torch zero_grad(set_to_none=True) + Adam skip-None semantics mean
    models whose loss terms don't touch them receive no update at all
    (no weight decay, no moment decay). discogan touches everything;
    recongan's gen loss (A_total) still reaches both generators through
    ABA = G_A(G_B(A)), but only dis_B; gan mode reaches only gen_B/dis_B.
    """
    if arch == "discogan":
        return ("gen_A", "gen_B"), ("dis_A", "dis_B")
    if arch == "recongan":
        return ("gen_A", "gen_B"), ("dis_B",)
    return ("gen_B",), ("dis_B",)
