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


def discogan_losses(models, model_states, A, B, *, policy: Policy = F32,
                    skip_first_fm: bool = False, axis_name: str | None = None,
                    remat: bool = False):
    """Run the full forward graph.

    models / model_states: dicts with keys gen_A, gen_B, dis_A, dis_B.
    Returns (losses, new_model_states) where losses has the eight raw
    components the reference logs plus recon terms.

    remat: rematerialize each network forward during the backward pass
    (jax.checkpoint) instead of keeping all intermediate activations live.
    At 512px/b32 the un-remat'd graph (8 forwards' activations + ~8GB of
    params/Adam state) exceeds a v5e chip's 16GB HBM; remat trades ~1
    extra forward per backward for keeping only network inputs/outputs.
    """
    import jax

    kw = dict(policy=policy, training=True, axis_name=axis_name)

    def g_apply(p, s, x):
        return generator_apply(p, s, x, **kw)

    def d_apply(p, s, x):
        return discriminator_apply(p, s, x, **kw)

    if remat:
        g_apply = jax.checkpoint(g_apply)
        d_apply = jax.checkpoint(d_apply)

    AB, gb_s1 = g_apply(models["gen_B"], model_states["gen_B"], A)
    BA, ga_s1 = g_apply(models["gen_A"], model_states["gen_A"], B)
    ABA, ga_s2 = g_apply(models["gen_A"], ga_s1, AB)
    BAB, gb_s2 = g_apply(models["gen_B"], gb_s1, BA)

    recon_A = mse_loss(ABA, A)
    recon_B = mse_loss(BAB, B)

    (A_real, A_feats_real), da_s1 = d_apply(
        models["dis_A"], model_states["dis_A"], A)
    (A_fake, A_feats_fake), da_s2 = d_apply(models["dis_A"], da_s1, BA)
    dis_loss_A, gen_loss_A = gan_losses(A_real, A_fake)
    fm_loss_A = feature_matching_loss(
        A_feats_real, A_feats_fake, skip_first=skip_first_fm, axis_name=axis_name
    )

    (B_real, B_feats_real), db_s1 = d_apply(
        models["dis_B"], model_states["dis_B"], B)
    (B_fake, B_feats_fake), db_s2 = d_apply(models["dis_B"], db_s1, AB)
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
