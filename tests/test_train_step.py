"""Training-trajectory fidelity vs a torch oracle of the reference loop.

Runs several alternating G/D iterations (ref image_translation.py:308-426
semantics: shared forward graph, curriculum rate, alternating update with
D on iters % update_interval == 0, Adam lr=2e-4 betas=(0.5,0.999)
wd=1e-5) in both frameworks from identical weights and data, and compares
per-iteration loss components and final parameters.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
from itertools import chain

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.core.precision import F32
from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps
from discogan_modernized_tpu.models.torch_compat import (
    generator_to_state_dict,
    discriminator_to_state_dict,
)
from torch_ref import RefGenerator, RefDiscriminator, nhwc_to_nchw_tensor

IMAGE_SIZE = 16
BATCH = 4


def _torch_models_from_state(ts):
    models = {}
    for name in ("gen_A", "gen_B"):
        m = RefGenerator(IMAGE_SIZE)
        sd = generator_to_state_dict(ts["models"][name], ts["model_states"][name])
        m.load_state_dict({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()})
        m.train()
        models[name] = m
    for name in ("dis_A", "dis_B"):
        m = RefDiscriminator(IMAGE_SIZE)
        sd = discriminator_to_state_dict(ts["models"][name], ts["model_states"][name])
        m.load_state_dict({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()})
        m.train()
        models[name] = m
    return models


def _torch_fm(real_feats, fake_feats):
    crit = nn.HingeEmbeddingLoss()
    total = 0
    for rf, ff in zip(real_feats, fake_feats):
        l2 = (rf.mean(0) - ff.mean(0)) ** 2
        total = total + crit(l2, torch.ones(l2.size()))
    return total


def _torch_gan(dis_real, dis_fake):
    crit = nn.BCELoss()
    b = dis_real.size(0)
    dis_real = dis_real.view(b, -1)
    dis_fake = dis_fake.view(b, -1)
    dis_loss = (crit(dis_real, torch.ones(b, 1)) + crit(dis_fake, torch.zeros(b, 1))) * 0.5
    gen_loss = crit(dis_fake, torch.ones(b, 1))
    return dis_loss, gen_loss


def _run_torch_reference(models, data, cfg):
    """The reference train loop, iteration-for-iteration."""
    mse = nn.MSELoss()
    optim_gen = torch.optim.Adam(
        chain(models["gen_A"].parameters(), models["gen_B"].parameters()),
        lr=cfg.learning_rate, betas=(cfg.beta1, cfg.beta2), weight_decay=cfg.weight_decay,
    )
    optim_dis = torch.optim.Adam(
        chain(models["dis_A"].parameters(), models["dis_B"].parameters()),
        lr=cfg.learning_rate, betas=(cfg.beta1, cfg.beta2), weight_decay=cfg.weight_decay,
    )
    log = []
    for iters, (A_np, B_np) in enumerate(data):
        A = nhwc_to_nchw_tensor(A_np)
        B = nhwc_to_nchw_tensor(B_np)
        for m in models.values():
            m.zero_grad()
        AB = models["gen_B"](A)
        BA = models["gen_A"](B)
        ABA = models["gen_A"](AB)
        BAB = models["gen_B"](BA)
        recon_A = mse(ABA, A)
        recon_B = mse(BAB, B)
        A_real, A_fr = models["dis_A"](A)
        A_fake, A_ff = models["dis_A"](BA)
        dis_A, gen_A = _torch_gan(A_real, A_fake)
        fm_A = _torch_fm(A_fr, A_ff)
        B_real, B_fr = models["dis_B"](B)
        B_fake, B_ff = models["dis_B"](AB)
        dis_B, gen_B = _torch_gan(B_real, B_fake)
        fm_B = _torch_fm(B_fr, B_ff)

        rate = cfg.starting_rate if iters < cfg.gan_curriculum else cfg.default_rate
        gen_A_total = (fm_B * 0.9 + gen_B * 0.1) * (1 - rate) + recon_A * rate
        gen_B_total = (fm_A * 0.9 + gen_A * 0.1) * (1 - rate) + recon_B * rate
        gen_loss = gen_A_total + gen_B_total
        dis_loss = dis_A + dis_B

        if iters % cfg.update_interval == 0:
            dis_loss.backward()
            optim_dis.step()
        else:
            gen_loss.backward()
            optim_gen.step()
        log.append({
            "gen_A": gen_A.item(), "gen_B": gen_B.item(),
            "fm_A": fm_A.item(), "fm_B": fm_B.item(),
            "recon_A": recon_A.item(), "recon_B": recon_B.item(),
            "dis_A": dis_A.item(), "dis_B": dis_B.item(),
        })
    return log


def test_training_trajectory_matches_torch_reference():
    cfg = TrainConfig(
        image_size=IMAGE_SIZE, model_arch="discogan",
        gan_curriculum=4,  # exercise the curriculum boundary mid-run
        starting_rate=0.01, default_rate=0.5, precision="f32",
    )
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    torch_models = _torch_models_from_state(ts)

    rng = np.random.RandomState(0)
    data = [
        (rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32),
         rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
        for _ in range(7)
    ]

    ref_log = _run_torch_reference(torch_models, data, cfg)

    gen_step, dis_step = make_train_steps(cfg, F32, jit=True)
    our_log = []
    for iters, (A, B) in enumerate(data):
        rate = jnp.float32(cfg.rate_for(iters))
        step = dis_step if cfg.is_dis_iter(iters) else gen_step
        ts, losses = step(ts, jnp.asarray(A), jnp.asarray(B), rate)
        our_log.append({k: float(v) for k, v in losses.items()})

    for i, (ref, ours) in enumerate(zip(ref_log, our_log)):
        for k in ref:
            assert abs(ref[k] - ours[k]) < 5e-4, f"iter {i} loss {k}: {ref[k]} vs {ours[k]}"

    # Final generator params must track the torch trajectory. Element-wise
    # equality is not achievable across frameworks: Adam's first-step update
    # is ~±lr*sign(g) for ANY nonzero gradient, so elements with |g| at fp
    # noise level amplify rounding differences to ~2*lr. Gate statistically:
    # the fidelity north star is 1e-3, and the overwhelming mass must be far
    # tighter (gradients themselves were verified to ~1e-7 — see ops tests).
    sd_ref = {k: v.detach().numpy() for k, v in torch_models["gen_B"].state_dict().items()}
    sd_ours = generator_to_state_dict(ts["models"]["gen_B"], ts["model_states"]["gen_B"])
    diffs = np.concatenate([
        np.abs(sd_ours[k] - sd_ref[k]).ravel()
        for k in sd_ref if "num_batches" not in k
    ])
    assert float(diffs.mean()) < 2e-5, f"mean {diffs.mean()}"
    assert float(np.quantile(diffs, 0.99)) < 1e-4, f"p99 {np.quantile(diffs, 0.99)}"
    assert float(diffs.max()) < 1e-3, f"max {diffs.max()}"


@pytest.mark.parametrize("arch", ["recongan", "gan"])
def test_arch_modes_update_correct_subsets(arch):
    """gan mode must leave gen_A/dis_A untouched; recongan leaves dis_A."""
    cfg = TrainConfig(image_size=IMAGE_SIZE, model_arch=arch, precision="f32")
    ts = init_train_state(jax.random.PRNGKey(1), cfg)
    before = jax.tree.map(np.asarray, ts["models"])

    rng = np.random.RandomState(1)
    gen_step, dis_step = make_train_steps(cfg, F32, jit=False)
    A = jnp.asarray(rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
    B = jnp.asarray(rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
    ts, _ = dis_step(ts, A, B, jnp.float32(0.01))
    ts, _ = gen_step(ts, A, B, jnp.float32(0.01))

    after = jax.tree.map(np.asarray, ts["models"])

    def changed(name):
        return any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(before[name]), jax.tree.leaves(after[name]))
        )

    assert changed("gen_B") and changed("dis_B")
    if arch == "gan":
        assert not changed("gen_A")
    else:
        assert changed("gen_A")
    assert not changed("dis_A")


@pytest.mark.parametrize("arch", ["recongan", "gan"])
def test_arch_mode_trajectories_match_torch(arch):
    """The recongan/gan mode mixing + optimizer subsets must track the
    reference loop (whose Adam skips grad-None params under
    zero_grad(set_to_none=True))."""
    cfg = TrainConfig(image_size=IMAGE_SIZE, model_arch=arch,
                      gan_curriculum=3, starting_rate=0.01, default_rate=0.5,
                      precision="f32")
    ts = init_train_state(jax.random.PRNGKey(7), cfg)
    torch_models = _torch_models_from_state(ts)

    rng = np.random.RandomState(7)
    data = [
        (rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32),
         rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
        for _ in range(5)
    ]

    # Torch oracle with the reference's per-arch loss selection
    # (image_translation.py:374-382).
    mse = nn.MSELoss()
    optim_gen = torch.optim.Adam(
        chain(torch_models["gen_A"].parameters(),
              torch_models["gen_B"].parameters()),
        lr=cfg.learning_rate, betas=(cfg.beta1, cfg.beta2),
        weight_decay=cfg.weight_decay)
    optim_dis = torch.optim.Adam(
        chain(torch_models["dis_A"].parameters(),
              torch_models["dis_B"].parameters()),
        lr=cfg.learning_rate, betas=(cfg.beta1, cfg.beta2),
        weight_decay=cfg.weight_decay)
    ref_log = []
    for iters, (A_np, B_np) in enumerate(data):
        A = nhwc_to_nchw_tensor(A_np)
        B = nhwc_to_nchw_tensor(B_np)
        for m in torch_models.values():
            m.zero_grad()
        AB = torch_models["gen_B"](A)
        BA = torch_models["gen_A"](B)
        ABA = torch_models["gen_A"](AB)
        BAB = torch_models["gen_B"](BA)
        recon_A = mse(ABA, A)
        recon_B = mse(BAB, B)
        A_real, A_fr = torch_models["dis_A"](A)
        A_fake, A_ff = torch_models["dis_A"](BA)
        dis_A, gen_A = _torch_gan(A_real, A_fake)
        fm_A = _torch_fm(A_fr, A_ff)
        B_real, B_fr = torch_models["dis_B"](B)
        B_fake, B_ff = torch_models["dis_B"](AB)
        dis_B, gen_B = _torch_gan(B_real, B_fake)
        fm_B = _torch_fm(B_fr, B_ff)
        rate = cfg.rate_for(iters)
        gen_A_total = (fm_B * 0.9 + gen_B * 0.1) * (1 - rate) + recon_A * rate
        if arch == "recongan":
            gen_loss, dis_loss = gen_A_total, dis_B
        else:  # gan
            gen_loss, dis_loss = gen_B * 0.1 + fm_B * 0.9, dis_B
        if iters % cfg.update_interval == 0:
            dis_loss.backward()
            optim_dis.step()
        else:
            gen_loss.backward()
            optim_gen.step()
        ref_log.append({"gen_B": gen_B.item(), "fm_B": fm_B.item(),
                        "recon_A": recon_A.item(), "dis_B": dis_B.item()})

    gen_step, dis_step = make_train_steps(cfg, F32)
    for iters, (A, B) in enumerate(data):
        step = dis_step if cfg.is_dis_iter(iters) else gen_step
        ts, losses = step(ts, jnp.asarray(A), jnp.asarray(B),
                          jnp.float32(cfg.rate_for(iters)))
        for k, ref_v in ref_log[iters].items():
            assert abs(float(losses[k]) - ref_v) < 5e-4, \
                f"{arch} iter {iters} {k}: {ref_v} vs {float(losses[k])}"
