"""Remat (jax.checkpoint) path must be numerically identical to the
default path — it only changes what is stored vs recomputed."""

import numpy as np

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.core.precision import F32
from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps


def test_remat_step_equals_plain_step():
    data = np.random.RandomState(0)
    A = jnp.asarray(data.rand(4, 16, 16, 3).astype(np.float32))
    B = jnp.asarray(data.rand(4, 16, 16, 3).astype(np.float32))

    results = {}
    for remat in (False, True):
        cfg = TrainConfig(image_size=16, precision="f32", remat=remat)
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        gen_step, dis_step = make_train_steps(cfg, F32, jit=True)
        ts, _ = dis_step(ts, A, B, jnp.float32(0.01))
        ts, losses = gen_step(ts, A, B, jnp.float32(0.01))
        results[remat] = (jax.tree.leaves(ts["models"]),
                          {k: float(v) for k, v in losses.items()})

    for k in results[False][1]:
        assert abs(results[False][1][k] - results[True][1][k]) < 1e-6, k
    for a, b in zip(results[False][0], results[True][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_remat_auto_threshold():
    assert not TrainConfig(image_size=64).use_remat
    assert TrainConfig(image_size=256).use_remat
    assert TrainConfig(image_size=512).use_remat
    assert TrainConfig(image_size=512, remat=False).use_remat is False


def test_remat_policies_equal_plain():
    """Granularity policies ('latent', 'conv') only change what is stored
    vs recomputed — losses and updated params must be bit-comparable."""
    data = np.random.RandomState(2)
    A = jnp.asarray(data.rand(2, 16, 16, 3).astype(np.float32))
    B = jnp.asarray(data.rand(2, 16, 16, 3).astype(np.float32))

    results = {}
    for pol in (None, "latent", "conv"):
        cfg = TrainConfig(image_size=16, precision="f32", remat=True,
                          remat_policy=pol)
        ts = init_train_state(jax.random.PRNGKey(3), cfg)
        gen_step, dis_step = make_train_steps(cfg, F32)
        ts, _ = dis_step(ts, A, B, jnp.float32(0.01))
        ts, losses = gen_step(ts, A, B, jnp.float32(0.01))
        results[pol] = ({k: float(v) for k, v in losses.items()},
                        jax.tree.leaves(ts["models"]))

    for pol in ("latent", "conv"):
        for k in results[None][0]:
            assert abs(results[None][0][k] - results[pol][0][k]) < 1e-6, (pol, k)
        for a, b in zip(results[None][1], results[pol][1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)


def test_remat_dis_off_equals_full_remat():
    """remat_dis=False stores the discriminator activations instead of
    recomputing them — a pure schedule change; trajectories must match
    bitwise (step.py _resolve_remat_dis)."""
    data = np.random.RandomState(4)
    A = jnp.asarray(data.rand(4, 32, 32, 3).astype(np.float32))
    B = jnp.asarray(data.rand(4, 32, 32, 3).astype(np.float32))

    results = {}
    for rd in (True, False):
        cfg = TrainConfig(image_size=32, precision="f32", remat=True,
                          remat_dis=rd)
        ts = init_train_state(jax.random.PRNGKey(5), cfg)
        gen_step, dis_step = make_train_steps(cfg, F32)
        for j in range(6):
            step = dis_step if cfg.is_dis_iter(j) else gen_step
            ts, losses = step(ts, A, B, jnp.float32(cfg.rate_for(j)))
        results[rd] = ({k: float(v) for k, v in losses.items()},
                       jax.tree.leaves(ts["models"]))

    for k in results[True][0]:
        assert results[True][0][k] == results[False][0][k], k
    for a, b in zip(results[True][1], results[False][1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dis_activation_bytes_estimate():
    from discogan_modernized_tpu.train.step import _dis_activation_bytes

    # 512px b32 bf16: the documented ~2GB operating point.
    b = _dis_activation_bytes(512, 32, 2)
    assert 1.5 * 2**30 < b < 3 * 2**30
    # 64px b64 is tiny — auto mode must disable D remat there too.
    assert _dis_activation_bytes(64, 64, 2) < 100 * 2**20
