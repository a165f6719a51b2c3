"""Round-5 regression pins.

1. The s2d stem must not fire in forward-only (training=False) programs:
   round 4's auto gate fired on input size alone and regressed 512px
   inference p50 2.078 -> 2.391 ms (benchmarks/inference_s2d_ab.json —
   13.9% interleaved loss); round 5 gates it on `training`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from discogan_modernized_tpu.ops.conv import conv2d


def _uses_s2d(fn, *args):
    """The s2d lowering reshapes the embedded kernel to (3,3,4*ci,co);
    the plain / subpixel-dx lowerings keep the k=4 kernel. Inspect the
    jaxpr. NOTE: callers must pass a FRESH function object per call —
    jax caches traces on (fun identity, avals), so re-tracing the same
    lambda after an env change returns the stale jaxpr."""
    txt = str(jax.make_jaxpr(fn)(*args))
    # the wbig reshape (3,3,4*ci,co) — "(3, 3" alone also matches the
    # latent convT's padding=((3, 3), (3, 3))
    return "new_sizes=(3, 3," in txt


def test_s2d_stem_gated_to_training(monkeypatch):
    monkeypatch.setenv("DISCOGAN_S2D_STEM", "auto")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 256, 256, 3), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 3, 8) * 0.1, jnp.float32)

    def train_fn():
        return lambda x, w: conv2d(x, w, stride=2, padding=1, training=True)

    def eval_fn():
        return lambda x, w: conv2d(x, w, stride=2, padding=1, training=False)

    assert _uses_s2d(train_fn(), x, w), "auto gate should fire for training at >=256px"
    assert not _uses_s2d(eval_fn(), x, w), "auto gate must NOT fire for inference"

    # numerics: both lowerings agree (s2d is exact to f32 rounding)
    np.testing.assert_allclose(np.asarray(train_fn()(x, w)),
                               np.asarray(eval_fn()(x, w)),
                               atol=1e-4, rtol=1e-4)

    # forced "1" still overrides for A/B work
    monkeypatch.setenv("DISCOGAN_S2D_STEM", "1")
    assert _uses_s2d(eval_fn(), x, w)


def test_generator_inference_has_no_s2d(monkeypatch):
    monkeypatch.setenv("DISCOGAN_S2D_STEM", "auto")
    from discogan_modernized_tpu.core.precision import default_policy
    from discogan_modernized_tpu.models import generator_init, generator_apply

    policy = default_policy()
    params, state = generator_init(jax.random.PRNGKey(0), 256)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)

    infer = lambda p, s, x: generator_apply(p, s, x, policy=policy,
                                            training=False)[0]
    assert not _uses_s2d(infer, params, state, x)
    train = lambda p, s, x: generator_apply(p, s, x, policy=policy,
                                            training=True)[0]
    assert _uses_s2d(train, params, state, x)


def test_default_xla_copts_gating(monkeypatch):
    """Round 5: the scoped-vmem copt defaults ON for >=256px training
    (it won at every measured >=256px point and washed at 64px) but any
    explicit copt opinion — flag or env, even empty — suppresses it."""
    import argparse
    from discogan_modernized_tpu.train.loop import (_DEFAULT_COPTS_256,
                                                    default_xla_copts)

    monkeypatch.delenv("DISCOGAN_XLA_COPTS", raising=False)

    def ns(**kw):
        return argparse.Namespace(**kw)

    assert default_xla_copts(ns(image_size=512, xla_copts=None)) \
        == _DEFAULT_COPTS_256
    assert default_xla_copts(ns(image_size=256, xla_copts=None)) \
        == _DEFAULT_COPTS_256
    assert default_xla_copts(ns(image_size=64, xla_copts=None)) is None
    # explicit flag wins verbatim
    assert default_xla_copts(ns(image_size=512, xla_copts="a=b")) == "a=b"
    # env presence (even empty) suppresses the default
    monkeypatch.setenv("DISCOGAN_XLA_COPTS", "")
    assert default_xla_copts(ns(image_size=512, xla_copts=None)) is None
