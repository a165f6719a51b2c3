"""Whole-train-step cost accounting (VERDICT r2 item 4).

Decomposes the G-update and D-update step times at a named config
(default: the bench headline, 64px b64 bf16) into measured components,
all via chained-scan differencing on the real chip (the only trustworthy
harness through this tunnel — tools/fwd_profile.py):

  1. step      — the full branch step (forward + backward + Adam),
                 state-carried chain of the REAL production body
  2. forward   — the 8-network loss graph alone (BN bookkeeping carried;
                 losses chained into the input so nothing DCEs)
  3. fwd+bwd   — value_and_grad with a non-Adam 1e-30 update (keeps the
                 whole backward live, removes optimizer HBM traffic)
  4. adam      — the Adam update alone (moments + params, slim-aware)

so  backward = (3) - (2)  and  optimizer = (1) - (3)  [cross-checked
against (4)].

It then accounts forward+backward against per-layer measured times:
every conv/convT instance of the step graph is enumerated with its
multiplicity (which forwards run, which backward instances need dx/dw —
see conv_accounting) and timed individually with the same harness, and
each layer's BN/activation epilogue is timed as a MARGINAL (conv+epi
chain minus bare-conv chain, forward and full-vjp) — the
"BN/elementwise between convs" cost the round-2 PERF.md named but never
sized. Output: a table where every row is measured; the remaining
residue is loss-graph ops + BN running-stat EMAs + scan bookkeeping.

Run:  python -m discogan_modernized_tpu.tools.step_itemize \
          [--image_size 64] [--batch 64] [--lean] [--slim mv]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12


def _live_sum(tree):
    """Sum of one element from EVERY leaf tensor, in f32.

    The chain's return value must transitively depend on every tensor the
    loop updates: returning a single leaf lets XLA dead-code the rest of
    the loop body. Per-tensor updates with no cross-tensor coupling (the
    Adam chains; the gen branch, whose first models leaf is an untouched
    discriminator parameter) measured as ~0-length loops until round 3
    caught it (the 8 us "G step"). One gathered scalar per tensor keeps
    every update chain live for ~50 loads.
    """
    import jax
    import jax.numpy as jnp

    return sum(jnp.ravel(l)[0].astype(jnp.float32)
               for l in jax.tree.leaves(tree))


def _timer(n1, n2, reps):
    def timed(chain, *args):
        _ = float(chain(*args, n2))  # compile + warm the LONG program
        _ = float(chain(*args, n1))

        def best_of(length):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(chain(*args, length))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(n2) - best_of(n1)) / (n2 - n1)

    return timed


# ---------------------------------------------------------------- programs

def step_chain_time(cfg, which, A, B, *, n1=5, n2=55, reps=3):
    """Chained full step (the production branch body, state carried).

    When cfg.lean_dis is set, the D step timed here is the LEAN branch —
    the same program the production scan runs on non-logged D iterations
    and the one conv_accounting's D multiplicities describe.

    The train state is DONATED and threaded across timed calls, like the
    production step programs: without donation the input and output
    states co-reside and the faithful 512px point (f32 state, ~8.2 GB)
    compile-OOMs at 2x state (16.57G > 15.75G hbm, observed round 4).
    Donation is also the more production-faithful measurement."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..core.precision import default_policy
    from ..train.step import _make_branch, init_train_state

    policy = default_policy(cfg.precision)
    body_fn = _make_branch(cfg, policy, which,
                           lean=(which == "dis" and cfg.lean_dis))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def chain(ts, A, B, length):
        # A/B are nudged by the step's losses each iteration: with them
        # loop-constant, the D branch's generator forwards (frozen gen
        # params) are loop-INVARIANT and XLA hoists them out of the loop
        # — in production, params and data change every step, so the
        # hoist never applies there and would under-measure here.
        def body(carry, _):
            ts, A, B = carry
            new_ts, losses = body_fn(ts, A, B, 0.01)
            eps = 1e-30 * (losses["gen_total"] + losses["dis_total"])
            return (new_ts, A + eps.astype(A.dtype),
                    B + eps.astype(B.dtype)), ()

        (ts, A, B), _ = lax.scan(body, (ts, A, B), None, length=length)
        live = (_live_sum(ts["models"]) + A.ravel()[0].astype(jnp.float32)
                + B.ravel()[0].astype(jnp.float32))
        return live, ts

    state = {"ts": ts}

    def call(length):
        t0 = time.perf_counter()
        live, new_ts = chain(state["ts"], A, B, length)
        state["ts"] = new_ts
        _ = float(live)
        return time.perf_counter() - t0

    call(n2)  # compile + warm the LONG program
    call(n1)

    def best_of(length):
        return min(call(length) for _ in range(reps))

    return (best_of(n2) - best_of(n1)) / (n2 - n1)


def forward_chain_time(cfg, A, B, *, dis_only=False, n1=5, n2=105, reps=3):
    """Chained loss-graph forward (BN state carried; losses chained into
    the input so no network DCEs). dis_only=True times the LEAN D-step
    forward (no ABA/BAB reconstruction forwards)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..core.precision import default_policy
    from ..train.step import _forward, init_train_state

    policy = default_policy(cfg.precision)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    models, states = ts["models"], ts["model_states"]

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain(models, states, A, B, length):
        # Both inputs are nudged: with B loop-constant (and the params
        # constant in a forward-only chain), every B-side forward
        # (G_A(B), G_B(BA), D_B(B)) is loop-invariant and hoistable.
        def body(carry, _):
            A, B, states = carry
            losses, new_states = _forward(models, states, A, B,
                                          jnp.float32(0.01), cfg, policy,
                                          dis_only=dis_only)
            eps = 1e-30 * (losses["gen_total"] + losses["dis_total"])
            return (A + eps.astype(A.dtype), B + eps.astype(B.dtype),
                    new_states), ()

        (A, B, states), _ = lax.scan(body, (A, B, states), None,
                                     length=length)
        return A.ravel()[0] + B.ravel()[0]

    return _timer(n1, n2, reps)(chain, models, states, A, B)


def grad_chain_time(cfg, which, A, B, *, n1=5, n2=55, reps=3):
    """Chained forward+backward WITHOUT Adam: params nudged by 1e-30*g
    (keeps every gradient live; optimizer HBM traffic excluded). The D
    branch honors cfg.lean_dis (same graph as step_chain_time)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..core.precision import default_policy
    from ..train.graph import trainable_subsets
    from ..train.step import _forward, init_train_state

    policy = default_policy(cfg.precision)
    gen_keys, dis_keys = trainable_subsets(cfg.model_arch)
    keys = gen_keys if which == "gen" else dis_keys
    total_key = "gen_total" if which == "gen" else "dis_total"
    dis_only = which == "dis" and cfg.lean_dis
    ts = init_train_state(jax.random.PRNGKey(0), cfg)

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
    def chain(models, states, A, B, length):
        # A/B nudged per iteration: the non-trainable nets' forwards (gen
        # nets in the D branch) read loop-constant params, so with
        # constant inputs they are loop-invariant and hoistable —
        # under-measuring the chain (see step_chain_time). models/states
        # donated + threaded like step_chain_time (faithful-512px 2x-state
        # OOM).
        def body(carry, _):
            models, states, A, B = carry
            frozen = {k: v for k, v in models.items() if k not in keys}

            def loss_fn(trainable):
                m = {**frozen, **trainable}
                losses, new_states = _forward(m, states, A, B, 0.01, cfg,
                                              policy, dis_only=dis_only)
                return losses[total_key], new_states

            trainable = {k: models[k] for k in keys}
            (loss, new_states), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            new_tr = jax.tree.map(
                lambda p, g: p - (1e-30 * g).astype(p.dtype),
                trainable, grads)
            eps = 1e-30 * loss
            return ({**frozen, **new_tr}, new_states,
                    A + eps.astype(A.dtype), B + eps.astype(B.dtype)), ()

        (models, states, A, B), _ = lax.scan(
            body, (models, states, A, B), None, length=length)
        live = (_live_sum({k: models[k] for k in keys})
                + A.ravel()[0].astype(jnp.float32)
                + B.ravel()[0].astype(jnp.float32))
        return live, models, states

    state = {"models": ts["models"], "states": ts["model_states"]}

    def call(length):
        t0 = time.perf_counter()
        live, m, s = chain(state["models"], state["states"], A, B, length)
        state["models"], state["states"] = m, s
        _ = float(live)
        return time.perf_counter() - t0

    call(n2)
    call(n1)

    def best_of(length):
        return min(call(length) for _ in range(reps))

    return (best_of(n2) - best_of(n1)) / (n2 - n1)


def adam_chain_time(cfg, which, *, n1=10, n2=210, reps=3):
    """Chained Adam update alone (grads derived from params with one
    cheap elementwise op — approximates the hot-gradient read)."""
    import jax
    from jax import lax

    from ..train.graph import trainable_subsets
    from ..train.optim import adam_update
    from ..train.step import init_train_state

    gen_keys, dis_keys = trainable_subsets(cfg.model_arch)
    keys = gen_keys if which == "gen" else dis_keys
    opt_key = "opt_gen" if which == "gen" else "opt_dis"
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    trainable = {k: ts["models"][k] for k in keys}

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(trainable, opt, length):
        def body(carry, _):
            tr, opt = carry
            grads = jax.tree.map(lambda p: p * 1e-8, tr)
            new_tr, new_opt = adam_update(
                tr, grads, opt, lr=cfg.learning_rate, beta1=cfg.beta1,
                beta2=cfg.beta2, weight_decay=cfg.weight_decay)
            return (new_tr, new_opt), ()

        (tr, _), _ = lax.scan(body, (trainable, opt), None, length=length)
        # Adam updates are per-tensor independent: returning one leaf
        # dead-codes every other tensor's update (measured ~0 until
        # round 3). One element per leaf keeps them all live.
        return _live_sum(tr)

    return _timer(n1, n2, reps)(chain, trainable, ts[opt_key])


# --------------------------------------------------------- conv accounting

def _gen_layers(image_size):
    """Distinct conv ops in ONE generator forward: (name, kind, in_size,
    cin, cout, epi). kind: conv (k4s2p1) / latent (k4 VALID) / convt
    (k4s2p1 transpose) / latent_t (k4 VALID transpose) / head (subpixel k2
    dense). epi is the production epilogue chained onto the conv output
    (models/generator.py): lrelu / bn_lrelu / bn_relu / sigmoid."""
    from ..models.geometry import encoder_channels, LATENT_CH

    chans = encoder_channels(image_size)
    rows = []
    size, cin = image_size, 3
    for i, c in enumerate(chans):
        epi = "lrelu" if i == 0 else "bn_lrelu"
        rows.append((f"enc{i} {size}px {cin}->{c}", "conv", size, cin, c,
                     epi))
        size //= 2
        cin = c
    rows.append((f"latent {size}px {cin}->{LATENT_CH}", "latent", size,
                 cin, LATENT_CH, "bn_lrelu"))
    # decoder mirrors
    dec_in = LATENT_CH
    rev = list(reversed(chans))
    rows.append((f"dec0 1px {dec_in}->{rev[0]}", "latent_t", 1, dec_in,
                 rev[0], "bn_relu"))
    size = image_size // (2 ** len(chans))  # 4 at 64px
    cin = rev[0]
    for i, c in enumerate(rev[1:], 1):
        rows.append((f"dec{i} {size}px {cin}->{c}", "convt", size, cin, c,
                     "bn_relu"))
        size *= 2
        cin = c
    rows.append((f"head {size}px {cin}->3", "head", size, cin, 3,
                 "sigmoid"))
    return rows


def _dis_layers(image_size):
    from ..models.geometry import encoder_channels

    chans = encoder_channels(image_size)
    rows = []
    size, cin = image_size, 3
    for i, c in enumerate(chans):
        epi = "lrelu" if i == 0 else "bn_lrelu"
        rows.append((f"dis{i} {size}px {cin}->{c}", "conv", size, cin, c,
                     epi))
        size //= 2
        cin = c
    rows.append((f"dis_head {size}px {cin}->1", "latent", size, cin, 1,
                 "sigmoid"))
    return rows


def _op_fns(kind, size, cin, cout, dtype):
    """fwd(x, w) for one layer op — the production lowering (ops/conv.py:
    subpixel head, dilated convT elsewhere). Weights are HWIO
    (k, k, in, out) for conv AND convT alike (ops/conv.py layout)."""
    from ..ops import conv as C

    if kind == "conv":
        def fwd(x, w):
            return C.conv2d(x, w, stride=2, padding=1)
    elif kind == "latent":
        def fwd(x, w):
            return C.conv2d(x, w, stride=1, padding=0)
    elif kind == "latent_t":
        def fwd(x, w):
            return C.conv_transpose2d(x, w, stride=1, padding=0)
    elif kind in ("convt", "head"):
        def fwd(x, w):
            return C.conv_transpose2d(x, w, stride=2, padding=1)
    else:
        raise ValueError(kind)
    return fwd


def _w_shape(kind, size, cin, cout):
    return (size, size, cin, cout) if kind == "latent" else (4, 4, cin, cout)


def time_layer_modes(kind, size, cin, cout, batch, dtype, timed):
    """Measured (fwd_us, dx_us, dw_us) for one layer op."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    fwd = _op_fns(kind, size, cin, cout, dtype)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(batch, size, size, cin), dtype)
    w = jnp.asarray(rng.randn(*_w_shape(kind, size, cin, cout)) * 0.05,
                    dtype)
    y = fwd(x, w)
    dy = jnp.asarray(rng.randn(*y.shape), y.dtype)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_fwd(x, w, length):
        def body(h, _):
            out = fwd(h, w)
            return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                        ).astype(h.dtype), ()

        h, _ = lax.scan(body, x, None, length=length)
        return jnp.sum(h.astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_dx(x, w, dy, length):
        # dx of a linear conv is input-independent — chain through the
        # WEIGHTS, else XLA hoists the computation (PERF.md harness
        # lesson: observed 1850 "TF/s").
        def body(w, _):
            _, vjp = jax.vjp(lambda x_: fwd(x_, w), x)
            dx = vjp(dy)[0]
            return w + (1e-30 * jnp.max(dx.astype(jnp.float32))
                        ).astype(w.dtype), ()

        w, _ = lax.scan(body, w, None, length=length)
        return jnp.sum(w.astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_dw(x, w, dy, length):
        def body(x, _):
            _, vjp = jax.vjp(lambda w_: fwd(x, w_), w)
            dw = vjp(dy)[0]
            return x + (1e-30 * jnp.max(dw.astype(jnp.float32))
                        ).astype(x.dtype), ()

        x, _ = lax.scan(body, x, None, length=length)
        return jnp.sum(x.astype(jnp.float32))

    return (timed(chain_fwd, x, w) * 1e6,
            timed(chain_dx, x, w, dy) * 1e6,
            timed(chain_dw, x, w, dy) * 1e6)


def _epi_apply(epi, dtype):
    """The production epilogue as a pure fn of (h, scale, bias): BN in
    training mode with the one-pass f32 stats exactly as ops/batchnorm.py
    (the running-stat EMA update — two length-C vector ops — is excluded;
    it lands in the residue), then the layer's activation
    (models/generator.py / models/discriminator.py)."""
    import jax.numpy as jnp
    from jax import lax

    from ..ops.activations import leaky_relu, relu, sigmoid

    def bn(h, scale, bias):
        x32 = h.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        sq = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        inv = lax.rsqrt(var + 1e-5)
        s = scale.astype(jnp.float32) * inv
        y = x32 * s + (bias.astype(jnp.float32) - mean * s)
        return y.astype(dtype)

    if epi == "lrelu":
        def f(h, scale, bias):
            return leaky_relu(h, 0.2)
    elif epi == "bn_lrelu":
        def f(h, scale, bias):
            return leaky_relu(bn(h, scale, bias), 0.2)
    elif epi == "bn_relu":
        def f(h, scale, bias):
            return relu(bn(h, scale, bias))
    elif epi == "sigmoid":
        def f(h, scale, bias):
            return sigmoid(h.astype(jnp.float32))
    else:
        raise ValueError(epi)
    return f


def time_layer_epilogue(kind, size, cin, cout, batch, dtype, epi, timed):
    """Measured (epi_fwd_us, epi_bwd_us): the marginal cost of the
    production BN/activation epilogue over the bare conv, forward and
    backward.

    Four chains — bare fwd, conv+epi fwd, bare fwd+full-vjp,
    conv+epi fwd+full-vjp. BOTH vjp chains keep the primal output live
    (chained like the cotangents), so each includes exactly one forward
    and the differences isolate the epilogue:
        epi_fwd = t(comp_fwd) - t(bare_fwd)
        epi_bwd = [t(comp_vjp) - t(bare_vjp)] - epi_fwd
    Every differentiated operand is carried through the scan so nothing
    hoists (PERF.md harness lessons: conv dx is input-independent — chain
    it into the weights; dw is weight-independent — chain it into x)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    fwd = _op_fns(kind, size, cin, cout, dtype)
    epi_fn = _epi_apply(epi, dtype)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(batch, size, size, cin), dtype)
    w = jnp.asarray(rng.randn(*_w_shape(kind, size, cin, cout)) * 0.05,
                    dtype)
    scale = jnp.ones((cout,), jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def bare(x, w, scale, bias):
        return fwd(x, w)

    def comp(x, w, scale, bias):
        return epi_fn(fwd(x, w), scale, bias)

    def make_chain_fwd(f):
        @functools.partial(jax.jit, static_argnums=(4,))
        def chain(x, w, scale, bias, length):
            def body(h, _):
                out = f(h, w, scale, bias)
                return h + (1e-30 * jnp.max(out.astype(jnp.float32))
                            ).astype(h.dtype), ()

            h, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(h.astype(jnp.float32))

        return chain

    def make_chain_vjp(f):
        # dy is an ARGUMENT, not a closure: a closed-over concrete array
        # becomes an HLO constant, and at 512px shapes (enc0 dy = 268 MB
        # bf16) the serialized module exceeds the remote-compile service's
        # upload limit (HTTP 413, observed round 4). The conv chains
        # (chain_dx/chain_dw) already thread dy for the same reason.
        @functools.partial(jax.jit, static_argnums=(5,))
        def chain(x, w, scale, bias, dy, length):
            def body(carry, _):
                x, w, scale, bias = carry
                out, vjp = jax.vjp(f, x, w, scale, bias)
                dx, dw, ds, db = vjp(dy)
                live = jnp.max(out.astype(jnp.float32))
                x2 = x + (1e-30 * (jnp.max(dw.astype(jnp.float32)) + live)
                          ).astype(x.dtype)
                w2 = w + (1e-30 * jnp.max(dx.astype(jnp.float32))
                          ).astype(w.dtype)
                s2 = scale + 1e-30 * jnp.max(ds.astype(jnp.float32))
                b2 = bias + 1e-30 * jnp.max(db.astype(jnp.float32))
                return (x2, w2, s2, b2), ()

            (x, w, scale, bias), _ = lax.scan(
                body, (x, w, scale, bias), None, length=length)
            return (x.ravel()[0].astype(jnp.float32)
                    + w.ravel()[0].astype(jnp.float32)
                    + scale[0] + bias[0])

        return chain

    y_b = bare(x, w, scale, bias)
    dy_b = jnp.asarray(rng.randn(*y_b.shape), y_b.dtype)
    y_c = comp(x, w, scale, bias)
    dy_c = jnp.asarray(rng.randn(*y_c.shape), y_c.dtype)

    t_bf = timed(make_chain_fwd(bare), x, w, scale, bias)
    t_cf = timed(make_chain_fwd(comp), x, w, scale, bias)
    t_bv = timed(make_chain_vjp(bare), x, w, scale, bias, dy_b)
    t_cv = timed(make_chain_vjp(comp), x, w, scale, bias, dy_c)

    epi_fwd = (t_cf - t_bf) * 1e6
    epi_bwd = ((t_cv - t_bv) - (t_cf - t_bf)) * 1e6
    return epi_fwd, epi_bwd


def conv_accounting(image_size, batch, dtype, *, n1=100, n2=1100, reps=5):
    """Per-layer measured times x step-graph multiplicities.

    1000-op chain difference: the round-2 conv_kernel_bench lesson —
    200-op windows produce NEGATIVE marginals on sub-10us layers (the
    differenced quantity is ~4ms against a ~30ms dispatch+sync floor);
    at 1000 ops the smallest real layer is ~10x the noise floor.

    G-step multiplicities (model_arch=discogan, 64px-class, remat off):
      forwards: 4 generator + 4 discriminator instances.
      backward: through each of the 4 gen forwards — dw on every layer;
        dx on every layer EXCEPT enc0 of the two FIRST-stage forwards
        (their input images are constants; the two second-stage
        ABA/BAB forwards do need enc0 dx, into AB/BA). Through the two
        FAKE D forwards — dx only (D params frozen; real-D forwards get
        no backward at all: nothing upstream requires grad).
    D-step (lean) multiplicities:
      forwards: 2 generator + 4 discriminator instances.
      backward: dw on every D layer x4; dx on every D layer except
        dis0 x4 (inputs are constants/stop-gradient fakes); no
        generator backward.
    """
    timed = _timer(n1, n2, reps)
    gen_rows = _gen_layers(image_size)
    dis_rows = _dis_layers(image_size)

    measured = {}
    for (name, kind, size, cin, cout, epi) in gen_rows + dis_rows:
        conv_t = time_layer_modes(kind, size, cin, cout, batch, dtype,
                                  timed)
        epi_t = time_layer_epilogue(kind, size, cin, cout, batch, dtype,
                                    epi, timed)
        measured[name] = conv_t + epi_t
        print(json.dumps({"layer": name, "epi": epi,
                          "fwd_us": round(conv_t[0], 1),
                          "dx_us": round(conv_t[1], 1),
                          "dw_us": round(conv_t[2], 1),
                          "epi_fwd_us": round(epi_t[0], 1),
                          "epi_bwd_us": round(epi_t[1], 1)}),
              flush=True)

    def total(rows, *, fwd_n, dx_n, dw_n, enc0_dx_n=None):
        """(conv_us, epi_us) over the rows at the given multiplicities.
        The epilogue backward runs once per backward INSTANCE — whenever
        the layer needs dx or dw, the BN/activation vjp must first
        produce d(conv_out) — so its count is max(dx_n, dw_n) regardless
        of the enc0 dx exemption (first layers skip dx but keep dw)."""
        conv_t, epi_t = 0.0, 0.0
        bwd_n = max(dx_n, dw_n)
        for i, (name, kind, *_rest) in enumerate(rows):
            f, dx, dw, ef, eb = measured[name]
            dxn = dx_n if not (i == 0 and enc0_dx_n is not None) \
                else enc0_dx_n
            conv_t += fwd_n * f + dxn * dx + dw_n * dw
            epi_t += fwd_n * ef + bwd_n * eb
        return conv_t, epi_t

    g_gen = total(gen_rows, fwd_n=4, dx_n=4, dw_n=4, enc0_dx_n=2)
    g_dis = total(dis_rows, fwd_n=4, dx_n=2, dw_n=0)
    d_gen = total(gen_rows, fwd_n=2, dx_n=0, dw_n=0)
    d_dis = total(dis_rows, fwd_n=4, dx_n=4, dw_n=4, enc0_dx_n=0)
    f_gen = total(gen_rows, fwd_n=4, dx_n=0, dw_n=0)
    f_dis = total(dis_rows, fwd_n=4, dx_n=0, dw_n=0)
    return {"gen_conv_us": g_gen[0] + g_dis[0],
            "gen_epi_us": g_gen[1] + g_dis[1],
            "dis_conv_us": d_gen[0] + d_dis[0],
            "dis_epi_us": d_gen[1] + d_dis[1],
            "fwd_conv_us": f_gen[0] + f_dis[0],
            "fwd_epi_us": f_gen[1] + f_dis[1],
            "per_layer": {
                k: tuple(round(v, 1) for v in vs)
                for k, vs in measured.items()}}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--slim", type=str, default="mv")
    ap.add_argument("--lean", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--remat", choices=["auto", "on", "off"],
                    default="auto",
                    help="512px fast point runs remat OFF (the layer "
                         "multiplicities assume no forward recompute); "
                         "auto would turn it on at >=256px")
    ap.add_argument("--skip_layers", action="store_true",
                    help="only the 4 program-level chains")
    ap.add_argument("--win_scale", type=float, default=None,
                    help="divide every chain window by this; default "
                         "auto = (size^2*batch)/(64^2*64) so 512px runs "
                         "in minutes, not hours (per-op cost scales "
                         "with pixels*batch; the differenced marginal "
                         "only needs to clear the ~30ms dispatch floor)")
    args = ap.parse_args(argv)

    w = args.win_scale
    if w is None:
        w = max(1.0, (args.image_size / 64) ** 2 * (args.batch / 64))

    def win(n, lo):
        return max(lo, round(n / w))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..core.precision import default_policy
    from ..train.step import TrainConfig

    cfg = TrainConfig(image_size=args.image_size, model_arch="discogan",
                      slim_state=args.slim, lean_dis=args.lean,
                      remat={"auto": None, "on": True,
                             "off": False}[args.remat])
    policy = default_policy(cfg.precision)
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(args.batch, args.image_size, args.image_size,
                             3), jnp.float32)
    B = jnp.asarray(rng.rand(args.batch, args.image_size, args.image_size,
                             3), jnp.float32)

    fwd_w = dict(n1=win(5, 2), n2=win(105, 8))
    chain_w = dict(n1=win(5, 2), n2=win(55, 8))
    adam_w = dict(n1=win(10, 3), n2=win(210, 12))

    out = {}
    out["t_fwd_ms"] = forward_chain_time(cfg, A, B, **fwd_w) * 1e3
    print(json.dumps({"t_fwd_ms": round(out["t_fwd_ms"], 3)}), flush=True)
    out["t_fwd_lean_ms"] = (forward_chain_time(cfg, A, B, dis_only=True,
                                               **fwd_w)
                            * 1e3 if cfg.lean_dis else out["t_fwd_ms"])
    if cfg.lean_dis:
        print(json.dumps({"t_fwd_lean_ms": round(out["t_fwd_lean_ms"], 3)}),
              flush=True)
    for which in ("gen", "dis"):
        t_fwd = out["t_fwd_ms" if which == "gen" else "t_fwd_lean_ms"]
        t_step = step_chain_time(cfg, which, A, B, **chain_w) * 1e3
        t_grad = grad_chain_time(cfg, which, A, B, **chain_w) * 1e3
        t_adam = adam_chain_time(cfg, which, **adam_w) * 1e3
        out[f"t_step_{which}_ms"] = t_step
        out[f"t_grad_{which}_ms"] = t_grad
        out[f"t_adam_{which}_ms"] = t_adam
        print(json.dumps({f"t_step_{which}_ms": round(t_step, 3),
                          f"t_grad_{which}_ms": round(t_grad, 3),
                          f"t_adam_{which}_ms": round(t_adam, 3),
                          f"bwd_{which}_ms": round(t_grad - t_fwd, 3),
                          f"opt_{which}_ms": round(t_step - t_grad, 3)}),
              flush=True)

    if not args.skip_layers:
        acc = conv_accounting(args.image_size, args.batch,
                              policy.compute_dtype,
                              n1=win(100, 3), n2=win(1100, 24))
        out.update(acc)
        for which in ("gen", "dis"):
            step_ms = out[f"t_step_{which}_ms"]
            conv_ms = acc[f"{which}_conv_us"] / 1e3
            epi_ms = acc[f"{which}_epi_us"] / 1e3
            adam_ms = out[f"t_step_{which}_ms"] - out[f"t_grad_{which}_ms"]
            residue = step_ms - conv_ms - epi_ms - adam_ms
            print(json.dumps({
                "summary": which,
                "step_ms": round(step_ms, 3),
                "conv_emitter_ms": round(conv_ms, 3),
                "bn_act_epilogue_ms": round(epi_ms, 3),
                "optimizer_ms": round(adam_ms, 3),
                "residue_ms": round(residue, 3),
                "accounted_share": round((conv_ms + epi_ms + adam_ms)
                                         / step_ms, 3)}), flush=True)
    return out


if __name__ == "__main__":
    main()
