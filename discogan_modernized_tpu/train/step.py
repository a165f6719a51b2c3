"""Jitted train steps: the alternating G/D update as two cached XLA programs.

The reference builds both loss graphs every iteration and backwards only
one (ref image_translation.py:384-390 — D on iters % update_interval == 0,
G otherwise), wasting the untaken branch's backward-graph build. Here the
choice is made host-side between two jit-compiled programs (`dis_step`,
`gen_step`), each of which runs the full forward graph once (all eight
logged loss components come out of either) and the backward of only its
own loss. Nothing recompiles across the curriculum boundary because `rate`
is a traced operand.

Gradient semantics match torch: `jax.grad` over the trainable-model subset
computes exactly the gradients torch's `.backward()` would deposit on those
parameters (for the D step the fake images are constants wrt D params, so
no generator backward is built at all — cheaper than the reference, which
backprops dis_loss into the generators and discards it).

Buffers are donated so parameters and optimizer moments update in place in
HBM. Data parallelism wraps these same step bodies in shard_map
(parallel/dp.py) with gradient pmean on the mesh axis.
"""

from __future__ import annotations

import dataclasses
import os

import jax
from jax import lax

from ..core.precision import Policy, default_policy
from ..models.generator import generator_init, generator_apply
from ..models.discriminator import discriminator_init
from .graph import discogan_losses, mix_losses, trainable_subsets
from .optim import adam_init, adam_update

# Image sizes >= this are the "large" regime: remat defaults on (8 network
# forwards' activations + the optimizer state exceed a 16GB v5e chip at
# f32 state), scan chunking switches from ~24 steps to 2 update periods,
# and the trainer probe-compiles before committing HBM. Module-level so
# tests can monkeypatch the threshold instead of paying real >=256px
# compiles on the CPU backend.
LARGE_IMAGE = 256


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    image_size: int = 64
    model_arch: str = "discogan"
    learning_rate: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    weight_decay: float = 1e-5
    gan_curriculum: int = 10000
    starting_rate: float = 0.01
    default_rate: float = 0.5
    update_interval: int = 3
    skip_first_fm: bool = False  # angle_pairing.py:114-115 variant
    precision: str | None = None
    axis_name: str | None = None  # set when wrapped in shard_map
    # BN statistics mode under data parallelism:
    #   False ("local", default): per-replica batch stats, exactly what the
    #     reference's DDP does (DDP never syncs BN) — grads pmean'd like
    #     DDP's allreduce-average.
    #   True ("sync"): cross-replica stats and globally-reduced losses, which
    #     makes DP training step-for-step equal to single-device training on
    #     the same global batch — grads psum'd (each device holds the grad of
    #     the identical global loss restricted to its local paths).
    bn_sync: bool = False
    # Rematerialize network forwards in the backward pass. None = auto
    # (on for image_size >= 256, where activations of 8 forwards plus
    # ~8GB of params/Adam state exceed a 16GB v5e chip).
    remat: bool | None = None
    # remat granularity: None = full-network; "latent" = save the tiny 1x1
    # generator latents so encoder/decoder halves rematerialize separately;
    # "conv" = save every conv output so the backward recomputes only the
    # elementwise BN/activation chains (see train/graph._checkpoint_policies).
    remat_policy: str | None = None
    # Rematerialize the DISCRIMINATOR forwards too. None = auto: skip D
    # remat when the 4 D-forward activation sets fit comfortably in HBM
    # (they are encoder-only, ~2GB at 512px b32) — numerically identical,
    # removes every D-forward recompute from the backward. Env override:
    # DISCOGAN_REMAT_DIS=0/1.
    remat_dis: bool | None = None

    # Fuse each A-side/B-side forward pair into one vmapped (grouped-conv)
    # pass — numerically equivalent, fewer/bigger kernels (graph.py
    # discogan_losses_paired).
    paired: bool = False
    # Run each discriminator's real+fake forwards as ONE conv-batched
    # pass (2B effective MXU batch) with per-half BN statistics — exactly
    # the sequential semantics (models/discriminator.py
    # discriminator_apply_pair). Measured 2.2% SLOWER at 64px b64 (XLA
    # already overlaps the independent forwards; the concat/slice
    # relayout costs an extra HBM pass — PERF.md), so off by default.
    # Env override: DISCOGAN_CONCAT_DIS=0/1.
    concat_dis: bool = False
    # Opt-in lean D-step: skip the ABA/BAB reconstruction forwards on
    # non-logged discriminator iterations. The weight trajectory is
    # bit-identical (training-mode BN uses batch stats; dis_loss never
    # reads ABA/BAB); only BN running-stat bookkeeping differs — see
    # graph.discogan_losses(dis_only=...). Logged iterations always run
    # the full graph so the training_log contract stays exact.
    lean_dis: bool = False
    # Logging cadence, used only by the lean-dis scan program to route
    # log iterations through the full graph (ref default 50).
    log_interval: int = 50
    # Low-precision optimizer/master state, the 512px HBM-ceiling breaker
    # (PERF.md: ~8GB of f32 params + Adam moments is what blocks b64 and
    # remat_policy="conv" on a 16GB v5e chip):
    #   None/"off": f32 moments, f32 master params (default; the
    #               fidelity-gate configuration)
    #   "mv":  Adam m/v stored bfloat16; update math stays f32
    #   "all": "mv" + master params stored bfloat16, written back with
    #          STOCHASTIC rounding (unbiased — round-to-nearest at bf16
    #          precision drops sub-0.4%-of-magnitude updates and stalls
    #          training; see train/optim.py)
    # Env override: DISCOGAN_SLIM_STATE=off|mv|all.
    slim_state: str | None = None

    @property
    def use_remat(self) -> bool:
        return (self.image_size >= LARGE_IMAGE if self.remat is None
                else self.remat)

    def rate_for(self, iters: int) -> float:
        """Curriculum rate (ref image_translation.py:367)."""
        return self.starting_rate if iters < self.gan_curriculum else self.default_rate

    def is_dis_iter(self, iters: int) -> bool:
        """D trains on iters % update_interval == 0 (ref :385)."""
        return iters % self.update_interval == 0

    def use_lean_dis(self, iters: int) -> bool:
        """True when the lean D-step program handles this iteration:
        lean_dis is on, it's a D iteration, and it's NOT a logged one
        (logged lines need the full graph's recon values — the
        training_log contract). Host-side routing used by the CLI loop,
        bench, and env_ab; the fused scan program implements the traced
        equivalent of this same predicate (make_scan_train_step)."""
        return (self.lean_dis and self.is_dis_iter(iters)
                and iters % self.log_interval != 0)


def resolve_slim_state(cfg: TrainConfig) -> str:
    """"off" | "mv" | "all". An EXPLICIT cfg.slim_state wins; the
    DISCOGAN_SLIM_STATE env only fills in when cfg leaves it None (the
    A/B-tool configuration) — a leftover exported env var must not
    silently reconfigure a bench row or CLI run that named its state."""

    s = cfg.slim_state
    if s is None:
        s = os.environ.get("DISCOGAN_SLIM_STATE") or "off"
    s = s.lower()
    if s in ("", "off", "f32", "0", "none"):
        return "off"
    if s in ("mv", "bf16_mv"):
        return "mv"
    if s in ("all", "bf16", "1"):
        return "all"
    raise ValueError(f"slim_state must be off|mv|all, got {s!r}")


def init_train_state(key, cfg: TrainConfig):
    """Models + BN states + two Adam states, as one pytree."""
    import jax.numpy as jnp

    kga, kgb, kda, kdb = jax.random.split(key, 4)
    gen_A, s_ga = generator_init(kga, cfg.image_size)
    gen_B, s_gb = generator_init(kgb, cfg.image_size)
    dis_A, s_da = discriminator_init(kda, cfg.image_size)
    dis_B, s_db = discriminator_init(kdb, cfg.image_size)
    models = {"gen_A": gen_A, "gen_B": gen_B, "dis_A": dis_A, "dis_B": dis_B}
    states = {"gen_A": s_ga, "gen_B": s_gb, "dis_A": s_da, "dis_B": s_db}
    slim = resolve_slim_state(cfg)
    if slim == "all":
        # bf16 master params (stochastically-rounded updates). BN states
        # stay f32 — they are tiny and the running-stat EMA needs the
        # precision.
        models = jax.tree.map(lambda a: a.astype(jnp.bfloat16), models)
    mv_dtype = jnp.bfloat16 if slim in ("mv", "all") else jnp.float32
    gen_keys, dis_keys = trainable_subsets(cfg.model_arch)
    return {
        "models": models,
        "model_states": states,
        "opt_gen": adam_init({k: models[k] for k in gen_keys}, mv_dtype),
        "opt_dis": adam_init({k: models[k] for k in dis_keys}, mv_dtype),
    }


def _dis_activation_bytes(image_size: int, batch: int, itemsize: int) -> int:
    """Estimated bytes of the 4 discriminator forwards' stored activations
    (conv outputs; BN/act chains fuse and add little)."""
    from ..models.geometry import encoder_channels

    size, total = image_size, 0
    for ch in encoder_channels(image_size):
        size //= 2
        total += size * size * ch
    return 4 * batch * total * itemsize


def _resolve_remat_dis(cfg: TrainConfig, batch: int, policy: Policy):
    """None (follow cfg.remat) / False (store D activations). Auto skips D
    remat when the stored activations stay under ~3GB — comfortably
    inside a 16GB v5e chip next to ~9GB of 512px params/Adam state."""

    env = os.environ.get("DISCOGAN_REMAT_DIS")
    if env is not None:
        return env != "0"
    if cfg.remat_dis is not None:
        return cfg.remat_dis
    itemsize = jax.numpy.dtype(policy.compute_dtype).itemsize
    if _dis_activation_bytes(cfg.image_size, batch, itemsize) <= 3 * 2**30:
        return False
    return None


def _forward(models, states, A, B, rate, cfg: TrainConfig, policy: Policy,
             dis_only: bool = False):
    from .graph import discogan_losses_paired


    sync_axis = cfg.axis_name if cfg.bn_sync else None
    loss_graph = discogan_losses_paired if cfg.paired else discogan_losses
    extra = {}
    if not cfg.paired:
        env = os.environ.get("DISCOGAN_CONCAT_DIS")
        extra["concat_dis"] = (env != "0") if env is not None else cfg.concat_dis
    losses, new_states = loss_graph(
        models, states, A, B,
        policy=policy, skip_first_fm=cfg.skip_first_fm, axis_name=sync_axis,
        remat=cfg.use_remat, remat_policy=cfg.remat_policy,
        remat_dis=_resolve_remat_dis(cfg, A.shape[0], policy),
        dis_only=dis_only, **extra,
    )
    gen_total, dis_total = mix_losses(losses, rate, cfg.model_arch)
    losses = dict(losses, gen_total=gen_total, dis_total=dis_total)
    return losses, new_states


def _make_branch(cfg: TrainConfig, policy: Policy, which: str,
                 lean: bool = False):
    gen_keys, dis_keys = trainable_subsets(cfg.model_arch)
    keys = gen_keys if which == "gen" else dis_keys
    opt_key = "opt_gen" if which == "gen" else "opt_dis"
    total_key = "gen_total" if which == "gen" else "dis_total"
    dis_only = lean and which == "dis"

    def step(ts, A, B, rate):
        frozen = {k: v for k, v in ts["models"].items() if k not in keys}

        def loss_fn(trainable):
            models = {**frozen, **trainable}
            losses, new_states = _forward(models, ts["model_states"], A, B,
                                          rate, cfg, policy,
                                          dis_only=dis_only)
            return losses[total_key], (losses, new_states)

        trainable = {k: ts["models"][k] for k in keys}
        (_, (losses, new_states)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        if cfg.axis_name is not None:
            reduce = lax.psum if cfg.bn_sync else lax.pmean
            grads = reduce(grads, cfg.axis_name)
        new_trainable, new_opt = adam_update(
            trainable, grads, ts[opt_key],
            lr=cfg.learning_rate, beta1=cfg.beta1, beta2=cfg.beta2,
            weight_decay=cfg.weight_decay,
            # stochastic_round derives from the params' own dtype inside
            # adam_update — the traced STATE, not a re-read of the env,
            # decides (an env change between init and trace cannot pair
            # bf16 params with silent round-to-nearest writes).
        )
        new_ts = {
            "models": {**ts["models"], **new_trainable},
            "model_states": new_states,
            "opt_gen": new_opt if which == "gen" else ts["opt_gen"],
            "opt_dis": new_opt if which == "dis" else ts["opt_dis"],
        }
        return new_ts, losses

    return step


def env_compiler_options() -> dict | None:
    """XLA option overrides for the production path:
    DISCOGAN_XLA_COPTS="key=value,key2=value2" (jax.jit compiler_options —
    they ride the compile request, so they work through remote-compile
    backends where host XLA_FLAGS would not). Measured win on this chip:
    xla_tpu_scoped_vmem_limit_kib=32768 is +2% on the 512px b32
    slim+no-remat point, a wash at 64px (PERF.md round-2 copt sweep).
    Returns None when unset so jit-cache keys stay unchanged."""
    s = os.environ.get("DISCOGAN_XLA_COPTS")
    if not s:
        return None
    out = {}
    for item in s.split(","):
        item = item.strip()
        if not item:
            continue
        k, _, v = item.partition("=")
        if not k or not v:
            raise ValueError(
                f"DISCOGAN_XLA_COPTS entries must be key=value, got {item!r}")
        out[k.strip()] = v.strip()
    return out or None


def make_train_steps(cfg: TrainConfig, policy: Policy | None = None, *, jit: bool = True,
                     compiler_options: dict | None = None):
    """Returns (gen_step, dis_step): (ts, A, B, rate) -> (new_ts, losses).

    compiler_options: per-program XLA option overrides (jax.jit
    compiler_options), e.g. {"xla_tpu_scoped_vmem_limit_kib": "98304"} —
    the A/B mechanism tools/env_ab --copt uses (options ride the compile
    request, so they apply through remote-compile backends where host
    XLA_FLAGS would not).
    """
    policy = policy or default_policy(cfg.precision)
    if compiler_options is None:
        compiler_options = env_compiler_options()
    gen_step = _make_branch(cfg, policy, "gen")
    dis_step = _make_branch(cfg, policy, "dis")
    if jit:
        gen_step = jax.jit(gen_step, donate_argnums=(0,),
                           compiler_options=compiler_options)
        dis_step = jax.jit(dis_step, donate_argnums=(0,),
                           compiler_options=compiler_options)
    return gen_step, dis_step


def make_lean_dis_step(cfg: TrainConfig, policy: Policy | None = None, *,
                       jit: bool = True, compiler_options: dict | None = None):
    """The lean D-step (cfg.lean_dis): same D update, no ABA/BAB forwards.

    Use only on non-logged discriminator iterations — its recon losses
    report 0 (graph.discogan_losses dis_only)."""
    policy = policy or default_policy(cfg.precision)
    if compiler_options is None:
        compiler_options = env_compiler_options()
    step = _make_branch(cfg, policy, "dis", lean=True)
    if jit:
        step = jax.jit(step, donate_argnums=(0,),
                       compiler_options=compiler_options)
    return step


def make_scan_train_step(cfg: TrainConfig, policy: Policy | None = None, *,
                         steps: int, jit: bool = True,
                         compiler_options: dict | None = None,
                         variant: str = "switch"):
    """One XLA program running `steps` train iterations: batch gather from
    the HBM-resident dataset, curriculum rate, and the G/D alternation
    (lax.cond) all inside a lax.scan.

    (ts, data_A, data_B, idx_A, idx_B, iters0) -> (ts, losses)
      data_A/data_B: (N, H, W, 3) device-resident decoded datasets
      idx_A/idx_B:   (steps, batch) int32 gather indices
      iters0:        int32 scalar, absolute iteration of the first step
      losses:        dict of (steps,) arrays — per-iteration values, so the
                     training_log contract stays exact at any cadence.

    Semantically identical to driving make_train_steps() step-by-step (the
    same branch bodies); the point is dispatch amortization — one host
    dispatch and zero image H2D per `steps` iterations instead of ~5
    dispatches + a full batch copy per iteration. The reference pays a
    Python-loop + H2D + kernel-launch round trip every iteration
    (image_translation.py:315-390).
    """
    policy = policy or default_policy(cfg.precision)
    gen_step = _make_branch(cfg, policy, "gen")
    dis_step = _make_branch(cfg, policy, "dis")
    lean_step = (_make_branch(cfg, policy, "dis", lean=True)
                 if cfg.lean_dis else None)
    multi = scan_multi_body(cfg, gen_step, dis_step, lean_step, steps,
                            variant=variant)

    if jit:
        if compiler_options is None:
            compiler_options = env_compiler_options()
        multi = jax.jit(multi, donate_argnums=(0,),
                        compiler_options=compiler_options)
    return multi


def scan_variant(cfg: TrainConfig, it0: int, k: int) -> str:
    """Which scan program a chunk of k iterations starting at it0 should
    run — the shared chunk planner for train/loop.py and bench.py.

    "phase":      it0 is D-phase-aligned (it0 % update_interval == 0), k is
                  a whole number of [D, G, ..., G] periods, and (in lean
                  mode) no logged-D iteration falls inside — the body is
                  straight-line, no lax.cond/switch at all. Measured
                  +7.0% over "switch" at 64px b64 (PERF.md round 3): a
                  per-step conditional over the full ~190MB train-state
                  carry makes XLA insert carry copies inside the loop.
    "phase_cond": same alignment but a logged-D iteration falls inside
                  (lean mode only): the D slot is a lax.cond between the
                  full and lean D graphs — semantics stay bit-identical
                  to the per-step path. Measured +4.5% over "switch".
    "switch":     anything else (misaligned resume points, chunks clipped
                  at save intervals): the original per-step lax.switch
                  body, correct at any (it0, k).
    """
    ui = cfg.update_interval
    if it0 % ui or k % ui:
        return "switch"
    if cfg.lean_dis and any(
            i % ui == 0 and i % cfg.log_interval == 0
            for i in range(it0, it0 + k)):
        return "phase_cond"
    return "phase"


def auto_steps_per_call(cfg: TrainConfig, image_size: int) -> int:
    """The default fused-scan chunk size shared by the trainer
    (train/loop.py) and bench.py: ~24 iterations at small sizes, 2 whole
    G/D update periods at >= 256px — always a whole number of periods so
    aligned chunks run the straight-line "phase" program (+7.0% at 64px
    b64, +3.3% at 512px b32 over the per-step switch body, PERF.md
    round 3). At >= 256px the scan only wins with remat OFF (the slim
    fast point); with remat ON the k=6 phase scan measured -6.0% vs
    per-step at the faithful 512px point (interleaved, 5 rounds, PERF.md
    round 3 "faithful 512px") — remat-on large sizes return 1
    (per-step)."""
    ui = cfg.update_interval
    if image_size <= 128:  # small regime: ~24-step chunks
        return max(ui, (24 // ui) * ui)
    # 129px+: remat-dependent chunking. The 129-255px band keeps the
    # conservative large-size logic (advisor round 3: the 24-step chunk
    # regime is only abstract-probed at >= LARGE_IMAGE, so mid sizes must
    # not silently get the bigger un-probed program).
    use_remat = (image_size >= LARGE_IMAGE) if cfg.remat is None else cfg.remat
    return 1 if use_remat else 2 * ui


def auto_remat_scan_candidate(cfg: TrainConfig, image_size: int):
    """(cfg_noremat, steps_per_call) when the trainer should ATTEMPT the
    no-remat fused scan at a large size before settling for the remat-on
    per-step path, else None.

    Round 3: with the slim_state=mv default, 512px b32 fits HBM with
    remat OFF — and the no-remat k=6 phase scan measured ~+22% over the
    remat-on per-step route (PERF.md) with an identical weight
    trajectory (remat is pure recompute). So when --remat is unset, the
    trainer optimistically resolves auto-remat to OFF and lets its
    abstract probe compile decide: a geometry that exceeds HBM falls
    back to the remat-on per-step path, exactly the round-2 default.
    DISCOGAN_AUTO_REMAT=0 restores the unconditional remat-on auto.
    """
    if cfg.remat is not None or image_size < LARGE_IMAGE:
        return None
    if cfg.remat_policy is not None:
        # ANY explicitly-passed --remat_policy ("full" included — the CLI
        # default is None, so its presence is deliberate) opts into remat:
        # never auto-disable it (advisor round 3).
        return None
    if os.environ.get("DISCOGAN_AUTO_REMAT", "1") == "0":
        return None
    cfg_off = dataclasses.replace(cfg, remat=False)
    return cfg_off, auto_steps_per_call(cfg_off, image_size)


def scan_variants_for_range(cfg: TrainConfig, it0: int, n: int,
                            k: int) -> dict:
    """variant -> first chunk start, for the chunks of size k covering
    iterations [it0, it0 + n). Benchmarks warming a timed window must
    pre-build every program the window will use: the warmup chunks can
    exercise a different variant than the timed ones (e.g. iteration 0 is
    a logged-D iteration under lean_dis -> "phase_cond", while most timed
    chunks are pure "phase"), and a compile landing inside the timed
    window under-reports throughput."""
    out: dict = {}
    for i0 in range(it0, it0 + n, k):
        out.setdefault(scan_variant(cfg, i0, k), i0)
    return out


def make_scan_program_getter(cfg: TrainConfig,
                             compiler_options: dict | None = None):
    """(it0, k) -> the cached jitted scan program for that chunk — the
    chunk-planner + program-cache pattern shared by bench.measure_train
    and bench.measure_train_with_decode (train/loop.py keeps its own
    variant because it also routes the data-parallel program). The cache
    dict is exposed as .progs for warm-variant checks."""
    progs: dict = {}

    def get(it0: int, k: int):
        v = scan_variant(cfg, it0, k)
        if (k, v) not in progs:
            progs[k, v] = make_scan_train_step(
                cfg, steps=k, variant=v, compiler_options=compiler_options)
        return progs[k, v]

    get.progs = progs
    return get


def scan_multi_body(cfg: TrainConfig, gen_step, dis_step, lean_step,
                    steps: int, variant: str = "switch", take=None):
    """The unjitted multi-step scan body shared by the single-device scan
    program (make_scan_train_step) and the data-parallel one
    (parallel/dp.py make_dp_scan_train_step, where the branch bodies carry
    axis_name and this whole body runs per-device inside shard_map over
    per-device dataset shards and local gather indices).

    variant (see scan_variant): "switch" alternates G/D per scan step via
    lax.switch — correct for any iters0. "phase"/"phase_cond" require the
    CALLER to guarantee iters0 % update_interval == 0 and
    steps % update_interval == 0: each scan step then runs one whole
    [D, G, ..., G] period as straight-line code, eliminating the
    conditional over the full train-state carry (XLA materializes carry
    copies at conditional boundaries inside while loops — measured
    0.25 ms/step at 64px b64, PERF.md round 3).

    take: the batch-gather fn (data, idx) -> batch; default jnp.take on
    axis 0. The GSPMD scan (parallel/gspmd.py) passes a data-axis-manual
    shard_map gather so each device reads only its own dataset shard with
    LOCAL indices while the step body stays auto-sharded."""
    import jax.numpy as jnp

    if take is None:
        def take(data, idx):
            return jnp.take(data, idx, axis=0)
    if variant != "switch":
        return _phase_multi_body(cfg, gen_step, dis_step, lean_step, steps,
                                 logged_d_cond=(variant == "phase_cond"),
                                 take=take)

    def multi(ts, data_A, data_B, idx_A, idx_B, iters0):
        def body(ts, xs):
            j, ia, ib = xs
            A = take(data_A, ia)
            B = take(data_B, ib)
            i = iters0 + j
            rate = jnp.where(i < cfg.gan_curriculum,
                             cfg.starting_rate, cfg.default_rate
                             ).astype(jnp.float32)
            is_dis = (i % cfg.update_interval) == 0
            if lean_step is not None:
                # Route logged D iterations through the full graph so the
                # training_log's recon values stay exact (lean reports 0).
                is_log = (i % cfg.log_interval) == 0
                branch = jnp.where(is_dis, jnp.where(is_log, 1, 2), 0)
                new_ts, losses = lax.switch(
                    branch,
                    [lambda t: gen_step(t, A, B, rate),
                     lambda t: dis_step(t, A, B, rate),
                     lambda t: lean_step(t, A, B, rate)],
                    ts,
                )
                return new_ts, losses
            new_ts, losses = lax.cond(
                is_dis,
                lambda t: dis_step(t, A, B, rate),
                lambda t: gen_step(t, A, B, rate),
                ts,
            )
            return new_ts, losses

        xs = (jnp.arange(steps, dtype=jnp.int32), idx_A, idx_B)
        # DISCOGAN_SCAN_UNROLL>1 duplicates the loop body so XLA's
        # scheduler can overlap one iteration's batch gather with the
        # previous iteration's compute (A/B knob; default 1 — measured
        # via tools/env_ab before any default change).
        unroll = max(1, int(os.environ.get("DISCOGAN_SCAN_UNROLL", "1")))
        if steps % unroll:
            unroll = 1  # non-divisible trip counts stay on the plain loop
        return lax.scan(body, ts, xs, unroll=unroll)

    return multi


def _phase_multi_body(cfg: TrainConfig, gen_step, dis_step, lean_step,
                      steps: int, *, logged_d_cond: bool, take=None):
    """Phase-aligned multi-step body: one [D, G, ..., G] update period per
    scan step, straight-line (see scan_multi_body / scan_variant).

    The same (ts, data_A, data_B, idx_A, idx_B, iters0) -> (ts, losses)
    contract as the switch body, with losses stacked per ITERATION — the
    per-period stacking is reshaped back to (steps, ...) so the
    training_log contract is indistinguishable between variants.
    """
    import jax.numpy as jnp

    ui = cfg.update_interval
    if steps % ui:
        raise ValueError(
            f"phase-aligned scan needs steps % update_interval == 0, got "
            f"steps={steps}, update_interval={ui}")
    periods = steps // ui
    if take is None:
        def take(data, idx):
            return jnp.take(data, idx, axis=0)

    def d_slot(ts, A, B, rate, i):
        if lean_step is None:
            return dis_step(ts, A, B, rate)
        if not logged_d_cond:
            return lean_step(ts, A, B, rate)
        # Rare logged-D chunks: the cond costs ~0.08 ms/step at 64px b64
        # (PERF.md round 3) but fires in ~1 of 6 chunks, keeping lean-mode
        # semantics bit-identical to per-step routing.
        is_log = (i % cfg.log_interval) == 0
        return lax.cond(
            is_log,
            lambda t: dis_step(t, A, B, rate),
            lambda t: lean_step(t, A, B, rate),
            ts)

    def multi(ts, data_A, data_B, idx_A, idx_B, iters0):
        def body(ts, xs):
            j, ia, ib = xs  # ia/ib: (ui, batch) — one row per slot
            outs = []
            for s in range(ui):
                A = take(data_A, ia[s])
                B = take(data_B, ib[s])
                i = iters0 + j * ui + s
                rate = jnp.where(i < cfg.gan_curriculum,
                                 cfg.starting_rate, cfg.default_rate
                                 ).astype(jnp.float32)
                if s == 0:
                    ts, losses = d_slot(ts, A, B, rate, i)
                else:
                    ts, losses = gen_step(ts, A, B, rate)
                outs.append(losses)
            return ts, jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

        xs = (jnp.arange(periods, dtype=jnp.int32),
              idx_A.reshape(periods, ui, idx_A.shape[-1]),
              idx_B.reshape(periods, ui, idx_B.shape[-1]))
        ts, losses = lax.scan(body, ts, xs)
        return ts, jax.tree.map(
            lambda x: x.reshape((steps,) + x.shape[2:]), losses)

    return multi


def make_sample_fn(cfg: TrainConfig, policy: Policy | None = None):
    """Jitted A/B -> (AB, BA, ABA, BAB) forward for sample dumps.

    Matches the reference's torch.no_grad() pass with models left in train
    mode (image_translation.py:170-176): batch-stat normalization, and
    running stats DO advance — the returned new_states must be threaded
    back by the caller to stay faithful.
    """
    policy = policy or default_policy(cfg.precision)

    @jax.jit
    def sample(models, states, test_A, test_B):
        kw = dict(policy=policy, training=True, axis_name=None)
        AB, gb_s1 = generator_apply(models["gen_B"], states["gen_B"], test_A, **kw)
        BA, ga_s1 = generator_apply(models["gen_A"], states["gen_A"], test_B, **kw)
        ABA, ga_s2 = generator_apply(models["gen_A"], ga_s1, AB, **kw)
        BAB, gb_s2 = generator_apply(models["gen_B"], gb_s1, BA, **kw)
        new_states = dict(states, gen_A=ga_s2, gen_B=gb_s2)
        return (AB, BA, ABA, BAB), new_states

    return sample
