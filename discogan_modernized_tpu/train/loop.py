"""Shared training engine behind the CLI entry points.

Reproduces the reference trainer skeleton (image_translation.py:211-436,
angle_pairing.py:181-451, distributed_image_translation.py:326-596):
timestamped result/model dirs, test-set preprocessing, epoch loop with
independent A/B shuffles, alternating G/D updates, the training_log.txt
contract, periodic sample grids and .pth checkpoints — with the TPU-native
internals: prefetched input pipeline, two cached jitted step programs,
data parallelism over the device mesh instead of DDP, and full train-state
checkpoints for real resume.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path

import numpy as np

from ..data.preprocess import read_images
from ..data.resolvers import get_task_data, task_domains
from ..data.pipeline import PrefetchLoader, _is_paths
from .step import TrainConfig, init_train_state, make_train_steps, make_sample_fn
from .logging_ import TrainingLogger
from .samples import save_sample_grid, save_individual_images
from .checkpoint import (
    save_reference_layout,
    save_train_state,
    load_reference_weights,
)


def build_paths(args, timestamp: str, angle_variant: bool):
    """results/<task>[/<style_A>]/<arch>/<timestamp> (ref :226-235; the
    angle trainer has no style level, ref angle_pairing.py:190-191)."""
    result_path = Path(args.results_dir) / args.task_name
    model_path = Path(args.models_dir) / args.task_name
    if not angle_variant and getattr(args, "style_A", None):
        result_path = result_path / args.style_A
        model_path = model_path / args.style_A
    result_path = result_path / args.model_arch / timestamp
    model_path = model_path / args.model_arch / timestamp
    return result_path, model_path


def preprocess_test_set(args, test_A, test_B, angle_variant: bool):
    """Test-tensor preparation (ref image_translation.py:241-249,
    angle_pairing.py:196-205)."""
    task = args.task_name

    def prep(data, domain=None):
        data = np.asarray(data)
        if _is_paths(data):
            return read_images(list(data), domain, args.image_size)
        return np.asarray(data, np.float32)

    if angle_variant:
        return prep(test_A), prep(test_B)
    dom_A, dom_B = task_domains(task)
    return prep(test_A, dom_A), prep(test_B, dom_B)


def config_from_args(args, angle_variant: bool) -> TrainConfig:
    import os

    from .graph import ARCH_MODES

    if args.model_arch not in ARCH_MODES:
        raise SystemExit(
            f"model_arch must be one of {ARCH_MODES}, got {args.model_arch!r}")
    return TrainConfig(
        image_size=args.image_size,
        model_arch=args.model_arch,
        learning_rate=args.learning_rate,
        beta1=args.beta1,
        beta2=args.beta2,
        gan_curriculum=args.gan_curriculum,
        starting_rate=args.starting_rate,
        default_rate=args.default_rate,
        update_interval=args.update_interval,
        skip_first_fm=angle_variant,
        precision=getattr(args, "precision", None),
        bn_sync=bool(getattr(args, "bn_sync", False)),
        paired=bool(getattr(args, "paired", False)),
        remat={"on": True, "off": False, None: None}[getattr(args, "remat", None)],
        # "full" passes through unchanged: graph.py treats it like None
        # (save only inputs/outputs), but auto_remat_scan_candidate reads
        # an explicitly-passed policy — ANY policy, "full" included — as
        # opting into remat (advisor round 3).
        remat_policy=getattr(args, "remat_policy", None),
        lean_dis=bool(getattr(args, "lean_dis", False)),
        log_interval=args.log_interval,
        # Trainer default: explicit --slim_state wins; with the flag
        # omitted the documented DISCOGAN_SLIM_STATE env knob applies,
        # else "mv" (round 3: passes the full fidelity/trajectory suite,
        # measured +3%). Resolved HERE so the library-level TrainConfig
        # default (None -> env -> "off", the fidelity-gate configuration)
        # stays untouched for tests/tools.
        slim_state=(getattr(args, "slim_state", None)
                    or os.environ.get("DISCOGAN_SLIM_STATE") or "mv"),
    )


_UNSET = object()

# Default compiler options by image size (round 5): the scoped-vmem
# copt measured a win at every 512px operating point tried — +2% fast
# (slim all/no-remat, round 2), +0.9% faithful (f32/remat, round 5),
# +3.7% trajectory-exact mv (round 5) — and a wash at 64px (re-tested
# on the phase body, 1.002), never a loss; the >=256px gate extends the
# 512px wins to the sizes that share their memory regime (the 256px
# CLI path is exercised on-chip, throughput unmeasured there). Applied
# only when the user expressed no copt opinion (no --xla_copts flag AND
# no DISCOGAN_XLA_COPTS in the environment; setting either, even to "",
# suppresses the default).
_DEFAULT_COPTS_256 = "xla_tpu_scoped_vmem_limit_kib=32768"


def default_xla_copts(args) -> str | None:
    import os

    if getattr(args, "xla_copts", None) is not None:
        return args.xla_copts
    if os.environ.get("DISCOGAN_XLA_COPTS") is not None:
        return None  # env already governs the step builders directly
    if getattr(args, "image_size", 0) >= 256:
        return _DEFAULT_COPTS_256
    return None


def run_training(args, *, angle_variant: bool = False, distributed: bool = False):
    """Thin wrapper around the training engine that owns the process-level
    env knobs: --xla_copts KEY=VAL,... publishes to DISCOGAN_XLA_COPTS
    (read lazily by every step builder, including scan programs built
    mid-run), and is restored on EVERY exit path — a leaked value would
    silently apply compiler options to later run_training calls in the
    same process (HP-search driver, tests) and to child processes."""
    import os

    prev_copts = _UNSET
    try:
        copts = default_xla_copts(args)
        if copts:
            from .step import env_compiler_options

            prev_copts = os.environ.get("DISCOGAN_XLA_COPTS")
            os.environ["DISCOGAN_XLA_COPTS"] = copts
            # Raises ValueError on malformed entries — INSIDE the try so
            # the finally strips the bad value from the environment (a
            # caller that catches the error must not inherit it).
            env_compiler_options()
        return _run_training(args, angle_variant=angle_variant,
                             distributed=distributed)
    finally:
        if prev_copts is not _UNSET:
            if prev_copts is None:
                os.environ.pop("DISCOGAN_XLA_COPTS", None)
            else:
                os.environ["DISCOGAN_XLA_COPTS"] = prev_copts


def _run_training(args, *, angle_variant: bool = False, distributed: bool = False):
    import os

    import jax
    import jax.numpy as jnp

    # --device cpu (or the CI env hook): pin the CPU backend before first
    # device use. The reference's analogous path is its CUDA-availability
    # fallback (image_translation.py:216-223).
    if (os.environ.get("DISCOGAN_FORCE_CPU") == "1"
            or getattr(args, "device", None) == "cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            # The update fails when a backend is already initialized
            # (library callers). Running on an accelerator the user
            # explicitly opted out of is never OK — on a shared dev chip
            # it also corrupts any concurrent measurement — so fail
            # loudly instead of proceeding. (Probing default_backend()
            # only HERE: in the success path it would initialize the
            # backend before jax.distributed.initialize.)
            if jax.default_backend() != "cpu":
                raise SystemExit(
                    "--device cpu 요청이 적용되지 않았습니다 (backend "
                    f"'{jax.default_backend()}' already initialized) — "
                    "run in a fresh process or set DISCOGAN_FORCE_CPU=1 "
                    "before importing jax.")

    # Remote/tunnel first compiles are minutes; persist across runs.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path.home() / ".cache" / "jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    if getattr(args, "debug", False):
        jax.config.update("jax_debug_nans", True)
        print("디버그 모드: NaN/Inf 발생 시 즉시 중단")

    # Multi-host slice: TPU-runtime rendezvous replaces the reference's
    # MASTER_ADDR/PORT + NCCL init (distributed_image_translation.py:26-40).
    if getattr(args, "multihost", False):
        if not distributed:
            raise SystemExit(
                "--multihost requires --distributed: a multi-host run "
                "shards the global batch over a device mesh, which only "
                "the distributed trainer builds.")
        # Explicit rendezvous flags make the path testable with plain CPU
        # processes; on a real TPU slice all three default to None and
        # initialize() autodetects from the TPU runtime.
        coord = getattr(args, "coordinator_address", None)
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=getattr(args, "num_processes", None),
            process_id=getattr(args, "process_id", None),
        ) if coord else jax.distributed.initialize()
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    if n_proc > 1:
        # Every process must agree on the run directory: the collective
        # orbax save (ckpt_all_procs) has ALL processes enter save() on
        # the same path, and hosts can start seconds apart — a per-process
        # datetime.now() would shard the checkpoint across mismatched
        # directories. Broadcast process 0's timestamp (fixed 15-byte
        # "%Y%m%d_%H%M%S" encoding).
        from jax.experimental import multihost_utils

        enc = np.frombuffer(timestamp.encode("ascii"), dtype=np.uint8)
        enc = np.asarray(multihost_utils.broadcast_one_to_all(enc))
        timestamp = enc.tobytes().decode("ascii")
    result_path, model_path = build_paths(args, timestamp, angle_variant)
    cfg = config_from_args(args, angle_variant)  # fail fast before data IO

    data_A, data_B, test_A, test_B = get_task_data(args)
    if n_proc > 1:
        # Per-host dataset shard (DistributedSampler analog, ref :203-208);
        # --batch_size is per-host, like the reference's per-rank batch.
        # Shards MUST be equal length: every train step is a global SPMD
        # program, so a host with one extra batch per epoch would dispatch
        # a step the others never join — a cross-host collective hang.
        # DistributedSampler guarantees this by padding; we truncate
        # (losing at most n_proc-1 samples per domain per epoch).
        def host_shard(d):
            d = np.asarray(d)
            per = len(d) // n_proc
            if per == 0:
                raise ValueError(
                    f"dataset smaller than process count ({len(d)} < "
                    f"{n_proc}) — every host needs at least one sample")
            return d[jax.process_index()::n_proc][:per]

        data_A = host_shard(data_A)
        data_B = host_shard(data_B)
    test_A_t, test_B_t = preprocess_test_set(args, test_A, test_B, angle_variant)
    n_samples = min(5, len(test_A_t), len(test_B_t))

    if is_main:
        result_path.mkdir(parents=True, exist_ok=True)
        model_path.mkdir(parents=True, exist_ok=True)

    seed = int(getattr(args, "seed", 1234))  # ref DDP seeds 1234 (:372)
    ts = init_train_state(jax.random.PRNGKey(seed), cfg)

    # Full-state resume (extension): optimizer moments + iteration counter.
    start_iters = 0
    if getattr(args, "resume", None):
        from .checkpoint import load_train_state

        ts, start_iters = load_train_state(args.resume, ts)
        print(f"전체 학습 상태 복원: {args.resume} (iter {start_iters})")

    # Optional weights-only resume (ref distributed trainer --load_* flags).
    for name in ("gen_A", "gen_B", "dis_A", "dis_B"):
        load_path = getattr(args, f"load_{name}", None)
        if load_path:
            params, state = load_reference_weights(load_path, name, cfg.image_size)
            # Slim-state runs store master params in bf16 — keep the
            # loaded weights in the train state's dtype.
            ts["models"][name] = jax.tree.map(
                lambda new, cur: jnp.asarray(new, getattr(cur, "dtype", None)),
                params, ts["models"][name])
            ts["model_states"][name] = state
            print(f"모델 로드 성공: {load_path}")

    mesh = None
    parallel_mode = getattr(args, "parallel_mode", "dp") or "dp"
    if distributed:
        from ..core.mesh import make_mesh

        world = int(getattr(args, "world_size", None) or jax.device_count())
        if parallel_mode == "dp":
            from ..parallel import make_dp_train_steps, replicate_train_state

            mesh = make_mesh(world)
            ts = replicate_train_state(ts, mesh, cfg)
            gen_step, dis_step = make_dp_train_steps(cfg, mesh)
            print(f"Data-parallel over {world} devices "
                  f"(mesh axes {dict(mesh.shape)}, bn_sync={cfg.bn_sync})")
        elif parallel_mode in ("gspmd", "spatial"):
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel import make_gspmd_train_steps, place_train_state

            tp = int(getattr(args, "tp", 0) or 0)
            if tp <= 0:
                tp = 2 if world % 2 == 0 and world > 1 else 1
            if world % tp:
                raise SystemExit(f"--tp {tp} does not divide the "
                                 f"{world}-device mesh")
            mesh = make_mesh(world // tp, tp)
            if parallel_mode == "gspmd":
                ts = place_train_state(ts, mesh)  # channel-sharded TP
            else:  # spatial: params replicated, height sharded in-step
                ts = jax.device_put(ts, jax.tree.map(
                    lambda _: NamedSharding(mesh, PartitionSpec()), ts))
            gen_step, dis_step = make_gspmd_train_steps(
                cfg, mesh, spatial=(parallel_mode == "spatial"))
            print(f"GSPMD {parallel_mode} over {world} devices "
                  f"(data={world // tp}, model={tp})")
        else:
            raise SystemExit(
                f"unknown --parallel_mode {parallel_mode!r} "
                f"(dp/gspmd/spatial)")
    else:
        gen_step, dis_step = make_train_steps(cfg)
    lean_dis_step = None
    if cfg.lean_dis:
        if distributed and parallel_mode == "dp":
            from ..parallel import make_dp_lean_dis_step

            lean_dis_step = make_dp_lean_dis_step(cfg, mesh)
        elif distributed:
            from ..parallel import make_gspmd_lean_dis_step

            lean_dis_step = make_gspmd_lean_dis_step(
                cfg, mesh, spatial=(parallel_mode == "spatial"))
        else:
            from .step import make_lean_dis_step

            lean_dis_step = make_lean_dis_step(cfg)
    sample_fn = make_sample_fn(cfg)

    dom_A, dom_B = (None, None) if angle_variant else task_domains(args.task_name)
    loader = PrefetchLoader(
        data_A, data_B, args.batch_size, args.image_size,
        domain_A=dom_A, domain_B=dom_B, device_put=(n_proc == 1),
        device_cache=(False if getattr(args, "no_device_cache", False)
                      else None))
    n_batches = loader.n_batches
    if n_batches == 0:
        raise SystemExit(
            f"batch_size={args.batch_size} exceeds the usable dataset size "
            f"({min(len(data_A), len(data_B))} pairs) — no batches to train "
            f"on. (The reference silently runs zero iterations here.)")
    total_iterations = args.epochs * n_batches

    if n_proc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..core.mesh import DATA_AXIS

        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

        def to_global(local):
            return jax.make_array_from_process_local_data(
                batch_sharding, np.asarray(local))
    else:
        def to_global(local):
            return local

    logger = TrainingLogger(result_path / "training_log.txt", timestamp,
                            args.task_name, args.model_arch, args.batch_size,
                            args.learning_rate) if is_main else None

    ckpt_backend = getattr(args, "ckpt_backend", "npz")
    # Multi-host orbax checkpoints are COLLECTIVE: every process must
    # enter save_train_state (orbax's internal barriers; the primary does
    # the actual filesystem swap — train/checkpoint.py). npz and the
    # reference .pth layout stay process-0-only I/O.
    ckpt_all_procs = n_proc > 1 and ckpt_backend == "orbax"

    def hbm_sample(iters):
        """Append per-device HBM usage to hbm_telemetry.jsonl (sidecar —
        training_log.txt keeps the exact reference line contract). The
        monitor process cannot see THIS process's allocator, so the
        trainer reports its own; silently skipped on backends that don't
        expose memory_stats (ref analog: gpu_monitor.py:41-66 polling
        nvidia-smi for the global device view)."""
        if not is_main:
            return
        try:
            devs = []
            for d in jax.local_devices():
                m = d.memory_stats()
                if m:
                    devs.append({"id": d.id,
                                 "bytes_in_use": m.get("bytes_in_use"),
                                 "bytes_limit": m.get("bytes_limit")})
            if devs:
                with open(result_path / "hbm_telemetry.jsonl", "a") as f:
                    f.write(json.dumps(
                        {"t": time.time(), "iter": iters,
                         "devices": devs}) + "\n")
        except Exception:  # noqa: BLE001 — telemetry must never kill training
            pass
    if is_main:
        print(f"Total iterations: {total_iterations}")
        print(f"Saving results to: {result_path}")
        print(f"Saving models to: {model_path}")

    def single_view(ts):
        """Single-device view of the train state for samples/checkpoints.

        Multi-host: the view is assembled from PROCESS-LOCAL shards only
        (addressable_data) — a process-0-only jitted computation over the
        global mesh would be an SPMD program the other hosts never join,
        i.e. a cross-host collective mismatch (the reference's analog is
        rank 0 reading its own replica's .module state_dict,
        distributed_image_translation.py:552-568). Models/optimizer are
        replicated so the local copy IS the global value; in local-BN
        mode process 0's first shard is replica 0's stats, matching the
        single-host rank-0 checkpoint semantics. Single-host GSPMD states
        need no restructuring (np.asarray gathers transparently)."""
        if n_proc > 1:
            ts = jax.tree.map(
                lambda a: np.asarray(a.addressable_data(0))
                if hasattr(a, "addressable_data") else np.asarray(a), ts)
        if mesh is None or parallel_mode != "dp":
            return ts
        from ..parallel import unreplicate_train_state

        return unreplicate_train_state(ts, cfg)

    def dump_samples(iters):
        view = single_view(ts)
        (AB, BA, ABA, BAB), new_states = sample_fn(
            view["models"], view["model_states"],
            jnp.asarray(test_A_t), jnp.asarray(test_B_t))
        if angle_variant:
            subdir = result_path / str(iters // args.image_save_interval)
            save_individual_images(test_A_t, test_B_t, np.asarray(AB),
                                   np.asarray(BA), np.asarray(ABA),
                                   np.asarray(BAB), subdir, args.n_test)
            save_sample_grid(test_A_t[:5], test_B_t[:5], np.asarray(AB),
                             np.asarray(BA), np.asarray(ABA), np.asarray(BAB),
                             result_path / "sample_grids", iters,
                             n_samples=n_samples)
        else:
            save_sample_grid(test_A_t, test_B_t, np.asarray(AB), np.asarray(BA),
                             np.asarray(ABA), np.asarray(BAB),
                             result_path / "samples", iters, n_samples=n_samples)
        # Reference leaves models in train mode during sample dumps, so BN
        # running stats advance (image_translation.py:170-176); thread them
        # back in the single-device case. (The reference's DDP does this on
        # rank 0 only, silently desyncing rank BN buffers — we skip instead.)
        return new_states

    try:
        from tqdm import tqdm
    except Exception:  # pragma: no cover
        tqdm = None

    # Preemption-safe checkpointing: TPU VMs get SIGTERM before eviction;
    # persist the full train state so --resume continues exactly. (The
    # reference's only failure story is gpu_monitor restarting from
    # scratch — SURVEY §5.)
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    old_handler = None
    try:
        old_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not main thread
        pass

    # Restore the caller's SIGTERM disposition on EVERY exit path
    # (normal completion, preemption returns, exceptions) — a stale
    # handler bound to this run's dead state would silently disable
    # SIGTERM for long-lived callers (HP-search driver, tests).
    try:

        # A resumed run continues to the ORIGINAL total (epochs * n_batches),
        # not start_iters + epochs * n_batches: completed epochs are skipped
        # and the partially-trained epoch resumes mid-way, so monitor
        # auto-restarts are lossless rather than over-training.
        iters = start_iters
        start_epoch = min(start_iters // n_batches, args.epochs)
        skip_batches = start_iters - start_epoch * n_batches
        t_start = time.time()

        # --profile DIR: capture a bounded jax.profiler trace window of the
        # hot loop (the reference's only profiling is out-of-process
        # nvidia-smi sampling — SURVEY §5).
        from .profiling import ProfileWindow

        profiler = ProfileWindow(getattr(args, "profile", None)
                                 if is_main else None)

        # Fused multi-step driver: when the decoded dataset is HBM-resident
        # (single process, no mesh), run `steps_per_call` iterations per XLA
        # dispatch — lax.scan with on-device batch gather (train/step.py
        # make_scan_train_step). Calls are split exactly at sample/checkpoint
        # iterations so every cadence (and the training_log contract, which
        # reads per-iteration losses out of the stacked result) is preserved.
        steps_per_call = getattr(args, "steps_per_call", None)
        dp_scan = False
        gspmd_scan = False
        # Set when auto-remat optimistically resolved to the no-remat scan;
        # holds the pre-candidate cfg so fallbacks restore remat-on.
        cfg_before_auto_remat = None
        if mesh is None:
            scan_eligible = n_proc == 1 and loader.device_cache
        elif parallel_mode == "dp":
            # Round-3: the fast input path under data parallelism. The
            # decoded dataset is SHARDED over the mesh's data axis (each
            # device pins its private row block — the DistributedSampler
            # analog, ref distributed_image_translation.py:203-216) and
            # the fused multi-step scan runs inside shard_map
            # (parallel/dp.py make_dp_scan_train_step) — the same
            # mechanisms that took the single-device path from 124.6 to
            # 16.7k img/s (PERF.md), previously host-fed under DP.
            from ..core.mesh import DATA_AXIS

            n_local_sh = max(1, mesh.shape[DATA_AXIS] // n_proc)
            dp_scan = (not getattr(args, "no_device_cache", False)
                       and os.environ.get("DISCOGAN_DEVICE_CACHE", "1") != "0"
                       and args.batch_size % n_local_sh == 0
                       and loader._fits_device_budget(n_shards=n_local_sh))
            scan_eligible = dp_scan
        else:  # gspmd/spatial (round 4): data-axis-sharded dataset + scan,
            # batch gather manual over the data axis, model axis auto
            # (parallel/gspmd.py make_gspmd_scan_train_step). Single-process
            # only — multi-host GSPMD keeps the host-fed per-step path.
            # SPATIAL is measured-and-declined: under the scan the
            # partitioner diverges the latent/enc0 gradients 0.013-0.033
            # in the first Adam moment (vs the <2e-3 reduction-order
            # envelope every routed mode holds; variant-independent —
            # PERF.md round 4), the same fragile-pin class test_gspmd's
            # m-gate guards. TP (gspmd) measured clean and routes.
            from ..core.mesh import DATA_AXIS

            n_local_sh = mesh.shape[DATA_AXIS]
            gspmd_scan = (parallel_mode == "gspmd"
                          and n_proc == 1
                          and not getattr(args, "no_device_cache", False)
                          and os.environ.get("DISCOGAN_DEVICE_CACHE", "1")
                          != "0"
                          and args.batch_size % n_local_sh == 0
                          and loader._fits_device_budget(
                              n_shards=n_local_sh))
            scan_eligible = gspmd_scan
        if steps_per_call is None:
            # Auto: ~24 steps per call at small sizes, 2 whole G/D update
            # periods at >= 256px with remat OFF — chunks stay
            # phase-aligned (scan_variant "phase", the straight-line body:
            # +7.0% at 64px b64 and +3.3% at 512px b32 slim/no-remat over
            # the per-step lax.switch, PERF.md round 3; at 512px the
            # switch's carry copies span a multi-GB train state). With
            # remat ON at >= 256px auto returns 1: the k=6 phase scan
            # measured -6.0% vs per-step at the faithful 512px point
            # (PERF.md round 3 "faithful 512px"). Compile cost is
            # geometry-dependent and ONE-TIME per machine (persistent
            # cache): 512px b32 ~3 min, 256px b8 >10 min observed — it
            # amortizes over production-length runs and every resume;
            # pass --steps_per_call 1 for short/throwaway runs. The
            # abstract probe below falls back to the per-step path if a
            # geometry exceeds HBM at compile.
            if scan_eligible:
                from .step import auto_steps_per_call

                steps_per_call = auto_steps_per_call(cfg, args.image_size)
                # Round-3 memory-aware auto-remat: when --remat is unset
                # at a large size, ATTEMPT the no-remat fused scan first
                # (slim mv, the default state mode, fits 512px b32
                # without remat — measured ~+22% over the remat-on
                # per-step route, identical weight trajectory). The
                # abstract probe below is the arbiter: a compile-OOM
                # reverts to the remat-on per-step path. Round 4: the
                # probe builds mesh-sharded avals for DP-scan, so the
                # same optimistic resolution applies under a mesh —
                # nothing is allocated before the probe passes.
                from .step import auto_remat_scan_candidate

                cand = auto_remat_scan_candidate(cfg, args.image_size)
                if cand is not None and cand[1] > 1:
                    cfg_before_auto_remat = cfg
                    cfg, steps_per_call = cand
            else:
                steps_per_call = 1
        if steps_per_call > 1 and scan_eligible:
            from .step import make_scan_train_step, scan_variant

            scan_progs: dict = {}

            def scan_prog(k, variant="switch"):
                if (k, variant) not in scan_progs:
                    if dp_scan:
                        from ..parallel import make_dp_scan_train_step

                        scan_progs[k, variant] = make_dp_scan_train_step(
                            cfg, mesh, steps=k, variant=variant)
                    elif gspmd_scan:
                        from ..parallel.gspmd import (
                            make_gspmd_scan_train_step)

                        scan_progs[k, variant] = make_gspmd_scan_train_step(
                            cfg, mesh, steps=k, variant=variant,
                            spatial=(parallel_mode == "spatial"))
                    else:
                        scan_progs[k, variant] = make_scan_train_step(
                            cfg, steps=k, variant=variant)
                return scan_progs[k, variant]

            # Probe-compile with ABSTRACT args before building the HBM
            # dataset: at 512px b32 the fused-scan program exceeds HBM at
            # compile time (~367MB over, mostly layout padding), and finding
            # that out after allocating the device cache risks transient
            # co-residency OOMs (tunnel buffer deletion is async). The real
            # call after a successful probe hits the persistent compile
            # cache. Only probed in the at-risk regime (>= 256px) — small
            # sizes never compile-OOM and would pay the probe as a
            # duplicate compile on fast-compile backends (CPU tests fall
            # under the 1s persistent-cache floor).
            # DP-scan probes too (round 4, VERDICT r3 item 6): its avals
            # carry mesh shardings (ShapeDtypeStruct(sharding=...)), so a
            # compile-OOM at >= 256px under a mesh is discovered BEFORE
            # device_data_sharded allocates anything — same probe-first
            # discipline as the single-device path.
            from . import step as _step

            if args.image_size >= _step.LARGE_IMAGE:
                sds = jax.ShapeDtypeStruct
                sz, bs = args.image_size, args.batch_size
                # Probe with the loader's ACTUAL device-dataset dtype: with
                # DISCOGAN_DEVICE_CACHE_BF16=1 the HBM dataset is bf16, and a
                # f32-typed probe would validate a program that never runs
                # while the real bf16 program compiles unprobed.
                ddt = loader._device_dtype()
                if dp_scan:
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    from ..core.mesh import DATA_AXIS
                    from ..parallel.dp import _ts_specs

                    # Global shapes mirror what device_data_sharded /
                    # sharded_epoch_indices will build: per-process rows
                    # truncated to a multiple of the local device count,
                    # assembled across processes; index rows are
                    # (k, local_batch) per process, P(None, data) global.
                    nA = (len(loader.data_A) // n_local_sh) * n_local_sh * n_proc
                    nB = (len(loader.data_B) // n_local_sh) * n_local_sh * n_proc
                    gbs = bs * n_proc
                    specs = _ts_specs(cfg)
                    abstract = (
                        {k: jax.tree.map(
                            lambda x, s=NamedSharding(mesh, specs[k]):
                                sds(x.shape, x.dtype, sharding=s), ts[k])
                         for k in ts},
                        sds((nA, sz, sz, 3), ddt,
                            sharding=NamedSharding(mesh, P(DATA_AXIS))),
                        sds((nB, sz, sz, 3), ddt,
                            sharding=NamedSharding(mesh, P(DATA_AXIS))),
                        sds((steps_per_call, gbs), jnp.int32,
                            sharding=NamedSharding(mesh, P(None, DATA_AXIS))),
                        sds((steps_per_call, gbs), jnp.int32,
                            sharding=NamedSharding(mesh, P(None, DATA_AXIS))),
                        sds((), jnp.int32,
                            sharding=NamedSharding(mesh, P())),
                    )
                elif gspmd_scan:
                    # Shapes mirror device_data_sharded on this mesh
                    # (single-process: rows truncated to the data-axis
                    # size). Avals stay unsharded — the gspmd scan jit
                    # pins its own in_shardings (jit_for below).
                    nA = (len(loader.data_A) // n_local_sh) * n_local_sh
                    nB = (len(loader.data_B) // n_local_sh) * n_local_sh
                    abstract = (
                        jax.tree.map(lambda x: sds(x.shape, x.dtype), ts),
                        sds((nA, sz, sz, 3), ddt),
                        sds((nB, sz, sz, 3), ddt),
                        sds((steps_per_call, bs), jnp.int32),
                        sds((steps_per_call, bs), jnp.int32),
                        sds((), jnp.int32),
                    )
                else:
                    nA, nB = len(loader.data_A), len(loader.data_B)
                    abstract = (
                        jax.tree.map(lambda x: sds(x.shape, x.dtype), ts),
                        sds((nA, sz, sz, 3), ddt),
                        sds((nB, sz, sz, 3), ddt),
                        sds((steps_per_call, bs), jnp.int32),
                        sds((steps_per_call, bs), jnp.int32),
                        sds((), jnp.int32),
                    )
                try:
                    prog = scan_prog(steps_per_call,
                                     scan_variant(cfg, iters, steps_per_call))
                    if hasattr(prog, "jit_for"):  # gspmd scan wrapper
                        prog = prog.jit_for(abstract[0])
                    prog.lower(*abstract).compile()
                    if cfg_before_auto_remat is not None:
                        print(f"auto-remat: no-remat fused scan fits at "
                              f"{args.image_size}px (probe compile OK) — "
                              f"remat off, steps_per_call={steps_per_call}")
                except Exception as e:
                    extra = ""
                    if cfg_before_auto_remat is not None:
                        # The optimistic no-remat program didn't fit —
                        # restore auto-remat's remat-on resolution for the
                        # per-step fallback (its programs were built from
                        # the pre-candidate cfg above and are untouched).
                        cfg = cfg_before_auto_remat
                        extra = " (auto-remat: no-remat 스캔 부적합 — remat-on)"
                    print(f"경고: 다단계 scan 프로그램 컴파일 실패 — 단일 스텝 "
                          f"경로로 폴백합니다{extra} "
                          f"({type(e).__name__}: {str(e)[:120]})")
                    scan_progs.clear()
                    loader.release_device_cache()
                    scan_eligible = False

        if steps_per_call > 1 and scan_eligible:
            if dp_scan or gspmd_scan:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..core.mesh import DATA_AXIS

                dev_A, dev_B, L_A, L_B = loader.device_data_sharded(mesh)
                idx_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
                if is_main:
                    # Routed-path marker (asserted by
                    # tests/test_multihost.py): the sharded-HBM-dataset +
                    # fused-scan input path is live, with the shard layout
                    # it built.
                    print(f"fast input path: sharded HBM dataset + "
                          f"{'DP' if dp_scan else parallel_mode}-scan "
                          f"(data shards={mesh.shape[DATA_AXIS]}, "
                          f"shard_len=({L_A},{L_B}), "
                          f"steps_per_call={steps_per_call})")

                def to_idx(block):
                    # (k, local_batch) -> global (k, global_batch) sharded
                    # P(None, data); each device's column block holds LOCAL
                    # indices into its own dataset shard.
                    return jax.make_array_from_process_local_data(
                        idx_sharding, np.ascontiguousarray(block, np.int32))

                def epoch_rows():
                    return loader.sharded_epoch_indices(
                        mesh, args.batch_size, n_batches, L_A, L_B)
            else:
                dev_A, dev_B = loader.device_data()

                def to_idx(block):
                    return jnp.asarray(block, jnp.int32)

                def epoch_rows():
                    pa, pb = loader.epoch_perms()
                    bsz = args.batch_size
                    ia = np.stack([pa[i * bsz:(i + 1) * bsz]
                                   for i in range(n_batches)])
                    ib = np.stack([pb[i * bsz:(i + 1) * bsz]
                                   for i in range(n_batches)])
                    return ia, ib

            def index_stream():
                skip = skip_batches
                for _ in range(start_epoch, args.epochs):
                    ia, ib = epoch_rows()
                    for i in range(skip, n_batches):
                        yield ia[i], ib[i]
                    skip = 0

            stream = index_stream()
            prog = tqdm(total=total_iterations - start_iters,
                        desc="Training (scan)") if tqdm else None
            intervals = (args.image_save_interval, args.model_save_interval)
            scan_failed = False
            while iters < total_iterations:
                profiler.tick(iters)
                k = min(steps_per_call, total_iterations - iters)
                for iv in intervals:
                    nxt = ((iters + iv - 1) // iv) * iv  # next snapshot iter
                    k = min(k, nxt - iters + 1)
                ui = cfg.update_interval
                if iters % ui:
                    # Misaligned start (e.g. a resume point mid-period):
                    # one short switch-variant chunk restores alignment so
                    # every following chunk runs the phase program.
                    k = min(k, ui - iters % ui)
                elif k >= ui and k % ui:
                    # Clipped chunks shrink to whole periods; the remainder
                    # (up to the snapshot iteration) runs next time.
                    k = (k // ui) * ui
                variant = scan_variant(cfg, iters, k)
                ia = np.stack([next(stream) for _ in range(k)], axis=0)
                ia, ib = ia[:, 0], ia[:, 1]
                try:
                    ts, losses = scan_prog(k, variant)(
                        ts, dev_A, dev_B, to_idx(ia), to_idx(ib),
                        jnp.int32(iters))
                except Exception as e:
                    # Backend compile limits: the fused-scan program at large
                    # image sizes/batches can exceed what the compiler service
                    # accepts (observed: 512px b32 fails while b8 compiles —
                    # PERF.md). Before any step ran, fall back to the
                    # per-step path; donated buffers are untouched on a
                    # compile failure, so the train state is still valid.
                    # A RUNTIME failure after dispatch, however, consumes the
                    # donated state — no fallback is possible then.
                    # Fall back whenever the donated train state survived —
                    # compile failures of clipped-k programs built MID-run
                    # (k shrinks near save intervals) are as recoverable as a
                    # first-call failure; only a post-dispatch runtime failure
                    # consumes the donated buffers and cannot be retried.
                    if any(getattr(x, "is_deleted", lambda: False)()
                           for x in jax.tree.leaves(ts)):
                        raise
                    if cfg_before_auto_remat is not None:
                        cfg = cfg_before_auto_remat
                    print(f"경고: 다단계 scan 프로그램 컴파일 실패 — "
                          f"단일 스텝 경로로 폴백합니다 "
                          f"({type(e).__name__}: {str(e)[:120]})")
                    scan_failed = True
                    # The per-step loop below resumes from wherever the scan
                    # path got to (first-call failure: iters == start_iters
                    # and this is a no-op).
                    start_epoch = min(iters // n_batches, args.epochs)
                    skip_batches = iters - start_epoch * n_batches
                    # Release the HBM-resident dataset and cached scan
                    # programs before the per-step path allocates its own
                    # working set (at 512px the failure IS an HBM OOM —
                    # co-residency would OOM the fallback too).
                    del dev_A, dev_B
                    scan_progs.clear()
                    loader.release_device_cache()
                    if prog:
                        prog.close()
                    break
                if any((iters + j) % args.log_interval == 0 for j in range(k)):
                    host = jax.device_get(losses)
                    for j in range(k):
                        i = iters + j
                        if i % args.log_interval != 0:
                            continue
                        vals = {key: float(host[key][j]) for key in host}
                        if not all(np.isfinite(v) for v in vals.values()):
                            print("경고: 손실에 NaN/Inf 감지 — --debug 로 첫 "
                                  "발생 지점을 추적할 수 있습니다")
                        if logger is not None:
                            logger.log(i, total_iterations, vals,
                                       fm=not angle_variant)
                        if prog:
                            prog.set_postfix({
                                "D_loss": f"{vals['dis_total']:.4f}",
                                "G_loss": f"{vals['gen_total']:.4f}"})
                iters += k
                last = iters - 1
                if last % args.image_save_interval == 0 and is_main:
                    new_states = dump_samples(last)
                    if mesh is None:
                        # DP keeps per-replica BN state sharded on the
                        # mesh; like the per-step loop, sample-dump stat
                        # advances are not threaded back there.
                        ts = dict(ts, model_states=new_states)
                if last % args.model_save_interval == 0 \
                        and (is_main or ckpt_all_procs):
                    if is_main:
                        hbm_sample(last)
                    view = single_view(ts)
                    if is_main:
                        save_reference_layout(model_path, view, last)
                    save_train_state(model_path, view, last,
                                     {"task": args.task_name,
                                      "arch": args.model_arch},
                                     backend=ckpt_backend)
                if prog:
                    prog.update(k)
                if preempted["flag"]:
                    view = single_view(ts)
                    if is_main or ckpt_all_procs:
                        save_train_state(model_path, view, iters,
                                         {"task": args.task_name,
                                          "arch": args.model_arch,
                                          "preempted": True},
                                         backend=ckpt_backend)
                    if is_main:
                        save_reference_layout(model_path, view, iters)
                        print(f"SIGTERM: 학습 상태 저장 후 종료 (iter {iters}) — "
                              f"--resume {model_path} 로 재개")
                    if old_handler is not None:
                        signal.signal(signal.SIGTERM, old_handler)
                    profiler.stop()
                    return result_path, model_path
            if not scan_failed:
                if prog:
                    prog.close()
                profiler.stop()
                if is_main or ckpt_all_procs:
                    view = single_view(ts)
                    if is_main:
                        save_reference_layout(model_path, view, "final")
                    save_train_state(model_path, view, iters,
                                     {"task": args.task_name,
                                      "arch": args.model_arch},
                                     backend=ckpt_backend)
                if is_main:
                    dt = time.time() - t_start
                    if dt > 0 and iters > start_iters:
                        print(f"Throughput: "
                              f"{(iters - start_iters) * args.batch_size / dt:.1f} "
                              f"images/sec")
                    print(f"Training completed. Final models saved to {model_path}")
                    print(f"Results and logs saved to {result_path}")
                return result_path, model_path
            # scan compile failed: continue into the per-step loop below.

        for epoch in range(start_epoch, args.epochs):
            # skip= jumps past the already-trained prefix by INDEX — resume
            # does not decode/transfer the discarded batches (shuffles are
            # fresh per epoch, so index-skipping loses nothing).
            it = loader.epoch(skip=skip_batches)
            steps_this_epoch = n_batches - skip_batches
            skip_batches = 0
            prog = tqdm(range(steps_this_epoch),
                        desc=f"Epoch {epoch+1}/{args.epochs}") \
                if tqdm else range(steps_this_epoch)
            for _ in prog:
                A, B = next(it)
                A, B = to_global(A), to_global(B)
                rate = jnp.float32(cfg.rate_for(iters))
                if cfg.is_dis_iter(iters):
                    # Lean D-step on non-logged iterations only: its recon
                    # losses report 0, so logged lines must use the full graph
                    # (routing predicate centralized in cfg.use_lean_dis).
                    step = (lean_dis_step
                            if lean_dis_step is not None
                            and cfg.use_lean_dis(iters) else dis_step)
                else:
                    step = gen_step
                profiler.tick(iters)
                ts, losses = step(ts, A, B, rate)

                if iters % args.log_interval == 0:
                    vals = {k: float(v) for k, v in losses.items()}
                    if not all(np.isfinite(v) for v in vals.values()):
                        print("경고: 손실에 NaN/Inf 감지 — --debug 로 첫 발생 "
                              "지점을 추적할 수 있습니다")
                    if logger is not None:
                        logger.log(iters, total_iterations, vals,
                                   fm=not angle_variant)
                    if tqdm:
                        prog.set_postfix({
                            "D_loss": f"{vals['dis_total']:.4f}",
                            "G_loss": f"{vals['gen_total']:.4f}",
                        })
                if iters % args.image_save_interval == 0 and is_main:
                    new_states = dump_samples(iters)
                    if mesh is None:
                        ts = dict(ts, model_states=new_states)
                if iters % args.model_save_interval == 0 \
                        and (is_main or ckpt_all_procs):
                    if is_main:
                        hbm_sample(iters)
                    view = single_view(ts)
                    if is_main:
                        save_reference_layout(model_path, view, iters)
                    save_train_state(model_path, view, iters,
                                     {"task": args.task_name, "arch": args.model_arch},
                                     backend=ckpt_backend)
                iters += 1
                if preempted["flag"]:
                    view = single_view(ts)
                    if is_main or ckpt_all_procs:
                        save_train_state(model_path, view, iters,
                                         {"task": args.task_name,
                                          "arch": args.model_arch,
                                          "preempted": True},
                                         backend=ckpt_backend)
                    if is_main:
                        save_reference_layout(model_path, view, iters)
                        print(f"SIGTERM: 학습 상태 저장 후 종료 (iter {iters}) — "
                              f"--resume {model_path} 로 재개")
                    if old_handler is not None:
                        signal.signal(signal.SIGTERM, old_handler)
                    profiler.stop()
                    return result_path, model_path

        profiler.stop()
        if is_main or ckpt_all_procs:
            view = single_view(ts)
            if is_main:
                save_reference_layout(model_path, view, "final")
            save_train_state(model_path, view, iters,
                             {"task": args.task_name, "arch": args.model_arch},
                             backend=ckpt_backend)
        if is_main:
            dt = time.time() - t_start
            if dt > 0 and iters > start_iters:
                print(f"Throughput: "
                      f"{(iters - start_iters) * args.batch_size / dt:.1f} "
                      f"images/sec")
            print(f"Training completed. Final models saved to {model_path}")
            print(f"Results and logs saved to {result_path}")
        return result_path, model_path
    finally:
        if old_handler is not None:
            try:
                signal.signal(signal.SIGTERM, old_handler)
            except ValueError:
                pass
