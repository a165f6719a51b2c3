"""One flag registry rendering each entry point's exact argparse surface.

The reference duplicates ~24 near-identical flags across three trainers
with subtly different defaults (image_translation.py:21-81,
distributed_image_translation.py:48-126, angle_pairing.py:22-72 — epochs
100 vs 10, starting_rate 0.01 vs 0.9, image_save_interval 1000 vs 500).
Centralized here; per-entry-point defaults match the reference exactly.

TPU-framework extensions (documented, all optional): --precision,
--bn_sync, --seed, --paired, --remat, --ckpt_backend, --debug, --config,
and on the distributed trainer --multihost/--resume.
"""

from __future__ import annotations

import argparse


def parse_with_config(parser: argparse.ArgumentParser, argv=None):
    """Parse args with optional --config YAML defaults (CLI flags win).

    The reference declares pyyaml as a dependency but never imports it
    (requirements.txt:15, SURVEY §5 "No config files"); this completes
    that intent: a YAML mapping of flag names to values becomes the
    defaults for any flags not given on the command line.
    """
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    known, _ = pre.parse_known_args(argv)
    parser.add_argument("--config", type=str, default=None,
                        help="YAML file of flag defaults (CLI flags override)")
    if known.config:
        import yaml

        with open(known.config) as f:
            conf = yaml.safe_load(f) or {}
        actions = {a.dest: a for a in parser._actions}
        unknown = set(conf) - set(actions)
        if unknown:
            raise SystemExit(f"unknown config keys: {sorted(unknown)}")
        # set_defaults alone would skip argparse's `type` conversion and
        # `choices` validation (they only apply to command-line strings),
        # letting a typo like `precision: f64` flow silently downstream —
        # apply both here so config values get exactly the CLI checks.
        checked = {}
        for key, val in conf.items():
            a = actions[key]
            if a.type is not None and isinstance(val, str):
                try:
                    val = a.type(val)
                except (TypeError, ValueError):
                    raise SystemExit(
                        f"config key {key!r}: invalid value {val!r} "
                        f"(expected {getattr(a.type, '__name__', a.type)})")
            elif a.type in (int, float) and val is not None:
                # Non-string YAML scalars bypass argparse's conversion (it
                # only runs on command-line strings) — coerce them through
                # the same type, rejecting lossy values (image_size: 64.5)
                # and booleans (YAML `true` for an int flag), so config
                # inputs get exactly the CLI checks.
                if isinstance(val, bool) or not isinstance(val, (int, float)):
                    raise SystemExit(
                        f"config key {key!r}: invalid value {val!r} "
                        f"(expected {a.type.__name__})")
                coerced = a.type(val)
                if coerced != val:
                    raise SystemExit(
                        f"config key {key!r}: value {val!r} is not a valid "
                        f"{a.type.__name__} (lossy conversion)")
                val = coerced
            if a.choices is not None and val is not None \
                    and val not in a.choices:
                raise SystemExit(
                    f"config key {key!r}: invalid choice {val!r} "
                    f"(choose from {sorted(map(str, a.choices))})")
            checked[key] = val
        parser.set_defaults(**checked)
    return parser.parse_args(argv)


def add_common_flags(parser: argparse.ArgumentParser, *, task_default: str,
                     epochs_default: int, starting_rate_default: float,
                     default_rate_default: float, image_save_default: int,
                     celebA_flags: bool):
    parser.add_argument('--device', type=str, default='tpu',
                        help='Device to use (tpu/cpu)')
    parser.add_argument('--task_name', type=str, default=task_default,
                        help='Set data name (facescrub/celebA/edges2shoes/...)')
    parser.add_argument('--results_dir', type=str, default='./results/',
                        help='Directory to save the results')
    parser.add_argument('--models_dir', type=str, default='./models/',
                        help='Directory to save models')
    parser.add_argument('--model_arch', type=str, default='discogan',
                        help='Model architecture: gan/recongan/discogan')

    parser.add_argument('--epochs', type=int, default=epochs_default,
                        help='Number of epochs to train')
    parser.add_argument('--batch_size', type=int, default=64,
                        help='Batch size')
    parser.add_argument('--learning_rate', type=float, default=0.0002,
                        help='Learning rate for optimizer')
    parser.add_argument('--beta1', type=float, default=0.5,
                        help='Beta1 for Adam optimizer')
    parser.add_argument('--beta2', type=float, default=0.999,
                        help='Beta2 for Adam optimizer')
    parser.add_argument('--image_size', type=int, default=64,
                        help='Image size')

    parser.add_argument('--gan_curriculum', type=int, default=10000,
                        help='Number of steps with strong GAN loss')
    parser.add_argument('--starting_rate', type=float, default=starting_rate_default,
                        help='Initial lambda weight between GAN and Recon loss')
    parser.add_argument('--default_rate', type=float, default=default_rate_default,
                        help='Lambda weight between GAN and Recon loss after curriculum')

    if celebA_flags:
        parser.add_argument('--style_A', type=str, default=None,
                            help='Style A for CelebA (e.g., Male, Young)')
        parser.add_argument('--style_B', type=str, default=None,
                            help='Style B for CelebA')
        parser.add_argument('--constraint', type=str, default=None,
                            help='Constraint for CelebA')
        parser.add_argument('--constraint_type', type=str, default=None,
                            help='Constraint type (1/-1) for CelebA')

    parser.add_argument('--n_test', type=int, default=200,
                        help='Number of test images')
    parser.add_argument('--update_interval', type=int, default=3,
                        help='Interval for discriminator updates')
    parser.add_argument('--log_interval', type=int, default=50,
                        help='Print loss interval')
    parser.add_argument('--image_save_interval', type=int, default=image_save_default,
                        help='Image save interval')
    parser.add_argument('--model_save_interval', type=int, default=10000,
                        help='Model save interval')

    # TPU-framework extensions.
    parser.add_argument('--precision', type=str, default=None,
                        choices=['bf16', 'f32'],
                        help='Compute precision (default: bf16 on TPU, f32 on CPU)')
    parser.add_argument('--bn_sync', action='store_true',
                        help='Cross-replica BatchNorm statistics under data '
                             'parallelism (default: per-replica, DDP-faithful)')
    parser.add_argument('--seed', type=int, default=1234,
                        help='Init seed (the reference distributed trainer '
                             'hardcodes torch.manual_seed(1234))')
    parser.add_argument('--ckpt_backend', type=str, default='npz',
                        choices=['npz', 'orbax'],
                        help='Full-train-state checkpoint backend: npz '
                             '(single-host archive) or orbax (sharded/'
                             'async-capable OCDBT)')
    parser.add_argument('--debug', action='store_true',
                        help='Numerics debug mode: jax_debug_nans aborts on '
                             'the first NaN/Inf with a traceback (the '
                             'sanitizer story the reference lacks — '
                             'SURVEY.md §5)')
    parser.add_argument('--paired', action='store_true',
                        help='Fuse A/B-side network pairs into vmapped '
                             'grouped convolutions (numerically equivalent; '
                             'measured ~10%% slower at 64px on v5e — '
                             'experimental)')
    parser.add_argument('--lean_dis', action='store_true',
                        help='(extension) skip the ABA/BAB reconstruction '
                             'forwards on non-logged discriminator '
                             'iterations. Weight trajectory is '
                             'bit-identical (training-mode BN uses batch '
                             'stats); only BN running-stat bookkeeping '
                             'differs. Logged iterations always run the '
                             'full graph, so training_log.txt is exact.')
    parser.add_argument('--slim_state', type=str, default=None,
                        choices=['off', 'mv', 'all'],
                        help='(extension) low-precision optimizer/master '
                             'state: mv = Adam moments in bf16, all = '
                             'moments + master params in bf16 with '
                             'stochastically-rounded updates. Reclaims '
                             'most of the ~8GB f32 state that caps 512px '
                             'batch size on a 16GB chip (PERF.md). '
                             'Default mv (round 3: passes the FULL '
                             'fidelity/trajectory suite unchanged, '
                             'measured +3%%); with the flag omitted the '
                             'DISCOGAN_SLIM_STATE env var overrides the '
                             'default — pass off for the f32 optimizer '
                             'state.')
    parser.add_argument('--xla_copts', type=str, default=None,
                        metavar='KEY=VAL[,KEY=VAL...]',
                        help='(extension) per-program XLA compiler-option '
                             'overrides (jax.jit compiler_options), e.g. '
                             'xla_tpu_scoped_vmem_limit_kib=32768 (+2%% '
                             'measured at 512px b32 — PERF.md). Equivalent '
                             'to the DISCOGAN_XLA_COPTS env var; the flag '
                             'wins when both are set.')
    parser.add_argument('--remat', type=str, default=None,
                        choices=['on', 'off'],
                        help='Activation rematerialization (default: auto — '
                             'at >= 256px the trainer first probe-compiles '
                             'the no-remat fused scan and uses it when it '
                             'fits HBM (slim mv fits 512px b32, ~+22%% over '
                             'the remat-on per-step route, identical '
                             'trajectory), falling back to remat-on '
                             'per-step otherwise; DISCOGAN_AUTO_REMAT=0 '
                             'forces the unconditional remat-on auto)')
    parser.add_argument('--remat_policy', type=str, default=None,
                        choices=['full', 'latent', 'conv'],
                        help='(extension) remat granularity: full = save '
                             'only network boundaries (backward re-runs the '
                             'forward), latent = also save the 1x1 latents, '
                             'conv = save every conv output so the backward '
                             'recomputes only elementwise chains (fastest '
                             'at 512px if it fits HBM; PERF.md)')
    parser.add_argument('--profile', type=str, default=None, metavar='DIR',
                        help='(extension) capture a jax.profiler trace of a '
                             'short window of training iterations to DIR '
                             '(view with tensorboard/xprof). The TPU-native '
                             'answer to the reference\'s out-of-process '
                             'nvidia-smi sampling (SURVEY.md §5); on '
                             'backends without trace support it degrades '
                             'to a warning')
    parser.add_argument('--resume', type=str, default=None,
                        help='(extension) model dir with a full train-state '
                             'checkpoint — resumes optimizer/iteration state '
                             'exactly (used by the monitor for lossless '
                             'crash restarts)')
    parser.add_argument('--steps_per_call', type=int, default=None,
                        help='(extension) train iterations fused into one '
                             'XLA program (lax.scan with on-device batch '
                             'gather) when the decoded dataset is HBM-'
                             'resident. Default: 8 in that case, else 1. '
                             '1 = one dispatch per step (reference-style '
                             'loop). Logging/sample/checkpoint cadences are '
                             'preserved exactly at any value.')
    parser.add_argument('--no_device_cache', action='store_true',
                        help='(extension) disable the HBM-resident decoded '
                             'dataset (falls back to the host prefetch '
                             'pipeline + per-step transfers)')
    return parser


def translation_parser() -> argparse.ArgumentParser:
    """image_translation.py flags (ref :21-81)."""
    p = argparse.ArgumentParser(description='TPU-native implementation of DiscoGAN')
    return add_common_flags(p, task_default='facescrub', epochs_default=100,
                            starting_rate_default=0.01, default_rate_default=0.5,
                            image_save_default=1000, celebA_flags=True)


def distributed_parser() -> argparse.ArgumentParser:
    """distributed_image_translation.py flags (ref :48-126)."""
    p = translation_parser()
    p.description = 'TPU-native distributed DiscoGAN training'
    p.add_argument('--distributed', action='store_true',
                   help='Enable data-parallel training over the device mesh')
    p.add_argument('--multihost', action='store_true',
                   help='Multi-host TPU slice: calls jax.distributed.'
                        'initialize() (TPU runtime rendezvous — no '
                        'MASTER_ADDR/PORT), shards data per host, gates '
                        'logging/checkpoints to process 0')
    p.add_argument('--coordinator_address', type=str, default=None,
                   help='(multihost) explicit host:port rendezvous for '
                        'non-TPU backends / tests; on a TPU slice leave '
                        'unset for runtime autodetection')
    p.add_argument('--num_processes', type=int, default=None,
                   help='(multihost) process count when '
                        '--coordinator_address is given')
    p.add_argument('--process_id', type=int, default=None,
                   help='(multihost) this process\'s id when '
                        '--coordinator_address is given')
    p.add_argument('--local_rank', type=int, default=0,
                   help='Kept for launcher compatibility; SPMD needs no ranks')
    p.add_argument('--world_size', type=int, default=None,
                   help='Number of devices (default: all visible devices)')
    p.add_argument('--parallel_mode', type=str, default='dp',
                   choices=['dp', 'gspmd', 'spatial'],
                   help='(extension) parallelism strategy: dp = shard_map '
                        'data parallelism (DDP-faithful); gspmd = DPxTP '
                        'with wide conv kernels channel-sharded on the '
                        'model axis; spatial = DPxSP with image height '
                        'sharded (activation memory scales down with the '
                        'mesh — for 512px)')
    p.add_argument('--tp', type=int, default=None,
                   help='(extension) model-axis size for gspmd/spatial '
                        '(default: 2 when the device count is even)')
    p.add_argument('--load_gen_A', type=str, default=None,
                   help='Path to a gen_A checkpoint (.pth) to resume from')
    p.add_argument('--load_gen_B', type=str, default=None,
                   help='Path to a gen_B checkpoint (.pth) to resume from')
    p.add_argument('--load_dis_A', type=str, default=None,
                   help='Path to a dis_A checkpoint (.pth) to resume from')
    p.add_argument('--load_dis_B', type=str, default=None,
                   help='Path to a dis_B checkpoint (.pth) to resume from')
    return p


def angle_parser() -> argparse.ArgumentParser:
    """angle_pairing.py flags (ref :22-72)."""
    p = argparse.ArgumentParser(
        description='TPU-native DiscoGAN for angle pairing')
    return add_common_flags(p, task_default='car2car', epochs_default=10,
                            starting_rate_default=0.9, default_rate_default=0.9,
                            image_save_default=500, celebA_flags=False)


def inference_parser() -> argparse.ArgumentParser:
    """inference.py flags (ref :12-37)."""
    p = argparse.ArgumentParser(description='TPU-native DiscoGAN inference')
    p.add_argument('--device', type=str, default='tpu',
                   help='Device to use (tpu/cpu)')
    p.add_argument('--model_path', type=str, default=None,
                   help='Path to the saved model weights (required unless '
                        '--exported is given)')
    p.add_argument('--exported', type=str, default=None,
                   help='(extension) run from a jax.export StableHLO '
                        'artifact (tools/export_model.py) instead of a '
                        'checkpoint — no model weights needed; must match '
                        '--image_size and --batch_size (or be a symbolic-'
                        'batch artifact)')
    p.add_argument('--exported_rev', type=str, default=None,
                   help='(extension) reverse-generator artifact for the '
                        'reconstruction panel')
    p.add_argument('--input_path', type=str, required=True,
                   help='Path to input image or directory with images')
    p.add_argument('--output_dir', type=str, default='./inference_results',
                   help='Directory to save the inference results')
    p.add_argument('--image_size', type=int, default=64,
                   help='Image size')
    p.add_argument('--direction', type=str, default='AtoB',
                   choices=['AtoB', 'BtoA'],
                   help='Translation direction: AtoB or BtoA')
    p.add_argument('--use_extra_layers', action='store_true',
                   help='Kept for reference compatibility: the reference '
                        'Generator\'s extra_layers branches are functionally '
                        'identical (model.py:77-212), so this is accepted '
                        'and ignored')
    p.add_argument('--precision', type=str, default=None,
                   choices=['bf16', 'f32'],
                   help='(extension) compute precision; default auto '
                        '(bf16 on TPU). Use f32 to reproduce reference '
                        'outputs at the fidelity-gate level when comparing '
                        'against torch checkpoints.')
    p.add_argument('--dataset_type', type=str, default=None,
                   choices=['edges2handbags', 'edges2shoes', 'handbags2shoes',
                            'celebA', None],
                   help='Dataset type for domain-specific preprocessing')
    p.add_argument('--domain', type=str, default=None, choices=['A', 'B', None],
                   help='Domain for preprocessing (A: edge/sketch, B: real image)')
    p.add_argument('--batch_size', type=int, default=1,
                   help='(extension) batch directory inputs through the '
                        'generator for throughput; 1 = reference behavior')
    return p
