"""Inference CLI (ref inference.py).

Loads gen_B_final.pth for AtoB / gen_A_final.pth for BtoA from the model
dir (ref :127-132), translates a file or directory of jpg/png images, and
saves a matplotlib Input/Generated[/Reconstructed] panel as
<stem>_result.png (ref :70-112). Two reference defects fixed (SURVEY.md
appendix): the generator is jitted once and reused across images, and the
reverse generator is loaded once instead of per image (ref :183-186).
Eval-mode BN (running statistics) matches the reference's .eval() calls.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .common import parse_with_config, inference_parser
from ..data.preprocess import load_image
from ..models.generator import generator_apply
from ..train.checkpoint import load_reference_weights
from ..core.precision import default_policy


def save_images(input_image, generated_image, reverse_generated_image, save_path):
    """1x3 (or 1x2) Input/Generated/Reconstructed panel (ref :70-112).
    Images are HWC float arrays in [0,1]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [("Input", input_image), ("Generated", generated_image)]
    if reverse_generated_image is not None:
        panels.append(("Reconstructed", reverse_generated_image))
    fig, axes = plt.subplots(1, len(panels), figsize=(5 * len(panels), 5))
    for ax, (title, img) in zip(axes, panels):
        ax.imshow(np.clip(np.asarray(img), 0, 1))
        ax.set_title(title)
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(save_path)
    plt.close()


def main(argv=None):
    args = parse_with_config(inference_parser(), argv)
    import jax
    import jax.numpy as jnp

    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path.home() / ".cache" / "jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    batch_n = max(1, int(getattr(args, "batch_size", 1)))

    if getattr(args, "exported", None):
        # Artifact mode: the compiled forward (weights baked in) comes
        # from tools/export_model.py — no checkpoint or model code path.
        from ..tools.export_model import load_exported, load_artifact_sidecar

        def _load_artifact(path):
            exp = load_exported(path)
            aval = exp.in_avals[0]
            if tuple(aval.shape[1:]) != (args.image_size, args.image_size, 3):
                raise SystemExit(
                    f"artifact {path} expects input {tuple(aval.shape)}, "
                    f"which does not match --image_size={args.image_size}")
            b = aval.shape[0]
            if isinstance(b, int) and b != batch_n:
                raise SystemExit(
                    f"artifact {path} was exported with static batch {b}; "
                    f"pass --batch_size={b} or re-export with --batch 0 "
                    "(symbolic)")
            return exp

        fwd_exp = _load_artifact(args.exported)
        rev_exp = (_load_artifact(args.exported_rev)
                   if args.exported_rev else None)
        print(f"아티팩트 로드 성공: {args.exported}")

        # Artifacts bake the generator AND compute dtype at export time —
        # --direction/--precision cannot change them here. Cross-check
        # against the exporter's sidecar when present (a silent mismatch
        # would serve the wrong generator / the wrong dtype).
        meta = load_artifact_sidecar(args.exported)
        if meta is not None:
            want = "gen_B" if args.direction == "AtoB" else "gen_A"
            if meta.get("generator") and meta["generator"] != want:
                raise SystemExit(
                    f"artifact {args.exported} embeds {meta['generator']} "
                    f"(exported for --direction {meta.get('direction')}); "
                    f"--direction {args.direction} needs {want} — pass the "
                    f"matching direction or re-export")
            baked = meta.get("precision")
            if (args.precision and baked not in
                    (None, "backend-default", args.precision)):
                raise SystemExit(
                    f"--precision {args.precision} conflicts with the "
                    f"artifact's baked compute dtype ({baked}) — precision "
                    f"is fixed at export; re-export with --precision "
                    f"{args.precision}")
        else:
            if args.precision:
                print("경고: --precision 은 아티팩트 모드에서 무시됩니다 "
                      "(컴퓨트 dtype은 내보내기 시점에 고정됨)")
            print("참고: 아티팩트 모드에서 생성기는 아티팩트에 고정되어 "
                  "있습니다 — --direction 은 선택에 영향을 주지 않습니다 "
                  "(사이드카 .json 이 없어 교차 검증은 생략)")

        # Exported.call re-traces every invocation (measured 1.7-9x the
        # live-jit per-call latency, PERF.md); jit it once like the
        # checkpoint path jits translate.
        run_fwd = jax.jit(fwd_exp.call)
        run_rev = jax.jit(rev_exp.call) if rev_exp else None
    elif args.model_path:
        model_dir = Path(args.model_path)
        fwd_name = "gen_B" if args.direction == "AtoB" else "gen_A"
        rev_name = "gen_A" if args.direction == "AtoB" else "gen_B"

        try:
            fwd_params, fwd_state = load_reference_weights(
                model_dir / f"{fwd_name}_final.pth", fwd_name, args.image_size)
            print(f"모델 로드 성공: {model_dir / (fwd_name + '_final.pth')}")
        except Exception as e:
            print(f"모델 로드 실패: {e}")
            print("다음 파일이 있는지 확인하세요:")
            for f in model_dir.glob("*.pth"):
                print(f" - {f}")
            return 1

        rev = None
        rev_path = model_dir / f"{rev_name}_final.pth"
        if rev_path.exists():
            rev = load_reference_weights(rev_path, rev_name, args.image_size)

        policy = default_policy(getattr(args, 'precision', None))

        @jax.jit
        def translate(params, state, x):
            y, _ = generator_apply(params, state, x, policy=policy,
                                   training=False)
            return y

        def run_fwd(x):
            return translate(fwd_params, fwd_state, x)

        run_rev = ((lambda y: translate(rev[0], rev[1], y))
                   if rev is not None else None)
    else:
        print("inference.py: --model_path 또는 --exported 가 필요합니다")
        return 2

    input_path = Path(args.input_path)
    if input_path.is_dir():
        image_files = list(input_path.glob("*.jpg")) + list(input_path.glob("*.png"))
    else:
        image_files = [input_path]

    import time

    p50_samples = []
    pending: list[tuple] = []  # (file, image)

    def flush():
        if not pending:
            return
        files = [f for f, _ in pending]
        imgs = np.stack([im for _, im in pending])
        # Pad to the jitted batch shape so one program serves every chunk.
        pad = batch_n - len(pending) if batch_n > 1 else 0
        x = jnp.asarray(np.concatenate([imgs, np.zeros(
            (pad,) + imgs.shape[1:], np.float32)]) if pad else imgs)
        t0 = time.perf_counter()
        generated = run_fwd(x)
        reconstructed = None
        if run_rev is not None:
            reconstructed = run_rev(generated)
        gen_np = np.asarray(generated)
        rec_np = np.asarray(reconstructed) if reconstructed is not None else None
        # Per-image latency = batch time / rows COMPUTED (incl. padding):
        # attributing a padded batch to fewer real images would inflate
        # the reported p50 by up to batch_n x on the final partial chunk.
        dt = (time.perf_counter() - t0) / x.shape[0]
        # The first flush pays jit compilation; exclude it from the latency
        # metric so p50 reflects steady state.
        if flush.count > 0:
            p50_samples.extend([dt] * len(pending))
        flush.count += 1
        for i, (f, im) in enumerate(zip(files, imgs)):
            out = output_dir / f"{Path(f).stem}_result.png"
            save_images(im, gen_np[i],
                        rec_np[i] if rec_np is not None else None, out)
            print(f"저장 완료: {out}")
        pending.clear()

    flush.count = 0
    for img_file in image_files:
        print(f"Processing: {img_file}")
        img = load_image(img_file, args.image_size, args.domain, args.dataset_type)
        if img is None:
            continue
        pending.append((img_file, img))
        if len(pending) >= batch_n:
            flush()
    flush()

    if p50_samples:
        p50 = sorted(p50_samples)[len(p50_samples) // 2]
        print(f"p50 per-image latency: {p50 * 1000:.2f} ms")
    print(f"모든 이미지 처리 완료. 결과는 {output_dir}에 저장되었습니다.")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
