"""Batch-size auto-tuner (ref batch_size_optimization.py).

The reference binary-searches batch size by instantiating 2 generators + 2
discriminators, running the forward-only graph (AB/BA/ABA/BAB + 4 D
forwards, ref :46-101) and reading nvidia-smi free-memory deltas. The TPU
equivalent probes HBM: it jits that same forward graph at each candidate
batch and catches RESOURCE_EXHAUSTED; when the backend exposes
device.memory_stats() the utilization target (--target_memory) is honored,
otherwise pure OOM bisection applies. Results ship as
batch_size_results.json with the safety margin and example commands
(ref :147-205).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU HBM에 최적화된 배치 크기 찾기")
    parser.add_argument("--device", type=int, default=0, help="사용할 디바이스 ID")
    parser.add_argument("--gpu", type=int, default=None,
                        help="참조 구현 호환 플래그 (--device 와 동일)")
    parser.add_argument("--model_arch", type=str, default="discogan",
                        choices=["discogan", "recongan", "gan"])
    parser.add_argument("--image_size", type=int, default=64)
    parser.add_argument("--min_batch", type=int, default=16)
    parser.add_argument("--max_batch", type=int, default=512)
    parser.add_argument("--step", type=int, default=16)
    parser.add_argument("--target_memory", type=float, default=0.85,
                        help="목표 메모리 사용률 (0.0-1.0)")
    parser.add_argument("--extra_layers", action="store_true",
                        help="참조 구현 호환용 (아키텍처 동일)")
    parser.add_argument("--safety_margin", type=float, default=0.9,
                        help="결과 배치 크기에 적용할 안전 마진")
    parser.add_argument("--train_step", action="store_true",
                        help="순전파 대신 전체 학습 스텝으로 측정 (더 정확)")
    parser.add_argument("--output", type=str, default="batch_size_results.json")
    return parser.parse_args(argv)


def _memory_utilization(device) -> float | None:
    try:
        stats = device.memory_stats()
        if stats and stats.get("bytes_limit"):
            # bytes_in_use, NOT peak_bytes_in_use: the peak is a
            # process-lifetime high-water mark, so after one over-target
            # candidate every smaller candidate would re-read the old
            # peak and be rejected — the binary search's refinement
            # phase would reject everything below the first failure.
            return stats.get("bytes_in_use", 0) / stats["bytes_limit"]
    except Exception:
        pass
    return None


def test_batch_size(batch_size: int, image_size: int, *, train_step: bool = False,
                    device_id: int = 0, model_arch: str = "discogan"):
    """Try one candidate. Returns (ok, mem_utilization|None)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.precision import default_policy
    from ..train.step import TrainConfig, init_train_state, make_train_steps
    from ..train.graph import discogan_losses

    devices = jax.devices()
    if not 0 <= device_id < len(devices):
        raise SystemExit(
            f"--device {device_id} 범위 밖: 사용 가능한 디바이스 "
            f"{len(devices)}개 (0..{len(devices) - 1})")
    device = devices[device_id]
    # model_arch changes what the probe allocates (the gan arch trains
    # only the gen_B/dis_B subset — ~half the Adam/master state) — the
    # recommendation must measure the graph it is labeled with.
    cfg = TrainConfig(image_size=image_size, model_arch=model_arch)
    rng = np.random.RandomState(0)
    A = jax.device_put(
        jnp.asarray(rng.rand(batch_size, image_size, image_size, 3), jnp.float32),
        device)
    B = jax.device_put(
        jnp.asarray(rng.rand(batch_size, image_size, image_size, 3), jnp.float32),
        device)
    try:
        ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg), device)
        if train_step:
            gen_step, dis_step = make_train_steps(cfg)
            ts, losses = dis_step(ts, A, B, jnp.float32(0.01))
            ts, losses = gen_step(ts, A, B, jnp.float32(0.01))
        else:
            policy = default_policy()

            @jax.jit
            def fwd(models, states, A, B):
                losses, _ = discogan_losses(models, states, A, B, policy=policy)
                return losses

            losses = fwd(ts["models"], ts["model_states"], A, B)
        ok = all(np.isfinite(float(v)) for v in losses.values())
        return ok, _memory_utilization(device)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower() \
                or "OOM" in msg:
            return False, None
        raise


def find_optimal_batch_size(args) -> dict:
    """Step-quantized binary search (ref :103-166)."""
    lo = args.min_batch // args.step
    hi = args.max_batch // args.step
    best = 0
    best_util = None
    history = []
    while lo <= hi:
        mid = (lo + hi) // 2
        bs = mid * args.step
        if bs == 0:
            lo = mid + 1
            continue
        print(f"배치 크기 {bs} 테스트 중...")
        ok, util = test_batch_size(bs, args.image_size, train_step=args.train_step,
                                   device_id=args.device,
                                   model_arch=args.model_arch)
        over_target = util is not None and util > args.target_memory
        history.append({"batch_size": bs, "ok": bool(ok),
                        "memory_utilization": util})
        if ok and not over_target:
            best = bs
            best_util = util
            lo = mid + 1
        else:
            hi = mid - 1

    recommended = max(args.step,
                      int(best * args.safety_margin) // args.step * args.step) \
        if best else 0
    return {
        "model_arch": args.model_arch,
        "image_size": args.image_size,
        "max_working_batch_size": best,
        "memory_utilization": best_util,
        "safety_margin": args.safety_margin,
        "recommended_batch_size": recommended,
        "history": history,
    }


def main(argv=None):
    args = parse_args(argv)
    if args.gpu is not None:
        args.device = args.gpu
    result = find_optimal_batch_size(args)
    out = Path(args.output)
    out.write_text(json.dumps(result, indent=2))
    print(f"\n결과 저장: {out}")
    bs = result["recommended_batch_size"]
    if bs:
        print("\n===== 권장 배치 크기 =====")
        print(f"최대 작동 배치: {result['max_working_batch_size']}")
        print(f"권장 배치 (마진 적용): {bs}")
        print("\n예시 명령:")
        print(f"  python image_translation.py --task_name=edges2shoes "
              f"--model_arch={args.model_arch} --image_size={args.image_size} "
              f"--batch_size={bs}")
        print(f"  python distributed_image_translation.py --distributed "
              f"--task_name=tops2hanbok --image_size=512 --batch_size={bs}")
    else:
        print("작동하는 배치 크기를 찾지 못했습니다.")
    return result


if __name__ == "__main__":
    main()
