#!/bin/bash
# Environment setup + verification (ref setup_environment_script.sh).
#
# The reference creates a conda env and installs PyTorch/CUDA by nvcc
# probe. The TPU framework's dependencies (jax, numpy, PIL, cv2,
# matplotlib, pandas, pyyaml, tqdm — no flax/optax: models and Adam are
# hand-rolled) ship with standard TPU images; this script verifies the
# stack and the accelerator instead of installing.

set -u

echo "===== DiscoGAN TPU 환경 확인 ====="

python - <<'EOF'
import sys

print(f"Python: {sys.version.split()[0]}")
ok = True
for mod in ("jax", "numpy", "PIL", "matplotlib", "pandas", "tqdm",
            "yaml"):  # yaml: the --config flag (cli/common.py)
    try:
        m = __import__(mod)
        print(f"  {mod}: {getattr(m, '__version__', 'ok')}")
    except Exception as e:
        ok = False
        print(f"  {mod}: 누락! ({e})")
for mod in ("cv2", "torch"):
    try:
        m = __import__(mod)
        print(f"  {mod} (선택): {getattr(m, '__version__', 'ok')}")
    except Exception:
        print(f"  {mod} (선택): 없음 — 대체 구현 사용")

try:
    import threading

    # A wedged backend tunnel blocks jax.devices() in C (signal handlers
    # never fire — CLAUDE.md); only a watchdog thread + os._exit escapes.
    def _deadline():
        import os

        print("가속기 확인 시간 초과 — 백엔드 터널 상태를 확인하세요")
        os._exit(1)

    t = threading.Timer(120.0, _deadline)
    t.daemon = True
    t.start()
    import jax

    devs = jax.devices()
    print(f"디바이스: {devs}")
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    y = (x @ x).block_until_ready()
    print(f"연산 확인: 256x256 matmul OK (sum={float(y.sum()):.0f})")
    t.cancel()
except Exception as e:
    ok = False
    print(f"가속기 확인 실패: {e}")

print("환경 확인 " + ("성공" if ok else "실패"))
sys.exit(0 if ok else 1)
EOF

STATUS=$?
echo
if [ $STATUS -eq 0 ]; then
    echo "데이터셋 배치: ./datasets (또는 DISCOGAN_DATASETS_ROOT)"
    echo "학습 시작 예시:"
    echo "  python image_translation.py --task_name=edges2shoes --model_arch=discogan"
fi
exit $STATUS
