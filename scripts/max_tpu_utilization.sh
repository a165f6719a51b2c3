#!/bin/bash
# Utilization helper (ref max_gpu_utilization.sh).
#
# The reference probes free GPUs (<500MB used) and offers an interactive
# menu of four modes: same task everywhere / per-GPU tasks / HP search /
# distributed. Here the pool is the TPU device set; modes map to repeated
# independent runs, the HP search tool, or mesh data parallelism.

set -u

echo "===== TPU 활용 도우미 ====="
# timeout: a wedged backend tunnel hangs jax.device_count() in C where
# even Ctrl-C cannot interrupt it (CLAUDE.md probe-first discipline).
N_DEV=$(timeout 120 python - <<'EOF'
try:
    import jax
    print(jax.device_count())
except Exception:
    print(0)
EOF
)
N_DEV="${N_DEV:-0}"
if [ "$N_DEV" = "0" ]; then
    echo "경고: 디바이스 확인 실패/시간 초과 — 백엔드 터널 상태를 확인하세요"
fi
echo "사용 가능한 디바이스: $N_DEV"

echo "1. 단일 작업 (모든 디바이스, 데이터 병렬)"
echo "2. 작업별 독립 실행"
echo "3. 하이퍼파라미터 탐색"
echo "4. 분산 학습 (tops2hanbok 512px)"
read -r -p "> " MODE

case "$MODE" in
    1)
        read -r -p "task_name [edges2shoes]: " TASK
        TASK="${TASK:-edges2shoes}"
        python distributed_image_translation.py --distributed \
            --task_name="$TASK" --model_arch=discogan
        ;;
    2)
        bash "$(dirname "$0")/parallel-training.sh"
        ;;
    3)
        read -r -p "task_name [edges2shoes]: " TASK
        TASK="${TASK:-edges2shoes}"
        read -r -p "trials [8]: " TRIALS
        python hyperparameter_search.py --task_name="$TASK" \
            --trials="${TRIALS:-8}" --early_stopping
        ;;
    4)
        python distributed_image_translation.py --distributed \
            --task_name=tops2hanbok --image_size=512 --batch_size=32
        ;;
    *)
        echo "알 수 없는 모드: $MODE" ;;
esac

read -r -p "모니터를 시작할까요? [y/N] " MON
if [ "$MON" = "y" ]; then
    python tpu_monitor.py --auto-restart
fi
