#!/bin/bash
# Data-parallel training launcher (ref distributed_training.sh).
#
# Drop-in flag parity with the reference: the same --name=value long
# options (ref distributed_training.sh:26-75), the same timestamped
# results/models/logs layout (ref :79-82). The reference wraps
# torch.distributed.launch with per-GPU env pinning; under SPMD one
# process drives the whole mesh, so --gpus only sizes the mesh
# (--world_size) and no env pinning is needed.

set -e

TIMESTAMP=$(date +%Y%m%d_%H%M%S)

TASK_NAME="edges2shoes"
MODEL_ARCH="discogan"
BATCH_SIZE=64
EPOCHS=50
LEARNING_RATE=0.0002
IMAGE_SIZE=64
STYLE_ARGS=""
WORLD_SIZE=""   # default: all visible devices

while [[ $# -gt 0 ]]; do
    key="$1"
    case $key in
        --task_name=*)     TASK_NAME="${key#*=}" ;;
        --model_arch=*)    MODEL_ARCH="${key#*=}" ;;
        --batch_size=*)    BATCH_SIZE="${key#*=}" ;;
        --epochs=*)        EPOCHS="${key#*=}" ;;
        --learning_rate=*) LEARNING_RATE="${key#*=}" ;;
        --image_size=*)    IMAGE_SIZE="${key#*=}" ;;
        --style_A=*)       STYLE_ARGS="$STYLE_ARGS --style_A=${key#*=}" ;;
        --style_B=*)       STYLE_ARGS="$STYLE_ARGS --style_B=${key#*=}" ;;
        --gpus=*)
            # Reference-compat: a device-ID list sizes the mesh.
            IFS=',' read -ra DEV_ARRAY <<< "${key#*=}"
            WORLD_SIZE=${#DEV_ARRAY[@]}
            ;;
        --world_size=*)    WORLD_SIZE="${key#*=}" ;;
        *)
            echo "알 수 없는 인자: $key"
            exit 1
            ;;
    esac
    shift
done

RESULTS_DIR="./results/distributed_${TASK_NAME}_${MODEL_ARCH}_${TIMESTAMP}"
MODELS_DIR="./models/distributed_${TASK_NAME}_${MODEL_ARCH}_${TIMESTAMP}"
LOG_DIR="./logs/distributed_${TIMESTAMP}"
mkdir -p "$LOG_DIR"

echo "분산 학습 시작:"
echo "  작업: $TASK_NAME"
echo "  모델: $MODEL_ARCH"
echo "  배치 크기: $BATCH_SIZE (디바이스당)"
echo "  에포크: $EPOCHS"
echo "  학습률: $LEARNING_RATE"
echo "  이미지 크기: $IMAGE_SIZE"
echo "  결과 디렉토리: $RESULTS_DIR"
echo "  모델 디렉토리: $MODELS_DIR"
echo "  로그 디렉토리: $LOG_DIR"

CMD=(python distributed_image_translation.py
     --distributed
     --task_name="$TASK_NAME"
     --model_arch="$MODEL_ARCH"
     --batch_size="$BATCH_SIZE"
     --epochs="$EPOCHS"
     --learning_rate="$LEARNING_RATE"
     --image_size="$IMAGE_SIZE"
     --results_dir="$RESULTS_DIR"
     --models_dir="$MODELS_DIR")
[ -n "$WORLD_SIZE" ] && CMD+=(--world_size="$WORLD_SIZE")

echo "실행: ${CMD[*]} $STYLE_ARGS"
# shellcheck disable=SC2086
"${CMD[@]}" $STYLE_ARGS > "$LOG_DIR/train.log" 2>&1

echo "분산 학습이 완료되었습니다."
echo "로그: $LOG_DIR/train.log"
