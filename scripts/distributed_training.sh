#!/bin/bash
# Data-parallel training launcher (ref distributed_training.sh).
#
# The reference wraps torch.distributed.launch with per-GPU env pinning;
# under SPMD one process drives the whole mesh, so this script just parses
# the same arguments and invokes the distributed trainer with --distributed.

set -e

TASK_NAME="edges2shoes"
MODEL_ARCH="discogan"
BATCH_SIZE=64
EPOCHS=50
LEARNING_RATE=0.0002
IMAGE_SIZE=64
STYLE_A=""
STYLE_B=""
WORLD_SIZE=""   # default: all visible devices

usage() {
    echo "사용법: $0 [-t task] [-a arch] [-b batch] [-e epochs] [-l lr] [-s image_size] [-A style_A] [-B style_B] [-w world_size]"
    exit 1
}

while getopts "t:a:b:e:l:s:A:B:w:h" opt; do
    case $opt in
        t) TASK_NAME="$OPTARG" ;;
        a) MODEL_ARCH="$OPTARG" ;;
        b) BATCH_SIZE="$OPTARG" ;;
        e) EPOCHS="$OPTARG" ;;
        l) LEARNING_RATE="$OPTARG" ;;
        s) IMAGE_SIZE="$OPTARG" ;;
        A) STYLE_A="$OPTARG" ;;
        B) STYLE_B="$OPTARG" ;;
        w) WORLD_SIZE="$OPTARG" ;;
        h|*) usage ;;
    esac
done

CMD=(python distributed_image_translation.py
     --distributed
     --task_name="$TASK_NAME"
     --model_arch="$MODEL_ARCH"
     --batch_size="$BATCH_SIZE"
     --epochs="$EPOCHS"
     --learning_rate="$LEARNING_RATE"
     --image_size="$IMAGE_SIZE")

[ -n "$STYLE_A" ] && CMD+=(--style_A="$STYLE_A")
[ -n "$STYLE_B" ] && CMD+=(--style_B="$STYLE_B")
[ -n "$WORLD_SIZE" ] && CMD+=(--world_size="$WORLD_SIZE")

echo "실행: ${CMD[*]}"
exec "${CMD[@]}"
