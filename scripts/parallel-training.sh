#!/bin/bash
# Independent parallel training runs (ref parallel-training.sh).
#
# The reference backgrounds five single-GPU runs with a static GPU->task
# map and per-task logs, then polls status interactively. On a TPU host
# the analogue is one run per worker slot (chip / host); with a single
# chip the runs serialize via the DISCOGAN_SEQUENTIAL=1 default.

set -u

LOG_DIR="./parallel_logs"
mkdir -p "$LOG_DIR"

# task:arch:batch map (ref :8-13 uses batch 128 at 64px).
JOBS=(
    "edges2shoes:discogan:128"
    "edges2handbags:discogan:128"
    "handbags2shoes:discogan:128"
    "facescrub:discogan:128"
    "celebA:discogan:128"
)

SEQUENTIAL="${DISCOGAN_SEQUENTIAL:-1}"
PIDS=()

for spec in "${JOBS[@]}"; do
    IFS=: read -r task arch batch <<< "$spec"
    log="$LOG_DIR/${task}.log"
    echo "시작: $task ($arch, batch $batch) -> $log"
    if [ "$SEQUENTIAL" = "1" ]; then
        python image_translation.py --task_name="$task" --model_arch="$arch" \
            --batch_size="$batch" > "$log" 2>&1
    else
        python image_translation.py --task_name="$task" --model_arch="$arch" \
            --batch_size="$batch" > "$log" 2>&1 &
        PIDS+=($!)
    fi
done

if [ "$SEQUENTIAL" != "1" ]; then
    echo "실행 중인 작업: ${PIDS[*]}"
    echo "상태 확인: tail -f $LOG_DIR/<task>.log"
    wait
fi
echo "모든 작업 완료"
