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

# task:arch:batch:extra map (ref :8-13 uses batch 128 at 64px; celebA
# needs the attribute split flags — ref passes --style_A=Male
# --style_B=Smiling, without which the resolver has no attribute column).
JOBS=(
    "edges2shoes:discogan:128:"
    "edges2handbags:discogan:128:"
    "handbags2shoes:discogan:128:"
    "facescrub:discogan:128:"
    "celebA:discogan:128:--style_A=Male --style_B=Smiling"
)

SEQUENTIAL="${DISCOGAN_SEQUENTIAL:-1}"
PIDS=()
TASKS_BG=()
FAILED=0

for spec in "${JOBS[@]}"; do
    IFS=: read -r task arch batch extra <<< "$spec"
    log="$LOG_DIR/${task}.log"
    echo "시작: $task ($arch, batch $batch) -> $log"
    if [ "$SEQUENTIAL" = "1" ]; then
        if ! python image_translation.py --task_name="$task" \
            --model_arch="$arch" --batch_size="$batch" $extra \
            > "$log" 2>&1; then
            echo "실패: $task (로그: $log)"
            FAILED=1
        fi
    else
        python image_translation.py --task_name="$task" --model_arch="$arch" \
            --batch_size="$batch" $extra > "$log" 2>&1 &
        PIDS+=($!)
        TASKS_BG+=("$task")
    fi
done

if [ "$SEQUENTIAL" != "1" ]; then
    echo "실행 중인 작업: ${PIDS[*]}"
    echo "상태 확인: tail -f $LOG_DIR/<task>.log"
    for i in "${!PIDS[@]}"; do
        if ! wait "${PIDS[$i]}"; then
            echo "실패: ${TASKS_BG[$i]} (로그: $LOG_DIR/${TASKS_BG[$i]}.log)"
            FAILED=1
        fi
    done
fi
if [ "$FAILED" = "1" ]; then
    echo "일부 작업 실패 — 로그를 확인하세요"
    exit 1
fi
echo "모든 작업 완료"
