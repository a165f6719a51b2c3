#!/usr/bin/env bash
# Run the full suite in chunks. On this 1-core dev host the naive
# `pytest tests/` takes ~14 min and dies silently under a ~10-min
# command timeout; these chunks each stay well under it (see CLAUDE.md).
set -u
cd "$(dirname "$0")/.."

CHUNKS=(
  "tests/test_ops.py tests/test_losses.py tests/test_preprocess.py tests/test_resolvers.py tests/test_goldens.py tests/test_native.py tests/test_cache.py"
  "tests/test_fidelity.py tests/test_train_step.py tests/test_reference_parity.py tests/test_scan_step.py tests/test_remat.py tests/test_slim_state.py"
  "tests/test_dp.py tests/test_gspmd.py tests/test_parallel_modes.py tests/test_multihost.py tests/test_dp_scan.py"
  "tests/test_gspmd_scan.py tests/test_round4_fixes.py tests/test_round5_fixes.py"
  "tests/test_memory_analysis.py tests/test_paired.py tests/test_lean_dis.py tests/test_auto_remat.py"
  "tests/test_cli.py tests/test_learning.py"
  "tests/test_serve.py tests/test_preemption.py tests/test_pipeline.py tests/test_round2_fixes.py tests/test_round3_fixes.py tests/test_review_fixes.py"
  "tests/test_hp_search_e2e.py tests/test_tools.py tests/test_pallas.py tests/test_pallas_conv.py tests/test_pallas_head.py tests/test_pallas_halo_conv.py tests/test_export.py tests/test_bench_guard.py tests/test_roofline.py"
)

# Guard: every tests/test_*.py must appear in exactly one chunk, so a new
# test file cannot be silently skipped.
listed=$(printf '%s\n' "${CHUNKS[@]}" | tr ' ' '\n' | sort)
actual=$(ls tests/test_*.py | sort)
if [ "$listed" != "$actual" ]; then
    echo "run_tests.sh: chunk list is out of date with tests/:" >&2
    diff <(echo "$listed") <(echo "$actual") >&2
    exit 2
fi

fail=0
for i in "${!CHUNKS[@]}"; do
    echo "== chunk $((i+1))/${#CHUNKS[@]}: ${CHUNKS[$i]}"
    # shellcheck disable=SC2086
    python -m pytest ${CHUNKS[$i]} -q "$@" || fail=1
done
exit $fail
