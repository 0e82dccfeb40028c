#!/bin/bash
# Round-5 on-chip work queue (run AFTER the KS-32x selection frees the
# chip; ONE TPU process at a time — each stage is itself sequential).
# Order: cheapest/highest-information first, the long config-#5 rerun and
# the 65k RAM demo last. Each stage logs to /tmp/r5_queue_<stage>.log and
# the queue keeps going on stage failure (failures are visible in the
# per-stage rc lines).
set -u
cd /root/repo

run_stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ==="
  "$@" > "/tmp/r5_queue_${name}.log" 2>&1
  echo "=== stage $name rc=$? done $(date -u +%H:%M:%S) ==="
}

# 0. apples-to-apples re-scores of the selection winners under the exact
#    standard run_evaluation protocol the zoo table uses (cheap: cached
#    fine solves), so the zoo swap decision is protocol-identical.
rescore() {
  local ck=$1 tmax=$2 warm=$3 out=$4
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 2400 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir="$ck" --num_samples=32 --time_max="$tmax" \
    --warmup_time="$warm" --reference_cache_dir=auto \
    --output_path="/tmp/r5_rescore_$(basename "$out" .log).h5"
}
run_stage rescore_kdv16_seed7 rescore \
  /root/repo/artifacts/r5_kdv16_select/seed7 10 0 rescore_kdv16_seed7.log
if [ -d /root/repo/artifacts/r5_ks32_select ] && \
   [ -f /root/repo/artifacts/r5_ks32_select/selection.json ]; then
  W=$(python -c "import json;print(json.load(open('/root/repo/artifacts/r5_ks32_select/selection.json'))['winner_checkpoint'])")
  run_stage rescore_ks32_winner rescore "$W" 50 44 rescore_ks32_winner.log
fi

# 1. regenerate the 3 NaN seed-sweep rows (VERDICT #2 follow-through)
run_stage regen_nan bash scripts_dev/r5_regen_nan_rows.sh

# 2. bf16 flagship science (VERDICT #5): KS-8x flagship + 2 KdV seeds
run_stage bf16_flagship bash scripts_dev/r5_bf16_flagship.sh

# 3. zoo median restatement evals (VERDICT #7)
run_stage zoo_median bash scripts_dev/r5_zoo_median_evals.sh

# 4. BASELINE config #5 rerun with round-4 levers (VERDICT #4, ~25 min)
run_stage config5_bf16 bash scripts_dev/r5_config5_bf16.sh

# 5. 65k host-staged RAM demo (VERDICT #3, ~15 min)
run_stage host65k bash scripts_dev/host65k_demo.sh

echo "QUEUE DONE $(date -u)"
