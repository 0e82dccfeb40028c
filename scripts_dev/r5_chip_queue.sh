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
#    fine solves), so the zoo swap decision is protocol-identical — PLUS
#    an eval-key-noise matrix at KS 32x: the selection's fresh-key
#    re-score read 32.0 where the selection key read 40.2 (bias 8.2 t.u.),
#    so the committed ckpt_ks32's 40.25 (zoo key 0) may itself carry
#    eval-key luck. Cross-scoring {ckpt_ks32, winner} x {key 0, key 54321}
#    separates model quality from eval-set noise.
rescore() {
  local ck=$1 tmax=$2 warm=$3 seed=$4 tag=$5
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 2400 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir="$ck" --num_samples=32 --time_max="$tmax" \
    --warmup_time="$warm" --seed="$seed" --reference_cache_dir=auto \
    --output_path="/tmp/r5_rescore_${tag}.h5"
}
run_stage rescore_kdv16_seed7 rescore \
  /root/repo/artifacts/r5_kdv16_select/seed7 10 0 0 kdv16_seed7
W=/root/repo/artifacts/r5_ks32_select/seed0
run_stage rescore_ks32_winner_key0 rescore "$W" 50 44 0 ks32_winner_key0
run_stage rescore_ckptks32_key54321 rescore \
  /root/repo/artifacts/ckpt_ks32 50 44 54321 ckptks32_key54321

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
