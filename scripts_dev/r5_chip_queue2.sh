#!/bin/bash
# Round-5 on-chip work queue, part 2 (continuation after the part-1 queue
# was interrupted mid bf16-flagship train; run_training resumes exactly
# from the step-2000 checkpoint). ONE TPU process at a time; each stage
# logs to /tmp/r5_q2_<stage>.log and the queue continues on stage failure.
set -u
cd /root/repo

run_stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ==="
  "$@" > "/tmp/r5_q2_${name}.log" 2>&1
  echo "=== stage $name rc=$? done $(date -u +%H:%M:%S) ==="
}

# 0. CORRECTED apples-to-apples rescore of the KdV-16x selection winner
#    under the exact zoo protocol (the part-1 queue ran it WITHOUT
#    --ic_scale=0.5 — a different, much harder protocol; unusable for the
#    zoo comparison). Protocol = RESULTS.md zoo row for ckpt_kdv16:
#    32 members, horizon 10, ic_scale 0.5, eval seed 0, dt 0.1.
run_stage rescore_kdv16_seed7_ic05 \
  env PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 2400 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir=/root/repo/artifacts/r5_kdv16_select/seed7 \
    --num_samples=32 --time_max=10 --ic_scale=0.5 --seed=0 \
    --reference_cache_dir=auto \
    --output_path=/tmp/r5_rescore_kdv16_seed7_ic05.h5

# 1. bf16 flagship science (VERDICT #5): resumes KS-8x bf16 from step 2000,
#    evals it, then KdV-16x bf16 seeds 1,2.
run_stage bf16_flagship bash scripts_dev/r5_bf16_flagship.sh

# 2. zoo median restatement evals (VERDICT #7)
run_stage zoo_median bash scripts_dev/r5_zoo_median_evals.sh

# 3. BASELINE config #5 rerun with round-4 levers (VERDICT #4, ~25 min)
run_stage config5_bf16 bash scripts_dev/r5_config5_bf16.sh

# 4. 65k host-staged RAM demo (VERDICT #3, ~15 min)
run_stage host65k bash scripts_dev/host65k_demo.sh

echo "QUEUE2 DONE $(date -u)"
