#!/bin/bash
# bf16-tower science validation at the flagship (round-4 VERDICT next #5):
# (a) train the KS-8x flagship recipe (3000 steps, the ckpt_ks8_u16s8
#     recipe) at tower_dtype=bfloat16 and score it under the standard
#     32-member horizon-50 protocol (f32 flagship: MAE 0.0145, survival
#     50/50);
# (b) 2 more KdV-16x seeds (1, 2) at bf16 under the round-4 sweep protocol
#     (seed 0 already measured mid-distribution:
#     artifacts/r4_kdv16_bf16tower.jsonl).
# Raises the bf16 recommendation from n=1 to n=3 + flagship, or records an
# honest regression.
#
# Usage: bash scripts_dev/r5_bf16_flagship.sh [outdir]
set -u
OUT=${1:-/root/repo/artifacts/r5_bf16_flagship}
mkdir -p "$OUT"
CK=/tmp/r5_ks8_bf16

# --- (a) KS-8x flagship at bf16 -------------------------------------------
KS8="equation=ks,conservative=true,resample_factor=8,warmup_time=44,"
KS8+="stencil_size=8,num_time_steps=16,learning_rates=1e-3;3e-4,"
KS8+="learning_stops=2000;3000,tower_dtype=bfloat16"
if [ ! -s "$OUT/ks8_eval.log" ]; then
  # NOTE: no rm -rf — run_training resumes exactly (config-validated) from
  # any checkpoint already in $CK, so an interrupted train continues.
  T0=$(date +%s)
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 7200 \
  python -m pde_superresolution_tpu.scripts.run_training \
    --checkpoint_dir="$CK" --hparams="$KS8" > "$OUT/ks8_train.log" 2>&1
  echo "ks8 train rc=$? wall=$(( $(date +%s) - T0 ))s"
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir="$CK" --num_samples=32 --time_max=50 --warmup_time=44 \
    --reference_cache_dir=auto --output_path=/tmp/r5_ks8_bf16_eval.h5 \
    > "$OUT/ks8_eval.log" 2>&1
  grep -E "final MAE" "$OUT/ks8_eval.log" | head -4
fi

# --- (b) KdV-16x bf16 seeds 1,2 (round-4 sweep protocol) -------------------
BASE="conservative=true,fine_size=512,num_trajectories=32,num_times=256,"
BASE+="time_delta=0.05,ic_scale=0.5,batch_size=128,"
BASE+="learning_rates=1e-3;3e-4,learning_stops=1500;2000,stencil_size=10,"
BASE+="num_time_steps=32,unroll_curriculum=8;16;32,"
BASE+="curriculum_stops=800;1400;2000,tower_dtype=bfloat16"
for seed in 1 2; do
  dst="$OUT/kdv16_bf16_seed${seed}.jsonl"
  if [ -s "$dst" ]; then echo "skip $dst"; continue; fi
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3000 \
    python -m pde_superresolution_tpu.scripts.run_sweep \
      --equation=kdv --factors=16 \
      --hparams="$BASE,seed=$seed" \
      --num_eval_samples=32 --eval_time_max=10 \
      --output_path="$dst" || echo "FAILED seed=$seed"
  tail -1 "$dst"
done
echo DONE
