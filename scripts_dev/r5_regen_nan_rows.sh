#!/bin/bash
# Regenerate the 3 round-4 seed-sweep rows whose end-of-training eval loss
# read NaN (round-4 VERDICT next #2): seed3_f32, seed6_f32, seed6_f64 of
# artifacts/r4_kdv16_seedsweep. The round-5 rollout guard (losses.py:
# non-finite RK4 output mapped onto the divergence clip BEFORE jnp.clip,
# plus the eval_rollout_finite_frac diagnostic) makes the eval loss finite
# at exactly these corners. Same recipe + eval protocol as
# kdv16_seed_sweep.sh; rows are rewritten in place.
#
# Usage: bash scripts_dev/r5_regen_nan_rows.sh
set -u
OUT=artifacts/r4_kdv16_seedsweep
BASE="conservative=true,fine_size=512,num_trajectories=32,num_times=256,"
BASE+="time_delta=0.05,ic_scale=0.5,batch_size=128,"
BASE+="learning_rates=1e-3;3e-4,learning_stops=1500;2000,stencil_size=10,"
BASE+="num_time_steps=32,unroll_curriculum=8;16;32,"
BASE+="curriculum_stops=800;1400;2000"
for combo in "3 32" "6 32" "6 64"; do
  set -- $combo; seed=$1; filters=$2
  dst="$OUT/seed${seed}_f${filters}.jsonl"
  echo "=== regenerating seed $seed filters $filters ==="
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3000 \
    python -m pde_superresolution_tpu.scripts.run_sweep \
      --equation=kdv --factors=16 \
      --hparams="$BASE,seed=$seed,filters=$filters" \
      --num_eval_samples=32 --eval_time_max=10 \
      --output_path="$dst" || echo "FAILED seed=$seed filters=$filters"
  tail -1 "$dst"
done
PYTHONPATH=/root/repo:${PYTHONPATH:-} python scripts_dev/aggregate_seed_sweep.py "$OUT" | tail -20
echo DONE
