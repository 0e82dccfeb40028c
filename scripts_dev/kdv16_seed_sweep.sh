#!/bin/bash
# KdV-16x recipe ranking under seed noise (round-3 VERDICT weak #6 / next #8):
# 8 training seeds x {filters 32, 64} at the fixed best recipe (curriculum
# 8->16->32, stencil 10), ONE eval protocol (run_sweep: eval key 12345,
# ic_scale 0.5, horizon 10, 32 members, matched-width classic baseline).
# The exact-reference cache makes all 16 evals share one fine solve.
#
# Usage: bash scripts_dev/kdv16_seed_sweep.sh [outdir]
set -u
OUT=${1:-artifacts/r4_kdv16_seedsweep}
mkdir -p "$OUT"
BASE="conservative=true,fine_size=512,num_trajectories=32,num_times=256,"
BASE+="time_delta=0.05,ic_scale=0.5,batch_size=128,"
BASE+="learning_rates=1e-3;3e-4,learning_stops=1500;2000,stencil_size=10,"
BASE+="num_time_steps=32,unroll_curriculum=8;16;32,"
BASE+="curriculum_stops=800;1400;2000"
for seed in 0 1 2 3 4 5 6 7; do
  for filters in 32 64; do
    dst="$OUT/seed${seed}_f${filters}.jsonl"
    if [ -s "$dst" ]; then echo "skip $dst (exists)"; continue; fi
    echo "=== seed $seed filters $filters ==="
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3000 \
      python -m pde_superresolution_tpu.scripts.run_sweep \
        --equation=kdv --factors=16 \
        --hparams="$BASE,seed=$seed,filters=$filters" \
        --num_eval_samples=32 --eval_time_max=10 \
        --output_path="$dst" || echo "FAILED seed=$seed filters=$filters"
  done
done
echo DONE
