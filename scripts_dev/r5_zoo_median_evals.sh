#!/bin/bash
# Re-score the three KS zoo checkpoints under their standard protocol with
# the round-5 median-reporting run_evaluation (round-4 VERDICT next #7):
# the round-4 precision study proved long-horizon KS final-MAE MEANS are
# tail-sensitive to reference rounding while medians are robust, so the
# zoo table should lead with medians. The fine reference solves come from
# the content-keyed cache (one per protocol), so each eval is minutes.
#
# Usage: bash scripts_dev/r5_zoo_median_evals.sh
# Output: artifacts/r5_zoo_median/<ckpt>.log (the printed median/mean rows)
set -u
OUT=/root/repo/artifacts/r5_zoo_median
mkdir -p "$OUT"
for ck in ckpt_ks8_u16s8 ckpt_ks16 ckpt_ks32; do
  log="$OUT/${ck}.log"
  if grep -q "final MAE median" "$log" 2>/dev/null; then echo "skip $ck"; continue; fi
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 2400 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir="/root/repo/artifacts/$ck" \
    --num_samples=32 --time_max=50 --warmup_time=44 \
    --reference_cache_dir=auto --output_path="/tmp/r5_zoo_${ck}.h5" \
    > "$log" 2>&1
  echo "=== $ck (rc=$?) ==="
  grep -E "final MAE|survival" "$log" | head -6
done
echo DONE
