#!/bin/bash
# Clean re-timing of the config-#5 ensemble + eval legs (round 5): the
# first queue-3 walls were inflated by the Mosaic-wedge recovery from the
# pre-fix failed AOT compile (DECISIONS.md #15) and by fresh kernel
# compiles. With the compile cache warm and the chip settled, these walls
# are the honest "config #5 with round-4 levers" numbers. Science output
# (finite count, rms, spectrum peak, MAE/survival) must reproduce.
#
# Usage: bash scripts_dev/r5_config5_retime.sh
set -u
WK=/tmp/r5_config5

rm -f "$WK/ensemble.h5"
T0=$(date +%s)
PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
python -m pde_superresolution_tpu.scripts.run_ensemble \
  --checkpoint_dir="$WK/ckpt" --num_trajectories=10240 --time_max=10 \
  --warmup_time=44 --fused=auto --output_path="$WK/ensemble.h5" \
  > "$WK/ensemble_retime.log" 2>&1
rc_ens=$?
T1=$(date +%s)

rm -f "$WK/eval.h5"
PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
python -m pde_superresolution_tpu.scripts.run_evaluation \
  --checkpoint_dir="$WK/ckpt" --num_samples=32 --time_max=50 --warmup_time=44 \
  --reference_cache_dir=auto --output_path="$WK/eval.h5" \
  > "$WK/eval_retime.log" 2>&1
rc_eval=$?
T2=$(date +%s)

echo "ensemble=$((T1-T0))s rc=$rc_ens | eval=$((T2-T1))s rc=$rc_eval"
grep -E "finite|final MAE" "$WK/ensemble_retime.log" "$WK/eval_retime.log" | head -6
python - "$((T1-T0))" "$((T2-T1))" "$rc_ens" "$rc_eval" <<'EOF'
import json, sys
t_ens, t_eval, rc_ens, rc_eval = map(int, sys.argv[1:5])
art = "/root/repo/artifacts/r5_config5_bf16.json"
out = json.load(open(art))
out["walls_warm_retime"] = {"ensemble_s": t_ens, "eval_s": t_eval,
                            "exit_codes": [rc_ens, rc_eval]}
out["retime_note"] = (
    "warm-cache re-run after the chip settled: the first-pass ensemble/"
    "eval walls carried Mosaic-wedge recovery from the pre-fix failed "
    "AOT compile plus fresh kernel compiles")
json.dump(out, open(art, "w"), indent=1)
EOF
