#!/bin/bash
# BASELINE config #5 end-to-end RE-RUN with the round-4 levers (round-4
# VERDICT next #4): same 10,240-trajectory KS-8x recipe as the round-3
# 1453-s row, now with tower_dtype=bfloat16 (measured 1.18x on the
# flagship step), --host_data=auto, and the model-aware stable_dt that
# run_ensemble/run_evaluation apply automatically since round 4. Publishes
# the new generate/train/integrate/eval wall split + the same science
# checks (eval loss vs baseline, MAE/survival) into
# artifacts/r5_config5_bf16.json.
#
# Usage: bash scripts_dev/r5_config5_bf16.sh [workdir]
set -u
WK=${1:-/tmp/r5_config5}
CK=$WK/ckpt
ART=/root/repo/artifacts/r5_config5_bf16.json
rm -rf "$CK"; mkdir -p "$WK"

HP="equation=ks,conservative=true,resample_factor=8,fine_size=1024,"
HP+="num_trajectories=10240,num_times=64,time_delta=0.1,warmup_time=44,"
HP+="stencil_size=8,num_time_steps=16,batch_size=512,"
HP+="learning_rates=1e-3;3e-4,learning_stops=1200;2000,"
HP+="tower_dtype=bfloat16"

T0=$(date +%s)
PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3600 \
python -m pde_superresolution_tpu.scripts.run_training \
  --checkpoint_dir="$CK" --large_ensemble --host_data=auto \
  --hparams="$HP" > "$WK/train.log" 2>&1
rc_train=$?
T1=$(date +%s)

PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
python -m pde_superresolution_tpu.scripts.run_ensemble \
  --checkpoint_dir="$CK" --num_trajectories=10240 --time_max=10 \
  --warmup_time=44 --fused=auto --output_path="$WK/ensemble.h5" \
  > "$WK/ensemble.log" 2>&1
rc_ens=$?
T2=$(date +%s)

PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
python -m pde_superresolution_tpu.scripts.run_evaluation \
  --checkpoint_dir="$CK" --num_samples=32 --time_max=50 --warmup_time=44 \
  --reference_cache_dir=auto --output_path="$WK/eval.h5" \
  > "$WK/eval.log" 2>&1
rc_eval=$?
T3=$(date +%s)

echo "train=$((T1-T0))s rc=$rc_train | ensemble=$((T2-T1))s rc=$rc_ens | eval=$((T3-T2))s rc=$rc_eval"
tail -2 "$CK/metrics.jsonl"
grep -E "final MAE" "$WK/eval.log" | head -4
python - "$((T1-T0))" "$((T2-T1))" "$((T3-T2))" "$rc_train" "$rc_ens" "$rc_eval" "$CK" "$WK" <<'EOF'
import json, sys
t_train, t_ens, t_eval, rc1, rc2, rc3 = map(int, sys.argv[1:7])
ck, wk = sys.argv[7], sys.argv[8]
last = json.loads(open(f"{ck}/metrics.jsonl").readlines()[-1])
eval_lines = [l.strip() for l in open(f"{wk}/eval.log") if "final MAE" in l]
ens_lines = [l.strip() for l in open(f"{wk}/ensemble.log") if
             any(k in l for k in ("finite", "traj-steps", "rms"))][-4:]
out = {"recipe": "BASELINE config #5 + tower_dtype=bfloat16 + host_data=auto",
       "round3_reference_walls": {"train_s": 1453, "ensemble_s": 54, "eval_s": 641},
       "walls": {"train_s": t_train, "ensemble_s": t_ens, "eval_s": t_eval},
       "exit_codes": [rc1, rc2, rc3],
       "final_train_metrics": last, "evaluation_lines": eval_lines,
       "ensemble_lines": ens_lines}
json.dump(out, open("/root/repo/artifacts/r5_config5_bf16.json", "w"), indent=1)
print("speedup_train:", round(1453 / max(t_train, 1), 3))
EOF
