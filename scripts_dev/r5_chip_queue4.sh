#!/bin/bash
# Round-5 chip queue 4 (after r5_post_queue3.sh):
#  1. config-#5 fused ensemble leg with the EXACT round-3 command (no
#     --output_path, so --fused=auto engages the Mosaic multi-step
#     kernel) — the apples-to-apples row against round 3's 54 s / 4.43M
#     traj-steps/s; also the first on-chip drive of the learned-RK4
#     kernel built from a bf16-tower-trained checkpoint's f32 master
#     weights.
#  2. KS-32x THREE-KEY pooled evaluation (run_evaluation --seeds): keys
#     0 and 54321 have cached fine solves (zoo + cross-score matrix);
#     key 1 is fresh. The pooled 96-member median is the definitive
#     multi-key statement of the KS-32x plateau band (DECISIONS #18).
#  3. bench.py sanity (one JSON line).
set -u
cd /root/repo

run_stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ==="
  "$@" > "/tmp/r5_q4_${name}.log" 2>&1
  echo "=== stage $name rc=$? done $(date -u +%H:%M:%S) ==="
}

config5_fused() {
  T0=$(date +%s)
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
  python -m pde_superresolution_tpu.scripts.run_ensemble \
    --checkpoint_dir=/tmp/r5_config5/ckpt --num_trajectories=10240 \
    --time_max=10 --warmup_time=44 --fused=auto || return 1
  T1=$(date +%s)
  python - "$((T1-T0))" <<'EOF'
import json, sys
art = "/root/repo/artifacts/r5_config5_bf16.json"
out = json.load(open(art))
out["fused_ensemble_round3_command"] = {
    "wall_s": int(sys.argv[1]),
    "note": ("round-3-comparable leg: run_ensemble --fused=auto without "
             "--output_path (the resumable-HDF5 legs above use the "
             "per-step XLA/fused-RHS path instead of the multi-step "
             "Mosaic kernel)")}
json.dump(out, open(art, "w"), indent=1)
EOF
}
run_stage config5_fused config5_fused

run_stage ks32_multikey \
  env PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 4800 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir=/root/repo/artifacts/ckpt_ks32 \
    --num_samples=32 --time_max=50 --warmup_time=44 --seeds=0,1,54321 \
    --reference_cache_dir=auto \
    --output_path=/tmp/r5_ks32_multikey.h5

run_stage bench env PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
  python bench.py

echo "QUEUE4 DONE $(date -u)"
