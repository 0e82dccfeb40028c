#!/bin/bash
# Round-5 on-chip work queue, part 3: (0) re-run the config-#5 ensemble leg
# through the VMEM-auto-tiled fused RHS (the part-2 run failed AOT compile
# at batch 10240 — pallas_kernels._auto_rhs_tile now splits the batch);
# (1) retry the KdV-16x winner rescore under the exact zoo protocol (the
# part-2 attempt died on a transient axon-registration fault at startup);
# (2) the 65k host-staged RAM demo with the /usr/bin/time-free meter.
# ONE TPU process at a time; continue on stage failure.
set -u
cd /root/repo

run_stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ==="
  "$@" > "/tmp/r5_q3_${name}.log" 2>&1
  echo "=== stage $name rc=$? done $(date -u +%H:%M:%S) ==="
}

# 0. config-#5 ensemble leg, fixed kernel. Fresh store for a clean wall.
config5_ensemble() {
  rm -f /tmp/r5_config5/ensemble.h5
  local t0=$(date +%s)
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
  python -m pde_superresolution_tpu.scripts.run_ensemble \
    --checkpoint_dir=/tmp/r5_config5/ckpt --num_trajectories=10240 \
    --time_max=10 --warmup_time=44 --fused=auto \
    --output_path=/tmp/r5_config5/ensemble.h5
  local rc=$? t1=$(date +%s)
  echo "ensemble wall=$((t1-t0))s rc=$rc"
  python - "$((t1-t0))" "$rc" <<'EOF'
import json, sys
wall, rc = int(sys.argv[1]), int(sys.argv[2])
art = "/root/repo/artifacts/r5_config5_bf16.json"
out = json.load(open(art))
out["walls"]["ensemble_s"] = wall
out["exit_codes"][1] = rc
out["ensemble_note"] = (
    "re-run after the round-5 fused-RHS VMEM auto-tile fix; the part-2 "
    "attempt failed Mosaic AOT compile at the untiled batch-10240 block")
json.dump(out, open(art, "w"), indent=1)
EOF
  return $rc
}
run_stage config5_ensemble config5_ensemble

# 1. KdV-16x selection-winner rescore under the exact zoo protocol
#    (32 members, horizon 10, ic_scale 0.5, eval key 0) — 2 attempts.
rescore() {
  for attempt in 1 2; do
    PYTHONPATH=/root/repo timeout 2400 \
    python -m pde_superresolution_tpu.scripts.run_evaluation \
      --checkpoint_dir=/root/repo/artifacts/r5_kdv16_select/seed7 \
      --num_samples=32 --time_max=10 --ic_scale=0.5 --seed=0 \
      --reference_cache_dir=auto \
      --output_path=/tmp/r5_rescore_kdv16_seed7_ic05.h5 && return 0
    echo "attempt $attempt failed; retrying in 30s"; sleep 30
  done
  return 1
}
run_stage rescore_kdv16_seed7_ic05 rescore

# 2. 65k host-staged RAM demo (round-4 VERDICT #3)
run_stage host65k bash scripts_dev/host65k_demo.sh

echo "QUEUE3 DONE $(date -u)"
