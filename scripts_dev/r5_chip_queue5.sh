#!/bin/bash
# Round-5 chip queue 5 (this session; /tmp and the reference cache were
# cleared between sessions, so queue 4 never ran — this re-plans it):
#  0. chip probe (fresh-compile matmul, forced fetch).
#  1. config-#5 bf16 RETRAIN (the /tmp checkpoint from the r5_config5_bf16
#     run is gone) — exact same recipe, gives this session's checkpoint
#     for stage 2 and a second wall sample of the 862-s row.
#  2. config-#5 fused ensemble leg with the EXACT round-3 command (no
#     --output_path, so --fused=auto engages the Mosaic multi-step
#     kernel) — the apples-to-apples row against round 3's 54 s / 4.43M
#     traj-steps/s, from a bf16-tower-trained checkpoint's f32 master
#     weights.
#  3. KS-32x THREE-KEY pooled evaluation (run_evaluation --seeds=0,1,54321)
#     — the definitive multi-key statement of the plateau band
#     (DECISIONS #18). Fine solves are cold (cache cleared): ~8 min each.
#  4./5. KS-16x and KS-8x flagship multi-key evals — cache-warm after
#     stage 3 (the reference cache deliberately does not key the resample
#     factor, so all KS zoo rows share the same three fine solves).
#  6. KdV-16x zoo checkpoint multi-key eval (keys 0,1,2, ic_scale 0.5).
#  7. bench.py sanity (one JSON line).
set -u
cd /root/repo

run_stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ==="
  "$@" > "/tmp/r5_q5_${name}.log" 2>&1
  echo "=== stage $name rc=$? done $(date -u +%H:%M:%S) ==="
}

probe() {
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 600 python - <<'EOF'
import time, jax, jax.numpy as jnp, numpy as np
t0 = time.time()
x = jnp.ones((2048, 2048), jnp.bfloat16)
y = np.asarray(jax.jit(lambda a: a @ a)(x))  # forced fetch
print(f"probe ok: {float(y[0,0])} in {time.time()-t0:.1f}s on {jax.devices()}")
EOF
}
run_stage probe probe

config5_train() {
  local WK=/tmp/r5_config5 CK=/tmp/r5_config5/ckpt
  rm -rf "$CK"; mkdir -p "$WK"
  local HP="equation=ks,conservative=true,resample_factor=8,fine_size=1024,"
  HP+="num_trajectories=10240,num_times=64,time_delta=0.1,warmup_time=44,"
  HP+="stencil_size=8,num_time_steps=16,batch_size=512,"
  HP+="learning_rates=1e-3;3e-4,learning_stops=1200;2000,"
  HP+="tower_dtype=bfloat16"
  local T0=$(date +%s)
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3600 \
  python -m pde_superresolution_tpu.scripts.run_training \
    --checkpoint_dir="$CK" --large_ensemble --host_data=auto \
    --hparams="$HP" || return 1
  echo "TRAIN_WALL_S=$(( $(date +%s) - T0 ))"
  tail -1 "$CK/metrics.jsonl"
}
run_stage config5_train config5_train

config5_fused() {
  local T0=$(date +%s)
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
  python -m pde_superresolution_tpu.scripts.run_ensemble \
    --checkpoint_dir=/tmp/r5_config5/ckpt --num_trajectories=10240 \
    --time_max=10 --warmup_time=44 --fused=auto || return 1
  local T1=$(date +%s)
  python - "$((T1-T0))" <<'EOF'
import json, sys
art = "/root/repo/artifacts/r5_config5_bf16.json"
out = json.load(open(art))
out["fused_ensemble_round3_command"] = {
    "wall_s": int(sys.argv[1]),
    "note": ("round-3-comparable leg (round-3: 54 s): run_ensemble "
             "--fused=auto WITHOUT --output_path (the resumable-HDF5 legs "
             "above use the per-step XLA/fused-RHS path instead of the "
             "multi-step Mosaic kernel); checkpoint retrained this session "
             "(same recipe) because /tmp was cleared")}
json.dump(out, open(art, "w"), indent=1)
EOF
}
run_stage config5_fused config5_fused

multikey() {  # $1 ckpt dir, $2 seeds, $3 extra flags..., writes /tmp/<name>.h5
  local ck=$1 seeds=$2; shift 2
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 5400 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir="$ck" --num_samples=32 --seeds="$seeds" \
    --reference_cache_dir=auto "$@"
}
run_stage ks32_multikey multikey /root/repo/artifacts/ckpt_ks32 0,1,54321 \
  --time_max=50 --warmup_time=44 --output_path=/tmp/r5_mk_ks32.h5
run_stage ks16_multikey multikey /root/repo/artifacts/ckpt_ks16 0,1,54321 \
  --time_max=50 --warmup_time=44 --output_path=/tmp/r5_mk_ks16.h5
run_stage ks8_multikey multikey /root/repo/artifacts/ckpt_ks8_u16s8 0,1,54321 \
  --time_max=50 --warmup_time=44 --output_path=/tmp/r5_mk_ks8.h5
run_stage kdv16_multikey multikey /root/repo/artifacts/ckpt_kdv16 0,1,2 \
  --time_max=10 --ic_scale=0.5 --output_path=/tmp/r5_mk_kdv16.h5

run_stage bench env PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1800 \
  python bench.py

mkdir -p artifacts/r5_multikey_zoo
cp /tmp/r5_q5_*_multikey.log artifacts/r5_multikey_zoo/ 2>/dev/null
echo "QUEUE5 DONE $(date -u)"
