#!/bin/bash
# Round-5 chip queue 6: extend the multi-key zoo restatement (queue 5,
# artifacts/r5_multikey_zoo/) to the REMAINING zoo rows so the entire
# checkpoint table is stated under the DECISIONS #18 convention:
#  1. ckpt_burgers8   — 3 keys x 32 members, horizon 3 (zoo protocol).
#  2. ckpt_burgers64  — same keys; shares the Burgers fine-solve cache
#     entries with stage 1 (the reference cache does not key the
#     resample factor).
#  3. ckpt_kdv8       — keys 0,1,2, ic_scale 0.5, horizon 10; shares the
#     KdV fine solves already cached by queue 5's kdv16 stage.
#  4. ckpt_kdv16_f64  — keys 12345,1,2 at the sweep protocol
#     (time_delta 0.05, its committed row's key 12345 included).
#  5. r5_kdv16_select/seed7 — keys 0,1,2 x 32 members: the selection
#     winner scored EXACTLY like ckpt_kdv16's pooled row (queue 5 ran it
#     at 3x16 only).
# One process at a time; generous timeouts (no Mosaic here, but KdV/
# Burgers fine solves compile fresh ETDRK4 programs).
set -u
cd /root/repo

run_stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ==="
  "$@" > "/tmp/r5_q6_${name}.log" 2>&1
  echo "=== stage $name rc=$? done $(date -u +%H:%M:%S) ==="
}

multikey() {  # $1 ckpt dir, $2 seeds, rest = extra flags
  local ck=$1 seeds=$2 out=$3; shift 3
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3600 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir="$ck" --num_samples=32 --seeds="$seeds" \
    --reference_cache_dir=auto --output_path="$out" "$@"
}

run_stage burgers8_multikey multikey artifacts/ckpt_burgers8 0,1,2 \
  /tmp/r5_mk_burgers8.h5 --time_max=3
run_stage burgers64_multikey multikey artifacts/ckpt_burgers64 0,1,2 \
  /tmp/r5_mk_burgers64.h5 --time_max=3
run_stage kdv8_multikey multikey artifacts/ckpt_kdv8 0,1,2 \
  /tmp/r5_mk_kdv8.h5 --time_max=10 --ic_scale=0.5
run_stage kdv16f64_multikey multikey artifacts/ckpt_kdv16_f64 12345,1,2 \
  /tmp/r5_mk_kdv16f64.h5 --time_max=10 --ic_scale=0.5 --time_delta=0.05
run_stage seed7_multikey multikey artifacts/r5_kdv16_select/seed7 0,1,2 \
  /tmp/r5_mk_seed7.h5 --time_max=10 --ic_scale=0.5

cp /tmp/r5_q6_*_multikey.log artifacts/r5_multikey_zoo/ 2>/dev/null
echo "QUEUE6 DONE $(date -u)"
