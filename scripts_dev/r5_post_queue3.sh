#!/bin/bash
# Post-queue-3 chip work: (0) the KdV-16x winner rescore with the
# PYTHONPATH fix — the part-2/part-3 attempts OVERWROTE PYTHONPATH, which
# drops /root/.axon_site and with it the axon TPU plugin ("Backend 'axon'
# is not in the list of known backends"; misdiagnosed in part 2 as a
# transient tunnel fault) — and (1) the warm-cache config-#5 re-timing.
set -u
cd /root/repo

run_stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ==="
  "$@" > "/tmp/r5_p3_${name}.log" 2>&1
  echo "=== stage $name rc=$? done $(date -u +%H:%M:%S) ==="
}

rescore() {
  for attempt in 1 2; do
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 2400 \
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

run_stage config5_retime bash scripts_dev/r5_config5_retime.sh

# (2) on-chip verification of the multi-key eval mode (--seeds): per-key
# lines + pooled median, each key getting its own cached fine solve. Uses
# the KdV-16x selection winner at the zoo protocol's ic_scale.
run_stage multikey_verify \
  env PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 2400 \
  python -m pde_superresolution_tpu.scripts.run_evaluation \
    --checkpoint_dir=/root/repo/artifacts/r5_kdv16_select/seed7 \
    --num_samples=16 --time_max=10 --ic_scale=0.5 --seeds=0,1,2 \
    --reference_cache_dir=auto \
    --output_path=/tmp/r5_multikey_kdv16.h5

# (3) on-TPU Pallas hardware-equivalence tests — covers the new fused-RHS
# auto-tiler against the XLA twins on the real chip. GENEROUS timeout:
# SIGTERM mid-Mosaic-compile wedges the chip (DECISIONS.md #15).
run_stage pallas_tpu_tests \
  env PYTHONPATH=/root/repo:${PYTHONPATH:-} PDE_TPU_TESTS=1 timeout 1800 \
  python -m pytest tests/test_pallas_kernels.py -q

echo "POSTQ3 DONE $(date -u)"
