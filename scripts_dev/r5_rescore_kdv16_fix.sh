#!/bin/bash
# Corrected zoo-protocol rescore of the KdV-16x selection winner (seed 7).
# The part-1 queue ran it without --ic_scale=0.5 (wrong protocol) and the
# part-2 queue's first attempt overwrote PYTHONPATH, dropping the axon TPU
# plugin (the CLAUDE.md trap). Waits for queue2 to free the chip first.
set -u
cd /root/repo
while ps -p "$(cat /tmp/r5_queue2.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  sleep 60
done
PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 2400 \
python -m pde_superresolution_tpu.scripts.run_evaluation \
  --checkpoint_dir=/root/repo/artifacts/r5_kdv16_select/seed7 \
  --num_samples=32 --time_max=10 --ic_scale=0.5 --seed=0 \
  --reference_cache_dir=auto \
  --output_path=/tmp/r5_rescore_kdv16_seed7_ic05.h5
echo "RESCORE rc=$?"
