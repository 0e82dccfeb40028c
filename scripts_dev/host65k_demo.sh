#!/bin/bash
# HBM-exceeding ensemble demo (round-3 VERDICT next #6): train on 65,536
# KS-8x trajectories — ~9 GB of coarse fields + labels, more than a 16 GB
# v5e can hold next to fine-generation chunks + params + unrolled-rollout
# activations — via the host-staged data path (--host_data=auto kicks in
# above ~6 GB). Generation still runs on device, chunk by chunk. The
# training recipe is deliberately short (unroll 4, 300 steps): the
# demonstration target is the DATA PATH at scale, not model quality.
#
# Usage: bash scripts_dev/host65k_demo.sh [ckpt_dir]
set -u
CK=${1:-/tmp/ck_host65k}
rm -rf "$CK"
T0=$(date +%s)
PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3000 \
python -m pde_superresolution_tpu.scripts.run_training \
  --checkpoint_dir="$CK" --large_ensemble --host_data=auto \
  --chunk_trajectories=1024 \
  --hparams="equation=ks,conservative=true,resample_factor=8,fine_size=1024,num_trajectories=65536,num_times=64,time_delta=0.1,warmup_time=44,stencil_size=8,num_time_steps=4,batch_size=512,learning_rates=1e-3,learning_stops=300,eval_interval=100,checkpoint_interval=300"
rc=$?
T1=$(date +%s)
echo "WALL_SECONDS=$((T1 - T0)) rc=$rc"
tail -1 "$CK/metrics.jsonl"
