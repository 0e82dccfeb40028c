#!/bin/bash
# Round-5 seed-selection runs (VERDICT items 1 + 8): train 8 seeds of the
# best-known recipe at each hard corner, score by the evaluation protocol
# (16-member selection eval, cache-shared fine solve), keep the winner and
# re-score it at the full 32-member protocol under a FRESH eval key.
#
#   bash scripts_dev/r5_selection.sh kdv16   # ~45 min on one v5e chip
#   bash scripts_dev/r5_selection.sh ks32    # ~2 h on one v5e chip
#
# Outputs: /root/repo/artifacts/r5_<corner>_select/{seed*_score.json,
# selection.json}; per-seed checkpoints stay in the same tree (commit only
# the winner — see RESULTS.md round-5 delta).
set -u
CORNER=${1:?usage: r5_selection.sh kdv16|ks32}
OUT=/root/repo/artifacts/r5_${CORNER}_select
mkdir -p "$OUT"

KDV16="equation=kdv,resample_factor=16,conservative=true,fine_size=512,"
KDV16+="num_trajectories=32,num_times=256,time_delta=0.05,ic_scale=0.5,"
KDV16+="batch_size=128,learning_rates=1e-3;3e-4,learning_stops=1500;2000,"
KDV16+="stencil_size=10,num_time_steps=32,unroll_curriculum=8;16;32,"
KDV16+="curriculum_stops=800;1400;2000"

KS32="equation=ks,resample_factor=32,conservative=true,fine_size=1024,"
KS32+="num_trajectories=32,num_times=128,time_delta=0.1,warmup_time=44,"
KS32+="batch_size=128,learning_rates=1e-3;3e-4,learning_stops=2000;3000,"
KS32+="stencil_size=10,num_time_steps=32,unroll_curriculum=8;16;32,"
KS32+="curriculum_stops=1000;2000;3000"

case "$CORNER" in
  kdv16) HP=$KDV16; TMAX=10; WARM=0 ;;
  ks32)  HP=$KS32;  TMAX=50; WARM=44 ;;
  *) echo "unknown corner $CORNER"; exit 2 ;;
esac

# timeout must comfortably exceed the whole 8-seed run (XLA-only; no
# Mosaic compiles in the training path — DECISIONS.md #15 discipline).
# Transient axon tunnel faults (remote_compile: "response body closed")
# have killed two runs mid-seed; the tool is RESUMABLE (finished seeds
# skip via cached score JSONs), so retry up to 3 times. pipefail keeps
# the python rc visible through the tail.
set -o pipefail
for attempt in 1 2 3; do
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 10800 \
    python -m pde_superresolution_tpu.scripts.run_select \
      --output_dir="$OUT" --num_seeds=8 \
      --hparams="$HP" \
      --select_samples=16 --final_samples=32 \
      --select_eval_seed=12345 --final_eval_seed=54321 \
      --eval_time_max="$TMAX" --eval_warmup="$WARM" \
      2>&1 | tail -20
  rc=$?
  echo "attempt $attempt rc=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 30  # let the tunnel settle before resuming
done
echo "rc=$rc"
