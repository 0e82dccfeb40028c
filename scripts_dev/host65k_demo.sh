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
# Writes artifacts/r5_host65k.json: wall time, host-RAM high-water
# (child max RSS), and the final metrics row.
set -u
CK=${1:-/tmp/ck_host65k}
ART=/root/repo/artifacts/r5_host65k.json
rm -rf "$CK"
T0=$(date +%s)
# /usr/bin/time is absent in this image; meter the training process's peak
# RSS via getrusage(RUSAGE_CHILDREN) from a thin non-TPU wrapper (the same
# number `/usr/bin/time -v` reports as "Maximum resident set size"). Only
# the child is a TPU client — the one-process rule holds.
PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 7200 \
python - "$CK" <<'PYEOF'
import json, resource, subprocess, sys
ck = sys.argv[1]
hp = ("equation=ks,conservative=true,resample_factor=8,fine_size=1024,"
      "num_trajectories=65536,num_times=64,time_delta=0.1,warmup_time=44,"
      "stencil_size=8,num_time_steps=4,batch_size=512,learning_rates=1e-3,"
      "learning_stops=300,eval_interval=100,checkpoint_interval=300")
rc = subprocess.call([
    sys.executable, "-m", "pde_superresolution_tpu.scripts.run_training",
    f"--checkpoint_dir={ck}", "--large_ensemble", "--host_data=auto",
    "--chunk_trajectories=1024", f"--hparams={hp}",
])
maxrss_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
with open("/tmp/host65k_time.txt", "w") as f:
    json.dump({"rc": rc, "maxrss_kb": maxrss_kb}, f)
sys.exit(rc)
PYEOF
rc=$?
T1=$(date +%s)
WALL=$((T1 - T0))
MAXRSS_KB=$(python -c "import json;print(json.load(open('/tmp/host65k_time.txt'))['maxrss_kb'])" 2>/dev/null || echo 0)
LAST=$(tail -1 "$CK/metrics.jsonl" 2>/dev/null || echo '{}')
echo "WALL_SECONDS=$WALL rc=$rc maxrss_kb=$MAXRSS_KB"
python - "$WALL" "$rc" "${MAXRSS_KB:-0}" "$LAST" <<'EOF'
import json, sys
wall, rc, maxrss_kb, last = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
out = {
    "config": {"equation": "ks", "resample_factor": 8, "fine_size": 1024,
               "num_trajectories": 65536, "num_times": 64,
               "num_time_steps": 4, "batch_size": 512, "steps": 300,
               "chunk_trajectories": 1024, "host_data": "auto"},
    "wall_seconds": wall, "exit_code": rc,
    "host_ram_high_water_gb": round(maxrss_kb / 1024 / 1024, 2),
    "final_metrics": json.loads(last),
}
with open("/root/repo/artifacts/r5_host65k.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out)[:400])
EOF
