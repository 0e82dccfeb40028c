"""Aggregate the KdV-16x seed sweep (scripts_dev/kdv16_seed_sweep.sh).

Reads artifacts/r4_kdv16_seedsweep/seed{N}_f{F}.jsonl and prints the
per-seed table plus median/IQR per capacity — the reporting unit the
round-3 VERDICT asked for (8 seeds x {filters 32, 64}, fixed recipe).
"""

import glob
import json
import os
import re
import sys

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/r4_kdv16_seedsweep"

rows = {}
for path in sorted(glob.glob(os.path.join(OUT, "seed*_f*.jsonl"))):
    m = re.search(r"seed(\d+)_f(\d+)\.jsonl", path)
    seed, filt = int(m.group(1)), int(m.group(2))
    with open(path) as f:
        rows[(seed, filt)] = json.loads(f.readline())

seeds = sorted({s for s, _ in rows})
print(f"{'seed':>4} | {'f32 surv':>8} {'f32 mae':>8} {'f32 loss':>8} | "
      f"{'f64 surv':>8} {'f64 mae':>8} {'f64 loss':>8}")
for s in seeds:
    vals = []
    for f in (32, 64):
        r = rows.get((s, f))
        if r:
            vals += [r["model_survival_median"], r["model_mae"],
                     r["eval_total"]]
        else:
            vals += [float("nan")] * 3
    print(f"{s:>4} | {vals[0]:>8.2f} {vals[1]:>8.3f} {vals[2]:>8.3f} | "
          f"{vals[3]:>8.2f} {vals[4]:>8.3f} {vals[5]:>8.3f}")

summary = {}
for f in (32, 64):
    surv = np.array([rows[(s, f)]["model_survival_median"]
                     for s in seeds if (s, f) in rows])
    mae = np.array([rows[(s, f)]["model_mae"]
                    for s in seeds if (s, f) in rows])
    loss = np.array([rows[(s, f)]["eval_total"]
                     for s in seeds if (s, f) in rows])
    div = sum(rows[(s, f)]["model_diverged"] for s in seeds if (s, f) in rows)
    q1, q2, q3 = np.percentile(surv, [25, 50, 75])
    summary[f"f{f}"] = {
        "n_seeds": int(surv.size),
        "survival_median": round(float(q2), 2),
        "survival_iqr": [round(float(q1), 2), round(float(q3), 2)],
        "survival_mean": round(float(surv.mean()), 2),
        "mae_median": round(float(np.median(mae)), 3),
        # nanmedian: an occasional non-finite END-OF-TRAINING eval loss
        # (e.g. one non-finite eval batch) does not invalidate the seed's
        # survival/MAE science row; the count is reported alongside
        "eval_loss_median": round(float(np.nanmedian(loss)), 3),
        "eval_loss_nan_seeds": int(np.sum(~np.isfinite(loss))),
        "total_diverged_members": int(div),
    }
# is the f64 eval-loss improvement consistent per seed (the r3 claim)?
common = [s for s in seeds if (s, 32) in rows and (s, 64) in rows]
deltas = [rows[(s, 64)]["eval_total"] - rows[(s, 32)]["eval_total"]
          for s in common]
summary["f64_minus_f32_eval_loss_per_seed"] = [round(d, 4) for d in deltas]
summary["f64_minus_f32_survival_per_seed"] = [
    round(rows[(s, 64)]["model_survival_median"]
          - rows[(s, 32)]["model_survival_median"], 2)
    for s in common
]
print(json.dumps(summary, indent=1))
with open(os.path.join(OUT, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
