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
# "filt32"/"filt64" = the FILTER counts (model capacity), not dtypes —
# the old f32/f64 labels were easily misread next to the sweep's real
# fp32-vs-fp64 precision comparisons
print(f"{'seed':>4} | {'filt32 surv':>11} {'mae':>8} {'loss':>8} | "
      f"{'filt64 surv':>11} {'mae':>8} {'loss':>8}")
for s in seeds:
    vals = []
    for f in (32, 64):
        r = rows.get((s, f))
        if r:
            vals += [r["model_survival_median"], r["model_mae"],
                     r["eval_total"]]
        else:
            vals += [float("nan")] * 3
    print(f"{s:>4} | {vals[0]:>11.2f} {vals[1]:>8.3f} {vals[2]:>8.3f} | "
          f"{vals[3]:>11.2f} {vals[4]:>8.3f} {vals[5]:>8.3f}")

summary = {}
for f in (32, 64):
    surv = np.array([rows[(s, f)]["model_survival_median"]
                     for s in seeds if (s, f) in rows])
    mae = np.array([rows[(s, f)]["model_mae"]
                    for s in seeds if (s, f) in rows])
    loss = np.array([rows[(s, f)]["eval_total"]
                     for s in seeds if (s, f) in rows])
    div = sum(rows[(s, f)]["model_diverged"] for s in seeds if (s, f) in rows)
    # nan-robust throughout (not just eval loss): one non-finite field must
    # not blank a whole capacity row; per-metric NaN counts are reported
    q1, q2, q3 = np.nanpercentile(surv, [25, 50, 75])
    summary[f"filt{f}"] = {
        "n_seeds": int(surv.size),
        "survival_median": round(float(q2), 2),
        "survival_iqr": [round(float(q1), 2), round(float(q3), 2)],
        "survival_mean": round(float(np.nanmean(surv)), 2),
        "mae_median": round(float(np.nanmedian(mae)), 3),
        # an occasional non-finite END-OF-TRAINING eval loss (e.g. one
        # non-finite eval batch) does not invalidate the seed's
        # survival/MAE science row; the counts are reported alongside
        "eval_loss_median": round(float(np.nanmedian(loss)), 3),
        "eval_loss_nan_seeds": int(np.sum(~np.isfinite(loss))),
        "survival_nan_seeds": int(np.sum(~np.isfinite(surv))),
        "mae_nan_seeds": int(np.sum(~np.isfinite(mae))),
        "total_diverged_members": int(div),
    }
# is the filters-64 eval-loss improvement consistent per seed (the r3 claim)?
common = [s for s in seeds if (s, 32) in rows and (s, 64) in rows]
deltas = [rows[(s, 64)]["eval_total"] - rows[(s, 32)]["eval_total"]
          for s in common]
summary["filt64_minus_filt32_eval_loss_per_seed"] = [round(d, 4) for d in deltas]
summary["filt64_minus_filt32_survival_per_seed"] = [
    round(rows[(s, 64)]["model_survival_median"]
          - rows[(s, 32)]["model_survival_median"], 2)
    for s in common
]
print(json.dumps(summary, indent=1))
with open(os.path.join(OUT, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
