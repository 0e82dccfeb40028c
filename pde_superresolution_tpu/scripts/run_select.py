"""Train N seeds of one recipe and keep the evaluation-protocol winner.

The round-4 seed sweep's verdict operationalized (RESULTS.md: "spend
compute on seeds and select by the evaluation protocol itself" — eval loss
is a weak selector, Spearman rho ~ 0.5 vs survival): train ``--num_seeds``
seeds of the ``--hparams`` recipe, score each with a cheap
``--select_samples``-member protocol eval (the content-keyed reference
cache shares ONE fine solve across all seeds), then re-score ONLY the
winner at the full ``--final_samples`` protocol with a FRESH eval key and
report both numbers (training/selection.py — the selection-bias guard).

No reference-counterpart script (SURVEY.md §6: survival distributions are
the paper's reporting unit; best-of-seeds is how they get used).

Example (the KS-32x plateau probe):
  python -m pde_superresolution_tpu.scripts.run_select \
      --output_dir=/tmp/sel_ks32 --num_seeds=8 \
      --hparams="equation=ks,conservative=true,resample_factor=32,..." \
      --eval_time_max=50 --eval_warmup=44
"""

import json

from absl import app, flags

from pde_superresolution_tpu import evaluate as eval_lib
from pde_superresolution_tpu.training import config as config_lib
from pde_superresolution_tpu.training import selection

FLAGS = flags.FLAGS

flags.DEFINE_string("output_dir", None,
                    "root directory: per-seed checkpoints + scores + "
                    "selection.json (resumable: finished seeds are skipped)",
                    required=True)
flags.DEFINE_string("hparams", "", "recipe overrides applied to every seed")
flags.DEFINE_integer("num_seeds", 8, "training seeds 0..N-1")
flags.DEFINE_list("seeds", None,
                  "explicit training-seed list (overrides --num_seeds)")
flags.DEFINE_integer("select_samples", 16,
                     "ensemble size of the cheap per-seed selection eval")
flags.DEFINE_integer("final_samples", 32,
                     "ensemble size of the winner's fresh full-protocol eval")
flags.DEFINE_integer("select_eval_seed", 12345,
                     "PRNG seed of the selection protocol (the historical "
                     "sweep key)")
flags.DEFINE_integer("final_eval_seed", 54321,
                     "PRNG seed of the winner's re-score; MUST differ from "
                     "--select_eval_seed (winner's-curse guard)")
flags.DEFINE_float("eval_time_max", 10.0, "eval horizon")
flags.DEFINE_float("eval_warmup", 0.0, "eval warmup (KS: ~44)")
flags.DEFINE_integer(
    "baseline_stencil_size", 0,
    "classic-baseline width; 0 = the model's own stencil width")
flags.DEFINE_string(
    "reference_cache_dir", "auto",
    "content-keyed cache for exact reference solves — every seed's "
    "selection eval reuses ONE fine solve. 'auto' = "
    "~/.cache/pde_superresolution_tpu/exact_refs; '' disables")


def main(argv):
    del argv
    config = config_lib.parse_hparams(FLAGS.hparams)
    result = selection.select_checkpoint(
        config,
        FLAGS.num_seeds,
        FLAGS.output_dir,
        eval_time_max=FLAGS.eval_time_max,
        eval_warmup=FLAGS.eval_warmup,
        select_eval_seed=FLAGS.select_eval_seed,
        select_samples=FLAGS.select_samples,
        final_eval_seed=FLAGS.final_eval_seed,
        final_samples=FLAGS.final_samples,
        baseline_stencil_size=FLAGS.baseline_stencil_size,
        reference_cache_dir=(
            eval_lib.default_reference_cache_dir()
            if FLAGS.reference_cache_dir == "auto"
            else (FLAGS.reference_cache_dir or None)
        ),
        seeds=(
            [int(s) for s in FLAGS.seeds] if FLAGS.seeds is not None else None
        ),
    )
    for row in result.rows:
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "winner_seed": result.winner_seed,
        "winner_checkpoint": result.winner_checkpoint,
        "selection_survival": result.selection_score["model_survival_median"],
        "final_survival": result.final_score["model_survival_median"],
        "final_mae_median": result.final_score["model_mae_median"],
        "final_diverged": result.final_score["model_diverged"],
    }), flush=True)


if __name__ == "__main__":
    app.run(main)
