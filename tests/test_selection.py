"""Seed-selection tests (training/selection.py).

The tool the round-4 seed sweep demanded: train N seeds, score by the
evaluation protocol (cheap, cache-shared fine solve), keep the winner,
re-score it on FRESH eval trajectories. No reference counterpart.
"""

import json
import os

import numpy as np
import pytest

from pde_superresolution_tpu.models import ModelConfig
from pde_superresolution_tpu.training import TrainingConfig, selection
from pde_superresolution_tpu.training import loop as loop_lib

# sized for a 1-core CI host (one compile dominates; training is 6 steps)
TINY = TrainingConfig(
    equation="burgers",
    conservative=True,
    resample_factor=4,
    fine_size=64,
    num_trajectories=3,
    num_times=12,
    time_delta=0.1,
    model=ModelConfig(num_layers=1, filters=4, stencil_size=4),
    num_time_steps=1,
    learning_rates=(1e-3,),
    learning_stops=(6,),
    batch_size=8,
    eval_interval=6,
    checkpoint_interval=6,
)

PROTOCOL = dict(
    eval_time_max=0.2,
    select_eval_seed=1,
    select_samples=2,
    final_eval_seed=2,
    final_samples=3,
)


class TestSelectCheckpoint:
    @pytest.fixture(scope="class")
    def selected(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("select")
        out = str(root / "sel")
        cache = str(root / "refs")
        result = selection.select_checkpoint(
            TINY, 2, out, reference_cache_dir=cache, **PROTOCOL
        )
        return result, out, cache

    def test_structure_and_artifacts(self, selected):
        result, out, cache = selected
        assert len(result.rows) == 2
        assert result.winner_seed in (0, 1)
        assert result.winner_checkpoint == os.path.join(
            out, f"seed{result.winner_seed}"
        )
        # both checkpoints exist and the winner reloads
        for s in (0, 1):
            assert os.path.isdir(os.path.join(out, f"seed{s}"))
            assert os.path.exists(os.path.join(out, f"seed{s}_score.json"))
        model, params, cfg = loop_lib.load_model(result.winner_checkpoint)
        assert cfg.seed == result.winner_seed
        with open(os.path.join(out, "selection.json")) as f:
            summary = json.load(f)
        assert summary["winner_seed"] == result.winner_seed
        assert "selection_bias" in summary

    def test_winner_is_the_protocol_argmax(self, selected):
        result, _, _ = selected
        best = min(result.rows, key=selection._rank_key)
        assert best["seed"] == result.winner_seed
        assert result.selection_score is best

    def test_final_score_uses_fresh_eval(self, selected):
        """The winner's re-score must come from the FRESH key and the full
        member count — never the selection eval (winner's curse)."""
        result, _, _ = selected
        assert result.final_score["eval_seed"] == PROTOCOL["final_eval_seed"]
        assert result.final_score["num_samples"] == PROTOCOL["final_samples"]
        assert result.selection_score["eval_seed"] == (
            PROTOCOL["select_eval_seed"]
        )
        for key in ("model_survival_median", "model_mae_median"):
            assert np.isfinite(result.final_score[key]), result.final_score

    def test_rows_record_the_weak_selector(self, selected):
        """Every row carries the end-of-training eval loss so each selection
        run documents the eval-loss-vs-protocol gap (the round-4 finding
        that motivated this tool)."""
        result, _, _ = selected
        for row in result.rows:
            assert "eval_total" in row
            assert "model_survival_median" in row
            assert row["baseline_diverged"] >= 0

    def test_selection_evals_share_one_fine_solve(self, selected):
        """Both seeds' selection evals hit ONE cached reference; the fresh
        final eval adds exactly one more (different key + member count)."""
        _, _, cache = selected
        refs = [f for f in os.listdir(cache) if f.startswith("ref_")]
        assert len(refs) == 2, refs

    def test_resume_skips_training(self, selected):
        """A re-invocation loads the per-seed score files instead of
        retraining and returns the identical selection."""
        result, out, cache = selected
        again = selection.select_checkpoint(
            TINY, 2, out, reference_cache_dir=cache, **PROTOCOL
        )
        assert again.winner_seed == result.winner_seed
        assert again.rows == result.rows

    def test_same_eval_seed_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="winner's curse"):
            selection.select_checkpoint(
                TINY, 2, str(tmp_path), eval_time_max=0.2,
                select_eval_seed=7, final_eval_seed=7,
            )

    def test_single_seed_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="vacuous"):
            selection.select_checkpoint(
                TINY, 1, str(tmp_path), eval_time_max=0.2
            )


class TestRankKey:
    def test_survival_dominates_then_mae_then_divergence(self):
        rows = [
            {"seed": 0, "model_survival_median": 5.0,
             "model_mae_median": 0.1, "model_diverged": 0},
            {"seed": 1, "model_survival_median": 9.0,
             "model_mae_median": 0.9, "model_diverged": 2},
            {"seed": 2, "model_survival_median": 9.0,
             "model_mae_median": 0.2, "model_diverged": 0},
            {"seed": 3, "model_survival_median": 9.0,
             "model_mae_median": None, "model_diverged": 0},
        ]
        ranked = sorted(rows, key=selection._rank_key)
        assert [r["seed"] for r in ranked] == [2, 1, 3, 0]
