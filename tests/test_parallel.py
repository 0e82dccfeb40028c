"""Multi-device tests on the virtual 8-CPU mesh: halo exchange, sharded RHS
equivalence, sharded integration, data-parallel training."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pde_superresolution_tpu import equations, integrate, parallel
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    def test_default_all_data(self):
        mesh = parallel.make_mesh()
        assert mesh.shape == {"data": 8, "space": 1}

    def test_2d(self):
        mesh = parallel.make_mesh(space=4)
        assert mesh.shape == {"data": 2, "space": 4}

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            parallel.make_mesh(data=3, space=3)


class TestHalo:
    def test_exchange_equals_periodic_pad(self):
        mesh = parallel.make_mesh(data=1, space=4)
        u = jnp.arange(32.0)

        def local(u_shard):
            return parallel.halo_exchange(u_shard, 2, "space", 4)

        padded = jax.shard_map(
            local, mesh=mesh, in_specs=P("space"), out_specs=P("space")
        )(u)
        # shard 0's pad: [30, 31, 0..7, 8, 9]
        got = np.asarray(padded)[:12]
        np.testing.assert_array_equal(
            got, [30, 31, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
        )

    def test_apply_stencil_local_matches_global(self):
        from pde_superresolution_tpu import stencils

        rng = np.random.RandomState(0)
        u = rng.randn(24).astype(np.float32)
        c = np.asarray([1.0, -2.0, 1.0], np.float32)
        want = np.asarray(stencils.apply_stencil(jnp.asarray(u), jnp.asarray(c), [-1, 0, 1]))
        u_pad = np.concatenate([u[-2:], u, u[:2]])
        got = np.asarray(
            parallel.apply_stencil_local(
                jnp.asarray(u_pad), jnp.asarray(c), [-1, 0, 1], halo=2
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_halo_too_small_raises(self):
        with pytest.raises(ValueError):
            parallel.apply_stencil_local(
                jnp.zeros(10), jnp.zeros(5), [-2, -1, 0, 1, 2], halo=1
            )


class TestInitializeMultihost:
    """The wrapper can't run for real on a single host; verify its contract
    (arg passthrough, already-initialized tolerance, error propagation)
    against a stub so the code path has executed at least once."""

    def test_passes_kwargs_through(self, monkeypatch):
        seen = {}
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: seen.update(kw)
        )
        parallel.initialize_multihost(
            coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2
        )
        assert seen == {
            "coordinator_address": "10.0.0.1:1234",
            "num_processes": 4,
            "process_id": 2,
        }

    def test_tolerates_already_initialized(self, monkeypatch):
        def boom(**kw):
            raise RuntimeError("jax.distributed is already initialized")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        parallel.initialize_multihost()  # must not raise

    def test_propagates_real_errors(self, monkeypatch):
        def boom(**kw):
            raise RuntimeError("coordinator unreachable")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="unreachable"):
            parallel.initialize_multihost()


class TestShardedRHSEquivalence:
    @pytest.mark.parametrize("name,cons", [
        ("burgers", False), ("burgers", True), ("ks", False), ("ks", True),
    ])
    def test_baseline_rhs_matches_unsharded(self, name, cons):
        eq = equations.from_name(name, conservative=cons)
        grid = Grid(64, eq.period)
        mesh = parallel.make_mesh(data=2, space=4)
        key = jax.random.PRNGKey(0)
        u = eq.initial_conditions(key, grid, (4,))
        forcing = eq.sample_forcing(jax.random.PRNGKey(1), (4,))
        want = integrate.PolynomialDifferentiator(eq, grid).rhs_fn(forcing)(u, 0.3)
        rhs = parallel.sharded_baseline_rhs(eq, grid, mesh, forcing=forcing)
        got = rhs(u, 0.3)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    @pytest.mark.parametrize("cons", [False, True])
    def test_model_rhs_matches_unsharded(self, cons):
        eq = equations.from_name("ks", conservative=cons)
        grid = Grid(64, eq.period)
        mesh = parallel.make_mesh(data=2, space=4)
        # KS needs a 4th derivative: 7 taps for accuracy 2 + constraints
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8, stencil_size=7)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        # non-trivial params so the conv path is genuinely exercised
        params = jax.tree.map(
            lambda leaf: 0.1 * jax.random.normal(jax.random.PRNGKey(1), leaf.shape),
            params,
        )
        u = eq.initial_conditions(jax.random.PRNGKey(2), grid, (4,))
        want = model.rhs_fn(params)(u, 0.0)
        got = parallel.sharded_model_rhs(model, params, mesh)(u, 0.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )

    def test_sharded_integration_matches(self):
        """Full scan of sharded RHS steps == unsharded trajectory."""
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(64, eq.period)
        mesh = parallel.make_mesh(data=1, space=8)
        u0 = eq.initial_conditions(jax.random.PRNGKey(3), grid) * 0.5
        dt = eq.stable_time_step(grid)
        rhs_ref = integrate.PolynomialDifferentiator(eq, grid).rhs_fn()
        _, want = integrate.integrate(rhs_ref, u0, dt, 50)
        rhs_sh = parallel.sharded_baseline_rhs(eq, grid, mesh)
        sharding = NamedSharding(mesh, P("space"))
        u0_sh = jax.device_put(u0, sharding)
        _, got = integrate.integrate(rhs_sh, u0_sh, dt, 50)
        np.testing.assert_allclose(
            np.asarray(got[-1]), np.asarray(want[-1]), rtol=1e-3, atol=1e-4
        )


class TestDataParallelTraining:
    def test_dp_train_step_matches_single_device(self):
        """One sharded-jit train step over the 8-device data mesh produces
        the same params as the unsharded step (GSPMD psum == single-device
        reduction up to float tolerance)."""
        from pde_superresolution_tpu.training import TrainingConfig, loop as loop_lib

        # n = 2*32 = 64 samples, frac 0.75 -> eval 16 (divisible by 8, so the
        # DP and single-device runs see byte-identical eval sets)
        cfg = TrainingConfig(
            equation="burgers", conservative=True, resample_factor=4,
            fine_size=128, num_trajectories=2, num_times=32, time_delta=0.1,
            model=ModelConfig(num_layers=1, filters=4, stencil_size=4),
            num_time_steps=0, learning_rates=(1e-3,), learning_stops=(3,),
            batch_size=16, eval_interval=3, frac_training=0.75,
        )
        mesh = parallel.make_mesh()  # all 8 on "data"
        _, params_dp, m_dp = loop_lib.train(cfg, mesh=mesh)
        _, params_single, m_single = loop_lib.train(cfg)
        for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_single)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
        assert abs(m_dp["eval_total"] - m_single["eval_total"]) < 1e-3

    def test_host_staged_trajectory_data_under_mesh(self):
        """The host-staged dataset (numpy leaves) composes with DP: each
        batch is gathered on host and device_put with the mesh sharding —
        params match the device-resident DP run."""
        import dataclasses as dc

        from pde_superresolution_tpu.training import (
            TrainingConfig,
            build_trajectory_data,
            loop as loop_lib,
        )
        from pde_superresolution_tpu import equations as eq_lib
        from pde_superresolution_tpu.grids import Grid

        cfg = TrainingConfig(
            equation="burgers", conservative=True, resample_factor=4,
            fine_size=128, num_trajectories=8, num_times=12, time_delta=0.1,
            model=ModelConfig(num_layers=1, filters=4, stencil_size=4),
            num_time_steps=2, learning_rates=(1e-3,), learning_stops=(3,),
            batch_size=16, eval_interval=3, frac_training=0.75,
        )
        eq = eq_lib.from_name(cfg.equation, conservative=True)
        fine = Grid(cfg.fine_size, eq.period)
        build = lambda host: build_trajectory_data(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=8,
            num_times=12, time_delta=0.1, resample_factor=4,
            unroll_steps=2, chunk_trajectories=4, host_resident=host,
        )
        mesh = parallel.make_mesh()
        _, p_host, m_host = loop_lib.train(cfg, dataset=build(True), mesh=mesh)
        _, p_dev, m_dev = loop_lib.train(cfg, dataset=build(False), mesh=mesh)
        for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_dev)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
        assert abs(m_host["eval_total"] - m_dev["eval_total"]) < 1e-4


class TestGSPMDAutoSharding:
    def test_space_sharded_rhs_via_auto_partitioning(self):
        """The plain (roll-based) model RHS under jit with inputs sharded
        over ("data","space") must equal the unsharded result — GSPMD
        auto-inserts collective permutes for the periodic rolls; no
        shard_map needed on the inference path."""
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(64, eq.period)
        mesh = parallel.make_mesh(data=2, space=4)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8, stencil_size=6)
        )
        params = jax.tree.map(
            lambda leaf: 0.1 * jax.random.normal(jax.random.PRNGKey(1), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        u = eq.initial_conditions(jax.random.PRNGKey(2), grid, (4,))
        rhs = jax.jit(model.rhs_fn(params, use_pallas=False))
        want = np.asarray(rhs(u, 0.0))
        u_sh = jax.device_put(u, NamedSharding(mesh, P("data", "space")))
        got = np.asarray(rhs(u_sh, 0.0))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_space_sharded_training_loss_and_grads(self):
        """The full training loss (incl. unrolled rollout) with inputs
        sharded over ("data","space") reproduces the unsharded loss and
        gradients — spatially-sharded TRAINING via GSPMD auto-partitioning."""
        from pde_superresolution_tpu.training import LossWeights
        from pde_superresolution_tpu.training import data as data_lib
        from pde_superresolution_tpu.training import losses as loss_lib

        eq = equations.from_name("ks", conservative=True)
        grid = Grid(32, eq.period)
        # space=4 is load-bearing here: on a 2-device space ring the left
        # and right neighbors coincide, so a mirrored/swapped halo exchange
        # in the TRAINING path (gradient flow included) would go unnoticed.
        # This is the one training-path test that keeps the 4-way ring; the
        # full-train equivalence below runs at space=2 for wall time.
        mesh = parallel.make_mesh(data=2, space=4)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=1, filters=4, stencil_size=6)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        batch, nx = 4, grid.size
        u = eq.initial_conditions(key, grid, (batch,))
        dataset = data_lib.TrainingData(
            inputs=u,
            t=jnp.zeros((batch,)),
            forcing=None,
            deriv_labels={
                d: jax.random.normal(jax.random.fold_in(key, d), (batch, nx))
                for d in eq.derivative_orders
            },
            time_deriv_label=jax.random.normal(jax.random.fold_in(key, 9), (batch, nx)),
            rollout=jnp.tile(u[:, None], (1, 2, 1)),
        )
        # substeps=1 keeps the rollout at 2 inner RK4 steps: enough to pass
        # gradients through two halo exchanges while halving the dominant
        # compile (this is the suite's slowest single test)
        norms = loss_lib.compute_loss_norms(model, dataset, 2, 0.1, substeps=1)

        @jax.jit
        def loss_and_grads(p, batch_data):
            def f(p):
                loss, _ = loss_lib.compute_loss(
                    model, p, batch_data, norms, LossWeights(),
                    dt=0.1, unroll_steps=2, substeps=1,
                )
                return loss
            return jax.value_and_grad(f)(p)

        want_loss, want_grads = loss_and_grads(params, dataset)
        sharding = NamedSharding(mesh, P("data", "space"))
        dataset_sh = data_lib.TrainingData(
            inputs=jax.device_put(dataset.inputs, sharding),
            t=jax.device_put(dataset.t, NamedSharding(mesh, P("data"))),
            forcing=None,
            deriv_labels={
                d: jax.device_put(v, sharding) for d, v in dataset.deriv_labels.items()
            },
            time_deriv_label=jax.device_put(dataset.time_deriv_label, sharding),
            rollout=jax.device_put(dataset.rollout, NamedSharding(mesh, P("data", None, "space"))),
        )
        got_loss, got_grads = loss_and_grads(params, dataset_sh)
        np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(got_grads), jax.tree.leaves(want_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestFusedKernelDP:
    """The fused learned-RK4 Mosaic kernel composed with data parallelism
    via shard_map (interpret mode on the virtual mesh): each shard invokes
    the kernel on its local trajectory batch, zero cross-shard comm. This is
    the path `run_ensemble --fused --data_parallel` takes on a real pod."""

    def _setup(self, name, cons, batch):
        eq = equations.from_name(name, conservative=cons)
        grid = Grid(8 * 128, eq.period).resample(8, conservative=cons)
        model = StencilModel(eq, grid, ModelConfig(stencil_size=6))
        params = jax.tree.map(
            lambda leaf: leaf
            + 0.05 * jax.random.normal(jax.random.PRNGKey(1), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        dt = eq.stable_time_step(grid, u_scale=3.0)
        u0 = eq.initial_conditions(jax.random.PRNGKey(2), grid, (batch,))
        return eq, model, params, dt, u0

    def test_matches_unsharded_kernel(self):
        eq, model, params, dt, u0 = self._setup("ks", True, 32)
        mesh = parallel.make_mesh(data=4)
        want = np.asarray(
            model.fused_rk4_fn(params, dt, 2, batch_tile=8, interpret=True)(u0)
        )
        adv = model.fused_rk4_fn(
            params, dt, 2, batch_tile=8, interpret=True, mesh=mesh
        )
        u0_sh = jax.device_put(u0, NamedSharding(mesh, P("data")))
        got = np.asarray(jax.jit(adv)(u0_sh))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_forced_matches_unsharded(self):
        """Burgers: the batch-sharded forcing params reach each shard's
        kernel (phase tiles built per shard) and t stays replicated."""
        eq, model, params, dt, u0 = self._setup("burgers", True, 32)
        forcing = eq.sample_forcing(jax.random.PRNGKey(3), (32,))
        mesh = parallel.make_mesh(data=4)
        want = np.asarray(
            model.fused_rk4_fn(
                params, dt, 2, batch_tile=8, interpret=True,
                forcing=forcing, t0=0.37,
            )(u0)
        )
        adv = model.fused_rk4_fn(
            params, dt, 2, batch_tile=8, interpret=True,
            forcing=forcing, t0=0.0, mesh=mesh,
        )
        u0_sh = jax.device_put(u0, NamedSharding(mesh, P("data")))
        got = np.asarray(jax.jit(lambda u: adv(u, 0.37))(u0_sh))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_integrate_fused_under_mesh(self):
        """integrate_fused's scan over shard_map'd kernel advances (the
        exact run_ensemble composition) == the unsharded XLA-scan result."""
        eq, model, params, dt, u0 = self._setup("ks", True, 32)
        mesh = parallel.make_mesh(data=4)
        rhs = model.rhs_fn(params, use_pallas=False)
        want_times, want = integrate.integrate(rhs, u0, dt, 4, 2)
        adv = model.fused_rk4_fn(
            params, dt, 2, batch_tile=8, interpret=True, mesh=mesh
        )
        u0_sh = jax.device_put(u0, NamedSharding(mesh, P("data")))
        got_times, got = jax.jit(
            lambda u: integrate.integrate_fused(adv, u, dt, 4, 2)
        )(u0_sh)
        np.testing.assert_allclose(
            np.asarray(got_times), np.asarray(want_times), rtol=1e-6
        )
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 2e-3 * np.abs(np.asarray(want)).max(), err

    def test_space_axis_rejected(self):
        eq, model, params, dt, u0 = self._setup("ks", True, 32)
        mesh = parallel.make_mesh(data=4, space=2)
        with pytest.raises(ValueError, match="size 1"):
            model.fused_rk4_fn(
                params, dt, 2, batch_tile=8, interpret=True, mesh=mesh
            )

    def test_missing_data_axis_rejected(self):
        eq, model, params, dt, u0 = self._setup("ks", True, 32)
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:4]), ("model",))
        with pytest.raises(ValueError, match="data"):
            model.fused_rk4_fn(
                params, dt, 2, batch_tile=8, interpret=True, mesh=mesh
            )


class TestDPxSPTraining:
    def test_2d_mesh_training_matches_single_device(self):
        """Full train() over a (data=2, space=2) mesh == single-device."""
        from pde_superresolution_tpu.training import TrainingConfig, loop as loop_lib

        cfg = TrainingConfig(
            equation="ks", conservative=True, resample_factor=2,
            fine_size=64, num_trajectories=2, num_times=17, time_delta=0.1,
            model=ModelConfig(num_layers=1, filters=4, stencil_size=6),
            num_time_steps=1, learning_rates=(1e-3,), learning_stops=(3,),
            batch_size=8, eval_interval=3, frac_training=0.75, ic_scale=0.3,
        )
        mesh = parallel.make_mesh(data=2, space=2)
        _, params_2d, m_2d = loop_lib.train(cfg, mesh=mesh)
        _, params_single, m_single = loop_lib.train(cfg)
        for a, b in zip(jax.tree.leaves(params_2d), jax.tree.leaves(params_single)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
        assert abs(m_2d["eval_total"] - m_single["eval_total"]) < 1e-3


_MP_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from pde_superresolution_tpu import parallel
from pde_superresolution_tpu.models import ModelConfig
from pde_superresolution_tpu.training import TrainingConfig, loop as loop_lib
parallel.initialize_multihost(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
cfg = TrainingConfig(
    equation="burgers", conservative=True, resample_factor=4,
    fine_size=128, num_trajectories=2, num_times=32, time_delta=0.1,
    model=ModelConfig(num_layers=1, filters=4, stencil_size=4),
    num_time_steps=0, learning_rates=(1e-3,), learning_stops=(3,),
    batch_size=16, eval_interval=3, frac_training=0.75,
)
mesh = parallel.make_mesh()  # all 8 global devices on "data"
assert mesh.devices.size == 8
_, params, metrics = loop_lib.train(cfg, mesh=mesh)
import numpy as np
leaves = [np.asarray(x) for x in jax.tree.leaves(params)]
np.savez(out, eval_total=float(metrics["eval_total"]),
         **{str(i): l for i, l in enumerate(leaves)})
print("WORKER_OK", pid)
"""


class TestRealMultiProcess:
    """REAL multi-process distributed training: two OS processes, each with
    4 local CPU devices, joined by ``initialize_multihost`` into one
    8-device global mesh. The full ``train()`` loop runs unchanged — GSPMD
    inserts *cross-process* gradient psums (Gloo transport stands in for
    ICI/DCN) — and both processes must agree bitwise with each other and
    match the single-process run to float tolerance. This is the strongest
    comm-backend evidence available without real multi-host TPU hardware
    (SURVEY.md §5 distributed-communication row)."""

    def test_two_process_dp_training_matches_single_process(self, tmp_path):
        import os
        import socket
        import subprocess
        import sys

        from pde_superresolution_tpu.training import TrainingConfig, loop as loop_lib

        with socket.socket() as s:  # free port for the coordinator
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env.pop("PDE_TPU_TESTS", None)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        outs = [str(tmp_path / f"params{i}.npz") for i in (0, 1)]
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _MP_WORKER, str(i), port, outs[i]],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=repo,
            )
            for i in (0, 1)
        ]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=420)
            logs.append(out)
        assert all(p.returncode == 0 for p in procs), [l[-2000:] for l in logs]

        got = [np.load(o) for o in outs]
        # both processes hold the same replicated result, bitwise
        for key in got[0].files:
            np.testing.assert_array_equal(got[0][key], got[1][key])

        cfg = TrainingConfig(
            equation="burgers", conservative=True, resample_factor=4,
            fine_size=128, num_trajectories=2, num_times=32, time_delta=0.1,
            model=ModelConfig(num_layers=1, filters=4, stencil_size=4),
            num_time_steps=0, learning_rates=(1e-3,), learning_stops=(3,),
            batch_size=16, eval_interval=3, frac_training=0.75,
        )
        _, params_single, m_single = loop_lib.train(cfg)
        single = [np.asarray(x) for x in jax.tree.leaves(params_single)]
        multi = [got[0][str(i)] for i in range(len(single))]
        for a, b in zip(multi, single):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        assert abs(float(got[0]["eval_total"]) - m_single["eval_total"]) < 1e-3


class TestCurriculumUnderMesh:
    def test_curriculum_training_matches_single_device(self):
        """Phase-wise unroll growth composes with the DP mesh: same params
        as the unsharded curriculum run (per-phase re-jit under GSPMD)."""
        import dataclasses as dc

        from pde_superresolution_tpu.training import TrainingConfig, loop as loop_lib

        cfg = TrainingConfig(
            equation="burgers", conservative=True, resample_factor=4,
            fine_size=128, num_trajectories=2, time_delta=0.1,
            model=ModelConfig(num_layers=1, filters=4, stencil_size=4),
            num_time_steps=2, learning_rates=(1e-3,), learning_stops=(4,),
            unroll_curriculum=(1, 2), curriculum_stops=(2, 4),
            # 2*32 usable samples, frac 0.75 -> eval 16 (divisible by 8: the
            # DP path trims the eval split to a shardable multiple, so both
            # runs must see the same eval set for the metric to compare)
            num_times=34, batch_size=16, eval_interval=2, frac_training=0.75,
        )
        mesh = parallel.make_mesh()  # all 8 on "data"
        _, params_dp, m_dp = loop_lib.train(cfg, mesh=mesh)
        _, params_single, m_single = loop_lib.train(cfg)
        for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_single)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
        assert abs(m_dp["eval_total"] - m_single["eval_total"]) < 1e-3
