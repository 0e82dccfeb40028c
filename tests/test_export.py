"""Serving-export tests: frozen StableHLO artifacts reproduce the live model.

≈ the reference's SavedModel restore coverage (integrate.py
§SavedModelDifferentiator, unverified — SURVEY.md), TPU-flavored: the
artifact is multi-platform (cpu+tpu) StableHLO with a symbolic batch dim,
and the loader needs no model code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, export, integrate
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel


def _make_model(name, conservative=True, nx=128):
    eq = equations.from_name(name, conservative=conservative)
    grid = Grid(nx, eq.period)
    model = StencilModel(
        eq, grid, ModelConfig(num_layers=2, filters=8, stencil_size=6)
    )
    params = model.init_params(jax.random.PRNGKey(0))
    # non-zero params so the test exercises the learned path, not c0
    params = jax.tree.map(
        lambda l: jax.random.normal(jax.random.PRNGKey(2), l.shape) * 0.05,
        params,
    )
    return model, params


@pytest.fixture(scope="module")
def ks_artifact(tmp_path_factory):
    model, params = _make_model("ks")
    path = str(tmp_path_factory.mktemp("export") / "ks")
    meta = export.export_and_save(model, params, path, num_steps=4)
    return model, params, path, meta


class TestRoundTrip:
    def test_rhs_matches_live_model(self, ks_artifact):
        model, params, path, _ = ks_artifact
        served = export.load_served_model(path)
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (5,)
        )
        live = model.rhs_fn(params, use_pallas=False)(u, 0.3)
        frozen = served.rhs_fn()(u, 0.3)
        np.testing.assert_allclose(
            np.asarray(live), np.asarray(frozen), atol=2e-4
        )

    def test_symbolic_batch_serves_any_ensemble_size(self, ks_artifact):
        model, params, path, _ = ks_artifact
        served = export.load_served_model(path)
        rhs = served.rhs_fn()
        for batch in [(1,), (3,), (2, 5)]:
            u = model.equation.initial_conditions(
                jax.random.PRNGKey(1), model.grid, batch
            )
            assert rhs(u, 0.0).shape == u.shape
        # 1-D input round-trips through the symbolic batch dim
        u1 = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid
        )
        assert rhs(u1, 0.0).shape == u1.shape

    def test_step_artifact_matches_integrate(self, ks_artifact):
        model, params, path, meta = ks_artifact
        served = export.load_served_model(path)
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (4,)
        )
        _, traj = integrate.integrate(
            model.rhs_fn(params, use_pallas=False),
            u,
            meta["dt"],
            meta["num_steps"],
            save_every=meta["num_steps"],
            t0=0.3,
        )
        got, t_next = served.advance(u, 0.3)
        np.testing.assert_allclose(
            np.asarray(traj[-1]), np.asarray(got), atol=2e-4
        )
        assert t_next == pytest.approx(0.3 + meta["dt"] * meta["num_steps"])

    def test_plugs_into_integrate(self, ks_artifact):
        """A served model is a drop-in RHS for the library integrator."""
        model, params, path, meta = ks_artifact
        served = export.load_served_model(path)
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (2,)
        )
        _, traj = integrate.integrate(served.rhs_fn(), u, meta["dt"], 8)
        assert bool(jnp.isfinite(traj).all())
        assert served.rhs_fn().conservative == model.equation.conservative


class TestForced:
    def test_forcing_is_a_call_argument(self, tmp_path):
        model, params = _make_model("burgers")
        path = str(tmp_path / "b")
        export.export_and_save(model, params, path, num_steps=2)
        served = export.load_served_model(path)
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (3,)
        )
        for seed in [3, 4]:  # one artifact serves arbitrary forcing draws
            f = model.equation.sample_forcing(jax.random.PRNGKey(seed), (3,))
            live = model.rhs_fn(params, f, use_pallas=False)(u, 0.7)
            frozen = served.rhs_fn(f)(u, 0.7)
            np.testing.assert_allclose(
                np.asarray(live), np.asarray(frozen), atol=2e-4
            )

    def test_unbatched_forcing_broadcasts(self, tmp_path):
        model, params = _make_model("burgers")
        path = str(tmp_path / "b")
        export.export_and_save(model, params, path)
        served = export.load_served_model(path)
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (3,)
        )
        f = model.equation.sample_forcing(jax.random.PRNGKey(3))  # [terms]
        live = model.rhs_fn(params, f, use_pallas=False)(u, 0.0)
        frozen = served.rhs_fn(f)(u, 0.0)
        np.testing.assert_allclose(
            np.asarray(live), np.asarray(frozen), atol=2e-4
        )

    def test_forcing_required_and_rejected(self, tmp_path):
        model, params = _make_model("burgers")
        path = str(tmp_path / "b")
        export.export_and_save(model, params, path)
        served = export.load_served_model(path)
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (3,)
        )
        with pytest.raises(ValueError, match="requires forcing"):
            served.rhs_fn()(u, 0.0)

        ks_model, ks_params = _make_model("ks")
        ks_path = str(tmp_path / "ks")
        export.export_and_save(ks_model, ks_params, ks_path)
        ks_served = export.load_served_model(ks_path)
        f = model.equation.sample_forcing(jax.random.PRNGKey(3), (3,))
        uk = ks_model.equation.initial_conditions(
            jax.random.PRNGKey(1), ks_model.grid, (3,)
        )
        with pytest.raises(ValueError, match="does not take forcing"):
            ks_served.rhs_fn(f)(uk, 0.0)


class TestParallel:
    """Frozen artifacts are DP-servable: the symbolic batch dim means both
    shard_map (explicit per-device call) and plain GSPMD (sharded jit of the
    exported call) partition over the data axis with no special casing —
    the serving analogue of training-side trajectory DP (SURVEY §2.2)."""

    def test_shard_map_and_gspmd_match_unsharded(self, ks_artifact):
        from jax import shard_map
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        model, _, path, _ = ks_artifact
        served = export.load_served_model(path)
        rhs = served.rhs_fn()
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (16,)
        )
        ref = np.asarray(rhs(u, 0.5))
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

        sharded = shard_map(
            lambda x: rhs(x, 0.5), mesh=mesh,
            in_specs=P("data"), out_specs=P("data"),
        )
        np.testing.assert_array_equal(np.asarray(jax.jit(sharded)(u)), ref)

        u_sh = jax.device_put(u, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda x: rhs(x, 0.5))(u_sh)
        assert len(out.sharding.device_set) == len(jax.devices())
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_advance_under_shard_map(self, ks_artifact):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        model, _, path, _ = ks_artifact
        served = export.load_served_model(path)
        u = model.equation.initial_conditions(
            jax.random.PRNGKey(1), model.grid, (16,)
        )
        ref = np.asarray(served.advance(u, 0.0)[0])
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
        sharded = shard_map(
            lambda x: served.advance(x, 0.0)[0], mesh=mesh,
            in_specs=P("data"), out_specs=P("data"),
        )
        np.testing.assert_array_equal(np.asarray(jax.jit(sharded)(u)), ref)


class TestScienceContext:
    def test_reconstructs_conservative_grid_origin(self, ks_artifact):
        model, _, path, _ = ks_artifact
        served = export.load_served_model(path)
        # ks_artifact was built on a bare Grid; patch metadata to a real
        # trained-config shape to exercise the resample reconstruction
        meta = dict(served.meta, fine_size=512, resample_factor=4, nx=128)
        equation, fine, coarse = export.science_context(meta)
        assert coarse.size == 128
        expected = fine.resample(4, conservative=True)
        assert coarse.origin == expected.origin != 0.0
        assert equation.conservative

    def test_inconsistent_metadata_raises(self, ks_artifact):
        _, _, path, _ = ks_artifact
        served = export.load_served_model(path)
        meta = dict(served.meta, fine_size=512, resample_factor=8, nx=128)
        with pytest.raises(ValueError, match="inconsistent"):
            export.science_context(meta)

    def test_missing_science_keys_raise_clearly(self, ks_artifact):
        """An artifact exported without fine_size/resample_factor (the bare
        export_and_save API) integrates fine but gives a clear error — not a
        KeyError — when the evaluation CLIs try to rebuild exact-solve
        geometry from it."""
        _, _, path, _ = ks_artifact
        served = export.load_served_model(path)
        assert served.meta["fine_size"] is None
        with pytest.raises(ValueError, match="fine_size/resample_factor"):
            export.science_context(served.meta)

    def test_export_owns_equation_params(self, tmp_path):
        """A library caller exporting a non-default-physics model (eq.eta
        override) must get an artifact whose science_context rebuilds the
        SAME physics — without the CLI's extra_meta patching (round-3
        VERDICT missing #2)."""
        eq = equations.from_name(
            "burgers", conservative=True, eta=0.02, forcing_k_max=9
        )
        grid = Grid(64, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8, stencil_size=6)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        meta = export.export_and_save(
            model, params, str(tmp_path / "eta"), num_steps=0,
            fine_size=256, resample_factor=4,
        )
        assert meta["equation_params"]["eta"] == 0.02
        rebuilt, _, _ = export.science_context(meta)
        assert rebuilt.eta == 0.02
        assert rebuilt.forcing_k_max == 9
        assert rebuilt.conservative
        # the round-trip survives JSON serialization on disk too
        served = export.load_served_model(str(tmp_path / "eta"))
        rebuilt2, _, _ = export.science_context(served.meta)
        assert rebuilt2 == eq

    def test_export_model_science_kwargs_land_in_meta(self, tmp_path):
        model, params = _make_model("ks")
        meta = export.export_and_save(
            model, params, str(tmp_path / "sci"), num_steps=0,
            fine_size=model.grid.size * 4, resample_factor=4,
        )
        assert meta["fine_size"] == model.grid.size * 4
        assert meta["resample_factor"] == 4
        assert meta["stencil_size"] == model.config.stencil_size
        equation, fine, coarse = export.science_context(meta)
        assert coarse.size == model.grid.size

    def test_export_records_model_stable_dt(self, tmp_path):
        """The frozen artifact must carry the MODEL-aware stable step: for
        wide stencils the equation-level bound is unstable outright
        (DECISIONS.md #16), and the live model — the only thing that can
        compute the exact bound — is gone at serve time."""
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(256, eq.period).resample(2, conservative=True)  # dx=.5
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=1, filters=4, stencil_size=12)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        meta = export.export_and_save(
            model, params, str(tmp_path / "wide"), num_steps=0,
            fine_size=256, resample_factor=2,
        )
        assert meta["stable_dt"] == model.stable_time_step(u_scale=3.0)
        # and the bound is genuinely tighter than the (unstable) eq bound
        assert meta["stable_dt"] < eq.stable_time_step(grid, u_scale=3.0)


class TestValidation:
    def test_wrong_grid_size_raises(self, ks_artifact):
        _, _, path, _ = ks_artifact
        served = export.load_served_model(path)
        with pytest.raises(ValueError, match="grid points"):
            served.rhs_fn()(jnp.zeros((2, 64)), 0.0)

    def test_missing_step_artifact_raises(self, tmp_path):
        model, params = _make_model("ks")
        path = str(tmp_path / "nostep")
        export.export_and_save(model, params, path, num_steps=0)
        served = export.load_served_model(path)
        u = jnp.zeros((2, model.grid.size))
        with pytest.raises(ValueError, match="without a step function"):
            served.advance(u, 0.0)

    def test_newer_format_version_refused(self, tmp_path, ks_artifact):
        import json
        import os
        import shutil

        _, _, path, _ = ks_artifact
        clone = str(tmp_path / "future")
        shutil.copytree(path, clone)
        meta_path = os.path.join(clone, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["format_version"] = export.FORMAT_VERSION + 1
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        with pytest.raises(ValueError, match="newer"):
            export.load_served_model(clone)

    def test_artifact_declares_tpu_lowering(self, ks_artifact):
        """The default export carries a tpu lowering even when built on CPU
        (cross-platform serialization is the point of jax.export here)."""
        _, _, path, meta = ks_artifact
        assert "tpu" in meta["platforms"]
        served = export.load_served_model(path)
        assert "tpu" in served.meta["platforms"]
