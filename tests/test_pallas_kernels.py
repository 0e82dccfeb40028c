"""Pallas kernel vs pure-XLA reference equivalence (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, integrate, stencils
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel
from pde_superresolution_tpu.ops import pallas_kernels as pk


BATCH, NX = 16, 128


class TestFusedRHS:
    @pytest.mark.parametrize("name,cons", [
        ("ks", True), ("ks", False), ("kdv", True), ("burgers", True),
    ])
    def test_matches_model_rhs(self, name, cons):
        eq = equations.from_name(name, conservative=cons)
        grid = Grid(NX, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8,
                                  stencil_size=6 if cons else 7)
        )
        params = jax.tree.map(
            lambda leaf: 0.05 * jax.random.normal(jax.random.PRNGKey(0), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (BATCH,))
        coeffs = model.coefficients(params, u)
        want = np.asarray(
            eq.time_derivative(u, model.derivatives(params, u), grid)
        )

        offsets_map = {
            d: layer.offsets for d, layer in model.constraint_layers.items()
        }
        rhs = pk.make_fused_rhs(
            eq, grid, offsets_map, model._shift, forced=False, interpret=True
        )
        got = np.asarray(rhs(u, coeffs))
        # float32 with different accumulation order than the XLA twin:
        # bit-exactness is not expected, agreement to ~1e-4 is
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_forcing_field_added(self):
        eq = equations.from_name("burgers", conservative=True)
        grid = Grid(NX, eq.period)
        model = StencilModel(eq, grid, ModelConfig(num_layers=1, filters=4, stencil_size=4))
        params = model.init_params(jax.random.PRNGKey(0))
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (BATCH,))
        coeffs = model.coefficients(params, u)
        f = jax.random.normal(jax.random.PRNGKey(2), u.shape)
        offsets_map = {d: l.offsets for d, l in model.constraint_layers.items()}
        rhs = pk.make_fused_rhs(eq, grid, offsets_map, model._shift,
                                forced=True, interpret=True)
        got = np.asarray(rhs(u, coeffs, f))
        want = np.asarray(
            eq.time_derivative(u, model.derivatives(params, u), grid)
        ) + np.asarray(f)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("name,cons", [("ks", True), ("kdv", False)])
    def test_grad_matches_xla_twin(self, name, cons):
        """The custom_vjp: gradients through the kernel == gradients through
        the pure-XLA model path (the backward IS the XLA twin's vjp, so
        agreement is to the forward paths' float tolerance)."""
        eq = equations.from_name(name, conservative=cons)
        grid = Grid(NX, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8,
                                  stencil_size=6 if cons else 7)
        )
        params = jax.tree.map(
            lambda leaf: 0.05 * jax.random.normal(jax.random.PRNGKey(0), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (BATCH,))
        coeffs = model.coefficients(params, u)
        g = jax.random.normal(jax.random.PRNGKey(2), u.shape)  # cotangent

        offsets_map = {
            d: layer.offsets for d, layer in model.constraint_layers.items()
        }
        rhs = pk.make_fused_rhs(
            eq, grid, offsets_map, model._shift, forced=False, interpret=True
        )

        def loss_kernel(u, coeffs):
            return jnp.sum(rhs(u, coeffs) * g)

        def loss_xla(u, coeffs):
            derivs = {
                d: stencils.apply_stencil(u, coeffs[d], offsets_map[d],
                                          model._shift)
                for d in coeffs
            }
            return jnp.sum(eq.time_derivative(u, derivs, grid) * g)

        du_k, dc_k = jax.grad(loss_kernel, argnums=(0, 1))(u, coeffs)
        du_x, dc_x = jax.grad(loss_xla, argnums=(0, 1))(u, coeffs)
        np.testing.assert_allclose(
            np.asarray(du_k), np.asarray(du_x), rtol=1e-4, atol=1e-5
        )
        for d in dc_k:
            np.testing.assert_allclose(
                np.asarray(dc_k[d]), np.asarray(dc_x[d]), rtol=1e-4, atol=1e-5
            )

    def test_grad_forced_includes_forcing_cotangent(self):
        eq = equations.from_name("burgers", conservative=True)
        grid = Grid(NX, eq.period)
        model = StencilModel(eq, grid, ModelConfig(num_layers=1, filters=4,
                                                   stencil_size=4))
        params = model.init_params(jax.random.PRNGKey(0))
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (BATCH,))
        coeffs = model.coefficients(params, u)
        f = jax.random.normal(jax.random.PRNGKey(2), u.shape)
        offsets_map = {d: l.offsets for d, l in model.constraint_layers.items()}
        rhs = pk.make_fused_rhs(eq, grid, offsets_map, model._shift,
                                forced=True, interpret=True)
        df = jax.grad(lambda ff: jnp.sum(rhs(u, coeffs, ff)))(f)
        # u_t = ... + f, so d(sum u_t)/df == 1 everywhere
        np.testing.assert_allclose(np.asarray(df), np.ones_like(np.asarray(df)),
                                   rtol=1e-6)

    def test_unsupported_shape_raises(self):
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(100, eq.period)
        rhs = pk.make_fused_rhs(eq, grid, {0: [-0.5, 0.5]}, -0.5, forced=False,
                                interpret=True)
        with pytest.raises(ValueError):
            rhs(jnp.zeros((16, 100)), {0: jnp.zeros((16, 100, 2))})

    def test_auto_tile_prefers_whole_batch(self):
        """Small shapes keep the whole-batch tile (grid=1 is the measured-
        fast layout: Pallas grid iterations serialize on-core)."""
        assert pk._auto_rhs_tile(128, 128, 24, True, 4) == 128
        assert pk._auto_rhs_tile(1024, 128, 24, True, 4) == 1024

    def test_auto_tile_splits_config5_ensemble_shape(self):
        """The exact shape that failed on chip (round 5): batch 10240,
        nx 128, 24 tap arrays, forced — the untiled block wants ~212 MiB
        of scoped VMEM (Mosaic reported 111 MiB and failed the AOT
        compile). The auto tile must be a SUBLANE-multiple divisor whose
        double-buffered estimate fits half the physical VMEM."""
        tb = pk._auto_rhs_tile(10240, 128, 24, True, 4)
        assert tb == 1280
        assert 10240 % tb == 0 and tb % pk.SUBLANE == 0
        est = pk._rhs_vmem_bytes(tb, 128, 24, True, buffers=2, itemsize=4)
        assert est <= pk.PHYSICAL_VMEM_BYTES // 2

    def test_auto_tile_impossible_returns_none(self):
        # one SUBLANE-row block already exceeds the budget at absurd width
        assert pk._auto_rhs_tile(16, 8_388_608, 24, True, 4) is None

    def test_over_physical_tile_refused_before_compiling(self, monkeypatch):
        """An explicit batch_tile whose estimate exceeds physical VMEM must
        raise BEFORE any Mosaic compile (an over-budget compile can wedge
        the chip — DECISIONS.md #15). Shrink the fake physical budget so a
        small test shape trips it."""
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(NX, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=1, filters=4, stencil_size=6)
        )
        offsets_map = {d: l.offsets for d, l in model.constraint_layers.items()}
        rhs = pk.make_fused_rhs(
            eq, grid, offsets_map, model._shift, forced=False,
            batch_tile=BATCH,  # explicit tile: no auto-shrink
        )
        u = jnp.zeros((BATCH, NX))
        coeffs = {
            d: jnp.zeros((BATCH, NX, len(offsets_map[d]))) for d in offsets_map
        }
        monkeypatch.setattr(pk, "PHYSICAL_VMEM_BYTES", 1024)
        with pytest.raises(ValueError, match="physical"):
            rhs(u, coeffs)

    def test_auto_tiled_matches_whole_batch(self, monkeypatch):
        """Force the auto-tiler into the tiled path (tiny fake VMEM) and
        check the tiled kernel is exact against the untiled one — the
        kernel is elementwise over batch rows, so tiling must be a no-op
        on the numbers."""
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(NX, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8, stencil_size=6)
        )
        params = jax.tree.map(
            lambda leaf: 0.05
            * jax.random.normal(jax.random.PRNGKey(0), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        batch = 32  # 32 single-buffered == 2x the 8-row double-buffered
        # estimate, so a budget of exactly est(8, double) forces tb=8
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (batch,))
        coeffs = model.coefficients(params, u)
        offsets_map = {
            d: layer.offsets for d, layer in model.constraint_layers.items()
        }
        rhs = pk.make_fused_rhs(
            eq, grid, offsets_map, model._shift, forced=False, interpret=True
        )
        whole = np.asarray(rhs(u, coeffs))
        n_taps = sum(len(o) for o in offsets_map.values())
        fake = 2 * pk._rhs_vmem_bytes(8, NX, n_taps, False, 2, 4)
        assert pk._rhs_vmem_bytes(batch, NX, n_taps, False, 1, 4) > fake // 2
        monkeypatch.setattr(pk, "PHYSICAL_VMEM_BYTES", fake)
        assert pk._auto_rhs_tile(batch, NX, n_taps, False, 4) == 8
        tiled = np.asarray(rhs(u, coeffs))
        np.testing.assert_array_equal(tiled, whole)


class TestFusedRK4:
    @pytest.mark.parametrize("name,cons", [("ks", True), ("kdv", False)])
    def test_matches_scan_integration(self, name, cons):
        eq = equations.from_name(name, conservative=cons)
        grid = Grid(NX, eq.period)
        u0 = 0.3 * eq.initial_conditions(jax.random.PRNGKey(0), grid, (BATCH,))
        dt = eq.stable_time_step(grid)
        steps = 10
        advance = pk.make_fused_rk4(eq, grid, dt, steps, interpret=True)
        got = np.asarray(advance(u0))
        rhs = integrate.PolynomialDifferentiator(eq, grid).rhs_fn()
        _, traj = integrate.integrate(rhs, u0, dt, steps)
        want = np.asarray(traj[-1])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_forced_equation_rejected(self):
        eq = equations.from_name("burgers")
        with pytest.raises(ValueError):
            pk.make_fused_rk4(eq, Grid(NX, eq.period), 0.01, 5, interpret=True)


def _learned_setup(name, cons, stencil_size, batch=BATCH):
    eq = equations.from_name(name, conservative=cons)
    grid = Grid(8 * NX, eq.period).resample(8, conservative=cons)
    model = StencilModel(
        eq, grid, ModelConfig(stencil_size=stencil_size)
    )
    params = jax.tree.map(
        lambda leaf: leaf + 0.05 * jax.random.normal(jax.random.PRNGKey(1), leaf.shape),
        model.init_params(jax.random.PRNGKey(0)),
    )
    dt = eq.stable_time_step(grid, u_scale=3.0)
    u0 = eq.initial_conditions(jax.random.PRNGKey(2), grid, (batch,))
    return eq, grid, model, params, dt, u0


def _xla_steps(model, params, u0, dt, steps):
    rhs = model.rhs_fn(params)
    u = u0
    for _ in range(steps):
        u = integrate.rk4_step(rhs, u, 0.0, dt)
    return np.asarray(u)


class TestFusedLearnedRK4:
    """The whole-RK4-step learned-model kernel (SURVEY §7 stage 6).

    The kernel rounds matmul inputs to bf16 exactly like the XLA twin's
    default-precision TPU convs; against a CPU float32 twin the agreement
    is therefore bf16-level (~1e-3 worst case), while on TPU both paths
    round identically and agree to ~1e-6 (see the tpu-marked test below,
    and RESULTS.md for the measured on-chip numbers).
    """

    @pytest.mark.parametrize("name,cons,size", [
        ("ks", True, 6), ("ks", False, 7), ("kdv", True, 6),
        ("ks", True, 8),  # the round-2 recipe / flagship-checkpoint width
    ])
    def test_matches_xla_rollout(self, name, cons, size):
        eq, grid, model, params, dt, u0 = _learned_setup(name, cons, size)
        want = _xla_steps(model, params, u0, dt, 3)
        adv = model.fused_rk4_fn(params, dt, 3, batch_tile=8, interpret=True)
        got = np.asarray(adv(u0))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 2e-3, err

    def test_forced_matches_xla_rollout(self):
        """Burgers with in-kernel rotated-phase forcing vs the XLA twin."""
        eq, grid, model, params, dt, u0 = _learned_setup("burgers", True, 6)
        forcing = eq.sample_forcing(jax.random.PRNGKey(3), (u0.shape[0],))
        t0 = 0.37
        rhs = model.rhs_fn(params, forcing, use_pallas=False)
        u, t = u0, t0
        for _ in range(3):
            u = integrate.rk4_step(rhs, u, jnp.asarray(t), dt)
            t += dt
        want = np.asarray(u)
        adv = model.fused_rk4_fn(params, dt, 3, batch_tile=8, interpret=True,
                                 forcing=forcing, t0=t0)
        got = np.asarray(adv(u0))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 2e-3, err

    def test_integrate_fused_matches_integrate(self):
        """integrate_fused (scan of whole-interval kernels, traced segment
        start times) == integrate (scan of single RK4 steps)."""
        eq, grid, model, params, dt, u0 = _learned_setup("burgers", True, 6)
        forcing = eq.sample_forcing(jax.random.PRNGKey(3), (u0.shape[0],))
        t0 = 0.2
        rhs = model.rhs_fn(params, forcing, use_pallas=False)
        want_times, want = integrate.integrate(rhs, u0, dt, 4, 2, t0=t0)
        adv = model.fused_rk4_fn(params, dt, 2, batch_tile=8, interpret=True,
                                 forcing=forcing)
        got_times, got = integrate.integrate_fused(adv, u0, dt, 4, 2, t0=t0)
        np.testing.assert_allclose(np.asarray(got_times),
                                   np.asarray(want_times), rtol=1e-6)
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 2e-3 * np.abs(np.asarray(want)).max(), err

    def test_forced_equation_requires_forcing(self):
        eq = equations.from_name("burgers", conservative=True)
        grid = Grid(NX, eq.period)
        model = StencilModel(eq, grid, ModelConfig(stencil_size=6))
        params = model.init_params(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="forc"):
            model.fused_rk4_fn(params, 0.01, 5, interpret=True)

    def test_unforced_equation_rejects_forcing(self):
        """The XLA twin applies any forcing it is handed; the kernel must
        raise rather than silently drop it for an unforced equation."""
        eq, grid, model, params, dt, u0 = _learned_setup("ks", True, 6)
        forcing = equations.from_name("burgers").sample_forcing(
            jax.random.PRNGKey(0), (u0.shape[0],)
        )
        adv = model.fused_rk4_fn(params, dt, 1, batch_tile=8, interpret=True,
                                 forcing=forcing)
        with pytest.raises(ValueError, match="unforced"):
            adv(u0)

    def test_bad_tile_raises(self):
        eq, grid, model, params, dt, u0 = _learned_setup("ks", True, 6)
        adv = model.fused_rk4_fn(params, dt, 1, batch_tile=7, interpret=True)
        with pytest.raises(ValueError, match="tileable"):
            adv(u0)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="on-TPU equivalence: run on real hardware via "
    "PDE_TPU_TESTS=1 python -m pytest tests/test_pallas_kernels.py -q "
    "(the verify skill's recipe)",
)
class TestOnTPU:
    """Hardware equivalence for every fused kernel — makes the 'matches the
    XLA path on chip' claim a reproducible check instead of RESULTS.md
    prose. CI forces a CPU backend (conftest), so these only run when the
    suite is invoked with the real TPU visible (verify skill)."""

    def test_fused_rhs_matches_xla(self):
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(8 * NX, eq.period).resample(8, conservative=True)
        model = StencilModel(eq, grid, ModelConfig(stencil_size=6))
        params = jax.tree.map(
            lambda leaf: leaf + 0.05 * jax.random.normal(jax.random.PRNGKey(1), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        u = eq.initial_conditions(jax.random.PRNGKey(2), grid, (BATCH,))
        want = np.asarray(jax.jit(model.rhs_fn(params, use_pallas=False))(u, 0.0))
        got = np.asarray(jax.jit(model.rhs_fn(params, use_pallas=True))(u, 0.0))
        # the KERNEL is bit-exact for identical coefficient inputs; the two
        # jit programs fuse the (outside-kernel) coefficient computation
        # differently, leaving ~1e-6 rounding drift on a few points
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_fused_fixed_rk4_bit_exact(self):
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(NX, eq.period)
        u0 = 0.3 * eq.initial_conditions(jax.random.PRNGKey(0), grid, (BATCH,))
        dt = eq.stable_time_step(grid)
        advance = jax.jit(pk.make_fused_rk4(eq, grid, dt, 10))
        got = np.asarray(advance(u0))
        rhs = integrate.PolynomialDifferentiator(eq, grid).rhs_fn()
        _, traj = integrate.integrate(rhs, u0, dt, 10)
        np.testing.assert_array_equal(got, np.asarray(traj[-1]))

    def test_fused_learned_rk4_matches_xla(self):
        eq, grid, model, params, dt, u0 = _learned_setup("ks", True, 6, batch=16)
        want = _xla_steps(model, params, u0, dt, 5)
        adv = jax.jit(model.fused_rk4_fn(params, dt, 5, batch_tile=8))
        got = np.asarray(adv(u0))
        err = np.abs(got - want).max() / np.abs(want).max()
        # both paths round matmul inputs to bf16 on TPU; small op-order
        # differences remain
        assert err < 1e-4, err

    def test_training_grad_with_tileable_grid(self):
        """With a 128-multiple coarse grid, the unrolled loss under
        jax.grad on the default (XLA-rollout) path. Historical regression
        guard: before the round-3 custom_vjp, accidentally enabling the
        Pallas RHS here died with 'Differentiation rule for roll'."""
        from pde_superresolution_tpu.training import LossWeights
        from pde_superresolution_tpu.training import data as data_lib
        from pde_superresolution_tpu.training import losses as loss_lib

        eq, grid, model, params, dt, u0 = _learned_setup("ks", True, 6, batch=8)
        assert grid.size % 128 == 0  # the shape class that triggered the bug
        key = jax.random.PRNGKey(1)
        dataset = data_lib.TrainingData(
            inputs=u0,
            t=jnp.zeros((8,)),
            forcing=None,
            deriv_labels={
                d: jax.random.normal(jax.random.fold_in(key, d), u0.shape)
                for d in eq.derivative_orders
            },
            time_deriv_label=jax.random.normal(jax.random.fold_in(key, 9), u0.shape),
            rollout=jnp.tile(u0[:, None], (1, 2, 1)),
        )
        norms = loss_lib.compute_loss_norms(model, dataset, 2, dt, substeps=2)

        def f(p):
            loss, _ = loss_lib.compute_loss(
                model, p, dataset, norms, LossWeights(), dt=dt,
                unroll_steps=2, substeps=2,
            )
            return loss

        loss, grads = jax.jit(jax.value_and_grad(f))(params)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))

    def test_training_grads_via_pallas_match_xla(self):
        """compute_loss(use_pallas=True): the unrolled rollout's forward
        runs the fused Mosaic RHS and its backward the custom_vjp (XLA-twin
        linearization) — gradients must match the pure-XLA path on chip."""
        from pde_superresolution_tpu.training import LossWeights
        from pde_superresolution_tpu.training import data as data_lib
        from pde_superresolution_tpu.training import losses as loss_lib

        eq, grid, model, params, dt, u0 = _learned_setup("ks", True, 6, batch=8)
        u0 = 0.3 * u0
        key = jax.random.PRNGKey(1)
        dataset = data_lib.TrainingData(
            inputs=u0,
            t=jnp.zeros((8,)),
            forcing=None,
            deriv_labels={
                d: jax.random.normal(jax.random.fold_in(key, d), u0.shape)
                for d in eq.derivative_orders
            },
            time_deriv_label=jax.random.normal(jax.random.fold_in(key, 9), u0.shape),
            rollout=jnp.tile(u0[:, None], (1, 2, 1)),
        )
        norms = loss_lib.compute_loss_norms(model, dataset, 2, dt, substeps=2)

        def make(use_pallas):
            def f(p):
                loss, _ = loss_lib.compute_loss(
                    model, p, dataset, norms, LossWeights(), dt=dt,
                    unroll_steps=2, substeps=2, use_pallas=use_pallas,
                )
                return loss
            return jax.jit(jax.value_and_grad(f))

        loss_x, grads_x = make(False)(params)
        loss_p, grads_p = make(True)(params)
        assert np.isfinite(float(loss_p))
        np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-4)
        # compare against the GLOBAL gradient scale: near-zero-gradient
        # leaves carry float noise at ~1e-7 that a per-leaf relative test
        # would misread as disagreement
        leaves_x = [np.asarray(b) for b in jax.tree.leaves(grads_x)]
        scale = max(np.abs(b).max() for b in leaves_x)
        for a, b in zip(jax.tree.leaves(grads_p), leaves_x):
            assert np.abs(np.asarray(a) - b).max() / scale < 1e-3, (a, b)

    def test_forced_fused_learned_rk4_matches_xla(self):
        """Multi-step forced Burgers: in-kernel phase rotation vs XLA."""
        eq, grid, model, params, dt, u0 = _learned_setup(
            "burgers", True, 6, batch=16
        )
        forcing = eq.sample_forcing(jax.random.PRNGKey(3), (16,))
        t0 = 0.37
        rhs = model.rhs_fn(params, forcing, use_pallas=False)
        u, t = u0, t0
        for _ in range(5):
            u = integrate.rk4_step(rhs, u, jnp.asarray(t), dt)
            t += dt
        want = np.asarray(u)
        adv = jax.jit(model.fused_rk4_fn(params, dt, 5, batch_tile=8,
                                         forcing=forcing, t0=t0))
        got = np.asarray(adv(u0))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-4, err

    def test_forced_fused_rhs_matches_xla(self):
        """The in-kernel forcing path (round 1's deterministic axon hang —
        no longer reproducing, DECISIONS #15) against the XLA twin."""
        eq = equations.from_name("burgers", conservative=True)
        grid = Grid(8 * NX, eq.period).resample(8, conservative=True)
        model = StencilModel(eq, grid, ModelConfig(stencil_size=6))
        params = jax.tree.map(
            lambda leaf: leaf + 0.05 * jax.random.normal(jax.random.PRNGKey(1), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        u = eq.initial_conditions(jax.random.PRNGKey(2), grid, (BATCH,))
        forcing = eq.sample_forcing(jax.random.PRNGKey(3), (BATCH,))
        t = jnp.asarray(0.3)
        want = np.asarray(
            jax.jit(model.rhs_fn(params, forcing, use_pallas=False))(u, t)
        )
        got = np.asarray(
            jax.jit(model.rhs_fn(params, forcing, use_pallas=True))(u, t)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
