"""Serving export: freeze a trained model into a standalone StableHLO artifact.

The reference ships inference as a frozen TF graph restored by
``integrate.py §SavedModelDifferentiator`` (unverified citation — see
SURVEY.md provenance warning): a user integrates a trained model without any
of the model-construction code. The TPU-native equivalent is ``jax.export``:
the model's RHS (and optionally a multi-step RK4 advance) is traced once,
lowered to StableHLO for BOTH cpu and tpu, and serialized to disk. The
loader (`ServedModel`) deserializes and calls it — no flax/optax/orbax, no
``StencilModel``, no stencil math; just jax + the bytes.

Design notes (TPU-first, not a port):

* The batch (trajectory/ensemble) dimension is exported SYMBOLIC, so one
  artifact serves any ensemble size — the serving analogue of the
  training-side DP sharding over trajectories. The grid size is baked in:
  a learned discretization is bound to its grid (stencil geometry, dx), so
  a fixed ``nx`` is a feature, not a limitation.
* Forcing parameters are exported as call ARGUMENTS (four ``[batch,
  num_terms]`` arrays), not baked constants: forced equations (Burgers)
  draw per-trajectory forcing at evaluation time, and a frozen artifact
  must serve arbitrary draws.
* The export uses the XLA (non-Pallas) RHS path: StableHLO with a Mosaic
  custom call is not portable across cpu/tpu, and the stencil-apply the
  kernel accelerates is nearly free next to the conv tower (RESULTS.md
  round-3 ablation). The ``num_steps`` advance recovers the fused path's
  main win — amortizing per-call overhead — via an in-graph ``lax.scan``.
* Artifacts are forward-only (like the reference's frozen graphs): training
  needs the live library.

Layout of an artifact directory::

    meta.json       # physics + geometry + calling convention, versioned
    rhs.stablehlo   # (u[b,nx], t[]) [, 4x forcing[b,m]] -> u_t[b,nx]
    step.stablehlo  # optional: same signature -> u after num_steps RK4 steps
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from pde_superresolution_tpu.equations import ForcingParams
from pde_superresolution_tpu.integrate import rk4_step

FORMAT_VERSION = 1
DEFAULT_PLATFORMS = ("cpu", "tpu")

_RHS_FILE = "rhs.stablehlo"
_STEP_FILE = "step.stablehlo"
_META_FILE = "meta.json"


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _export_fn(fn, args_specs, platforms):
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(*args_specs)


def export_model(
    model,
    params,
    *,
    dt: Optional[float] = None,
    num_steps: int = 0,
    platforms=DEFAULT_PLATFORMS,
    fine_size: Optional[int] = None,
    resample_factor: Optional[int] = None,
    extra_meta: Optional[dict] = None,
):
    """Trace a trained ``StencilModel`` into serialized StableHLO.

    Args:
      model: a ``models.StencilModel`` (grid- and equation-bound).
      params: trained parameter pytree.
      dt: RK4 step for the ``num_steps`` advance artifact; ``None`` uses
        the MODEL-aware stable step (``StencilModel.stable_time_step``,
        u_scale=3): the equation-level bound for stencils ≤8, tighter for
        wider stencils whose larger spectral radii make the equation
        bound unstable (DECISIONS.md #16). The model-aware bound is also
        recorded as ``meta["stable_dt"]`` so the science CLIs integrate
        the frozen rhs at a stable step.
      num_steps: if > 0, additionally export an advance function that runs
        ``num_steps`` RK4 steps of size ``dt`` in one call (an in-graph
        ``lax.scan`` — the serving hot path).
      platforms: lowering targets; the default covers cpu and tpu so one
        artifact tests on a CPU host and serves on the chip.
      fine_size: size of the fine (reference-solution) grid the model was
        trained against. Optional — the frozen graph doesn't need it — but
        the science CLIs (``run_evaluation``/``run_ensemble
        --exported_dir``) do (``science_context``): without it an artifact
        can be integrated but not evaluated against exact solves.
      resample_factor: coarsening factor between that fine grid and the
        model grid; same role as ``fine_size``.

    Returns:
      (meta, exported) where ``meta`` is the JSON-able metadata dict and
      ``exported`` maps ``"rhs"`` (and ``"step"`` if requested) to
      ``jax.export.Exported`` objects.
    """
    equation = model.equation
    grid = model.grid
    nx = grid.size
    forced = equation.forced
    m = equation.num_forcing_terms if forced else 0

    if num_steps and dt is None:
        # model-aware CFL: wide stencils have larger spectral radii than
        # the equation-level bound assumes (StencilModel.stable_time_step)
        dt = float(model.stable_time_step(u_scale=3.0))

    def with_forcing(fn):
        if not forced:
            return fn

        def wrapped(u, t, amplitude, omega, k, phi):
            return fn(u, t, ForcingParams(amplitude, omega, k, phi))

        return wrapped

    def rhs(u, t, forcing=None):
        return model.time_derivative(params, u, t, forcing)

    def step(u, t, forcing=None):
        rhs_fn = model.rhs_fn(params, forcing, use_pallas=False)

        def body(carry, _):
            u, t = carry
            return (rk4_step(rhs_fn, u, t, dt), t + dt), None

        (u, _), _ = jax.lax.scan(body, (u, t), None, length=num_steps)
        return u

    (b,) = jax_export.symbolic_shape("b")
    specs = [_spec((b, nx)), _spec(())]
    if forced:
        specs += [_spec((b, m))] * 4

    exported = {"rhs": _export_fn(with_forcing(rhs), specs, platforms)}
    if num_steps:
        exported["step"] = _export_fn(with_forcing(step), specs, platforms)

    # The artifact must carry its physics: serialize every equation
    # dataclass field (eta, forcing/IC wavenumber bands, ...) so that
    # science_context rebuilds the EXACT equation the model was trained on.
    # Leaving this to callers (the old extra_meta path) silently rebuilt
    # default physics for e.g. an eq.eta=0.02 model — the class of drift
    # data.save_snapshots_h5 and the resume config-diff guard against.
    # 'conservative' is stored separately below (and from_name takes it as
    # its own argument in science_context).
    from pde_superresolution_tpu.equations import params_dict

    eq_params = params_dict(equation)

    meta = {
        "format_version": FORMAT_VERSION,
        "equation": equation.name,
        "conservative": bool(equation.conservative),
        "equation_params": eq_params,
        "forced": bool(forced),
        "num_forcing_terms": int(m),
        "period": float(grid.period),
        "nx": int(nx),
        "dx": float(grid.dx),
        "platforms": list(platforms),
        "dt": float(dt) if num_steps else None,
        "num_steps": int(num_steps),
        # the model-aware stable RK4 step (StencilModel.stable_time_step):
        # consumers of the frozen rhs (run_ensemble/run_evaluation
        # --exported_dir) must integrate at THIS step, not the equation
        # bound — for wide stencils the equation bound is unstable
        # (DECISIONS.md #16) and the live model is gone at serve time
        "stable_dt": float(model.stable_time_step(u_scale=3.0)),
        "stencil_size": int(model.config.stencil_size),
        "fine_size": int(fine_size) if fine_size else None,
        "resample_factor": int(resample_factor) if resample_factor else None,
    }
    if extra_meta:
        meta.update(extra_meta)
    return meta, exported


def save_exported_model(path: str, meta: dict, exported: dict) -> None:
    """Write an artifact directory (meta.json + one file per function)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    files = {"rhs": _RHS_FILE, "step": _STEP_FILE}
    for name, exp in exported.items():
        with open(os.path.join(path, files[name]), "wb") as f:
            f.write(exp.serialize())


def export_and_save(model, params, path: str, **kwargs) -> dict:
    """``export_model`` + ``save_exported_model``; returns the metadata."""
    meta, exported = export_model(model, params, **kwargs)
    save_exported_model(path, meta, exported)
    return meta


class ServedModel:
    """A frozen model loaded from an export directory.

    The serving counterpart of the reference's ``SavedModelDifferentiator``
    (unverified citation): needs no model code, checkpoint, or config — only
    the artifact bytes. ``rhs_fn(forcing)`` matches the ``Differentiator``
    protocol (including the ``.conservative`` family tag), so a served model
    plugs directly into ``integrate.integrate`` and ``evaluate.evaluate``.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _META_FILE)) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} is newer "
                f"than this library supports ({FORMAT_VERSION})"
            )
        with open(os.path.join(path, _RHS_FILE), "rb") as f:
            self._rhs = jax_export.deserialize(f.read())
        step_path = os.path.join(path, _STEP_FILE)
        self._step = None
        if os.path.exists(step_path):
            with open(step_path, "rb") as f:
                self._step = jax_export.deserialize(f.read())

    @property
    def conservative(self) -> bool:
        return self.meta["conservative"]

    @property
    def nx(self) -> int:
        return self.meta["nx"]

    def _prepare(self, u, forcing):
        """Flatten leading dims to one batch axis; normalize forcing args."""
        u = jnp.asarray(u, jnp.float32)
        if u.shape[-1] != self.nx:
            raise ValueError(
                f"u has {u.shape[-1]} grid points; artifact expects {self.nx}"
            )
        lead = u.shape[:-1]
        u2 = u.reshape((-1, self.nx))
        args = []
        if self.meta["forced"]:
            if forcing is None:
                raise ValueError(
                    f"artifact for forced equation {self.meta['equation']!r} "
                    "requires forcing parameters"
                )
            m = self.meta["num_forcing_terms"]
            for arr in forcing:
                arr = jnp.asarray(arr, jnp.float32)
                if arr.shape[-1] != m:
                    raise ValueError(
                        f"forcing has {arr.shape[-1]} terms; artifact "
                        f"expects {m}"
                    )
                args.append(
                    jnp.broadcast_to(arr, lead + (m,)).reshape((-1, m))
                )
        elif forcing is not None:
            raise ValueError(
                f"artifact for unforced equation {self.meta['equation']!r} "
                "does not take forcing"
            )
        return u2, lead, args

    def rhs_fn(self, forcing: Optional[ForcingParams] = None):
        """(u, t) -> u_t closure over the frozen graph.

        Accepts any leading batch shape (flattened to the artifact's
        symbolic batch dim and restored); per-trajectory forcing broadcasts
        against the batch shape like the live model's.
        """

        def rhs(u, t):
            u2, lead, args = self._prepare(u, forcing)
            t = jnp.asarray(t, jnp.float32)
            out = self._rhs.call(u2, t, *args)
            return out.reshape(lead + (self.nx,))

        rhs.conservative = self.conservative
        return rhs

    def advance(self, u, t, forcing: Optional[ForcingParams] = None):
        """Advance ``u`` by the artifact's ``num_steps`` RK4 steps of ``dt``.

        Returns (u_next, t_next). Raises if the artifact was exported
        without a step function.
        """
        if self._step is None:
            raise ValueError("artifact was exported without a step function")
        u2, lead, args = self._prepare(u, forcing)
        t = jnp.asarray(t, jnp.float32)
        out = self._step.call(u2, t, *args)
        t_next = t + self.meta["dt"] * self.meta["num_steps"]
        return out.reshape(lead + (self.nx,)), t_next


def load_served_model(path: str) -> ServedModel:
    return ServedModel(path)


def science_context(meta: dict):
    """Rebuild ``(equation, fine_grid, coarse_grid)`` from artifact metadata.

    The frozen graph carries no Python objects, but the science pipeline
    around it (ICs, warmup solves, CFL steps, evaluation) needs the equation
    and the exact grid geometry the model was trained on — including the
    half-cell origin shift of conservative coarse grids, which is why the
    coarse grid is reconstructed by resampling the fine one rather than
    built directly from ``nx``/``dx``.
    """
    from pde_superresolution_tpu import equations
    from pde_superresolution_tpu.grids import Grid

    if not meta.get("fine_size") or not meta.get("resample_factor"):
        raise ValueError(
            "artifact metadata lacks fine_size/resample_factor — it was "
            "exported without the science-pipeline keys (export_model's "
            "fine_size=/resample_factor= arguments, which run_export fills "
            "from the checkpoint config). The frozen graph can still be "
            "integrated via ServedModel.rhs_fn/advance, but the evaluation "
            "CLIs need the fine-grid geometry to build exact references."
        )
    equation = equations.from_name(
        meta["equation"],
        conservative=meta["conservative"],
        **meta.get("equation_params", {}),
    )
    fine = Grid(meta["fine_size"], equation.period)
    coarse = fine.resample(
        meta["resample_factor"], conservative=equation.conservative
    )
    if coarse.size != meta["nx"]:
        raise ValueError(
            f"inconsistent artifact metadata: fine_size/resample_factor give "
            f"{coarse.size} coarse points but nx is {meta['nx']}"
        )
    return equation, fine, coarse
