"""Turn a run_evaluation HDF5 artifact into the paper-style figures.

The reference's downstream analysis — MAE-vs-time curves, survival-time
distributions, spectra, space-time diagrams — lived in notebooks outside
the three binaries (SURVEY.md §3.4 [LOW]: "happens in notebooks/analysis
code outside the three binaries"). This CLI is the reproducible
equivalent: it reads the HDF5 written by ``run_evaluation`` /
``run_sweep`` and emits the figures plus the text report.

Example:
  python -m pde_superresolution_tpu.scripts.run_analysis \
      --input_path=/tmp/eval.h5 --output_dir=/tmp/figs

Figures (PNG):
  mae.png       ensemble-mean MAE vs time per scheme (log y)
  survival.png  fraction of ensemble still valid vs time per scheme
  spectrum.png  time-averaged energy spectrum E(k), schemes vs exact
  spacetime.png space-time diagrams u(x, t) of one sample, all schemes
  coefficients.png  (with --checkpoint_dir) the paper's learned-stencil
                figure: where the predicted coefficients deviate from the
                classic polynomial stencil across the field, and the
                learned vs classic taps at the roughest and smoothest
                points — the discretization adapting to the local solution
"""

import os

import numpy as np
from absl import app, flags

from pde_superresolution_tpu import analysis

FLAGS = flags.FLAGS

flags.DEFINE_string("input_path", None,
                    "evaluation HDF5 artifact (or use --sweep_jsonl)")
flags.DEFINE_string(
    "sweep_jsonl", None,
    "run_sweep JSONL results instead of an evaluation HDF5: emits the "
    "paper's headline accuracy-vs-coarsening figure (final MAE and median "
    "survival vs resample factor, per scheme; hollow markers = some "
    "ensemble members diverged)")
flags.DEFINE_string("output_dir", None, "directory for figures",
                    required=True)
flags.DEFINE_float("period", 0.0,
                   "domain period for the spectrum's wavenumber axis; "
                   "0 = label the axis in cycles per domain instead")
flags.DEFINE_integer("sample", 0, "ensemble member for the space-time plot")
flags.DEFINE_integer(
    "spacetime_window", 0,
    "grid points shown in the space-time diagrams (0 = the whole domain); "
    "crop for large domains (e.g. --domain_factor evaluations) where the "
    "full width aliases into an unreadable raster")
flags.DEFINE_integer("dpi", 150, "figure raster resolution")
flags.DEFINE_string(
    "checkpoint_dir", None,
    "trained checkpoint; if given, also emit coefficients.png — the "
    "learned stencil coefficients across one model state vs the classic "
    "polynomial stencil (the paper's adaptive-coefficients figure)")
flags.DEFINE_integer(
    "coeff_time_index", -1,
    "trajectory snapshot for the coefficients figure; -1 = mid-horizon")

# Fixed scheme -> color assignment (identity, never cycled): the first
# three slots of the validated categorical palette; the exact reference
# is neutral ink (it is the ground truth, not a competing series).
_SCHEME_COLORS = {
    "model": "#2a78d6",     # blue
    "baseline": "#eb6834",  # orange
    "weno": "#1baf7a",      # aqua
}
_EXTRA_COLORS = ["#eda100", "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
_EXACT_COLOR = "#52514e"
_SURFACE = "#fcfcfb"
_GRID = "#e1e0d9"
_MUTED = "#898781"
_AXIS = "#c3c2b7"
_INK = "#0b0b0b"


def _color(name: str, fallback_idx: int) -> str:
    if name in _SCHEME_COLORS:
        return _SCHEME_COLORS[name]
    return _EXTRA_COLORS[fallback_idx % len(_EXTRA_COLORS)]


def _style_axes(ax):
    ax.set_facecolor(_SURFACE)
    ax.grid(True, color=_GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(_AXIS)
    ax.tick_params(colors=_MUTED, labelcolor=_MUTED)
    ax.xaxis.label.set_color(_INK)
    ax.yaxis.label.set_color(_INK)
    ax.title.set_color(_INK)


def make_figures(result, output_dir: str, period: float = 0.0,
                 sample: int = 0, dpi: int = 150,
                 spacetime_window: int = 0) -> list:
    """Write the four figures for an EvalResult; returns the paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    paths = []
    names = sorted(result.mae)
    rel = np.asarray(result.times, dtype=np.float64)
    rel = rel - rel[0]

    # 1. MAE vs time: ensemble-median over members still valid (a member
    # blowing up passes through astronomically large float values before
    # reaching NaN, so an unconditioned mean is unreadable); the line ends
    # once fewer than half the ensemble survives (beyond that the curve
    # would describe a shrinking, survivor-biased subset).
    fig, ax = plt.subplots(figsize=(6, 3.6), facecolor=_SURFACE)
    for i, name in enumerate(names):
        mae = np.asarray(result.mae[name], dtype=np.float64)
        surv = np.asarray(result.survival_time[name], dtype=np.float64)
        alive = (surv[:, None] >= rel[None, :]) & np.isfinite(mae)
        masked = np.where(alive, mae, np.nan)
        n_alive = alive.sum(axis=0)
        med = np.full(rel.shape, np.nan)
        ok = n_alive >= (mae.shape[0] + 1) // 2  # at least half survive
        if ok.any():
            med[ok] = np.nanmedian(masked[:, ok], axis=0)
        ax.plot(rel, med, color=_color(name, i), linewidth=2, label=name)
    ax.set_yscale("log")
    ax.set_xlabel("time since evaluation start")
    ax.set_ylabel("median MAE vs exact (valid members)")
    _style_axes(ax)
    ax.legend(frameon=False, labelcolor=_INK)
    fig.tight_layout()
    p = os.path.join(output_dir, "mae.png")
    fig.savefig(p, dpi=dpi, facecolor=_SURFACE)
    plt.close(fig)
    paths.append(p)

    # 2. Survival curves (fraction of ensemble valid vs time).
    fig, ax = plt.subplots(figsize=(6, 3.6), facecolor=_SURFACE)
    for i, (name, (t, frac)) in enumerate(
        sorted(analysis.survival_curves(result).items())
    ):
        ax.step(t, frac, where="post", color=_color(name, i), linewidth=2,
                label=name)
    ax.set_ylim(-0.02, 1.05)
    ax.set_xlabel("time since evaluation start")
    ax.set_ylabel("fraction of ensemble valid")
    _style_axes(ax)
    ax.legend(frameon=False, labelcolor=_INK)
    fig.tight_layout()
    p = os.path.join(output_dir, "survival.png")
    fig.savefig(p, dpi=dpi, facecolor=_SURFACE)
    plt.close(fig)
    paths.append(p)

    # 3. Energy spectra: exact vs schemes, averaged over all times and the
    # members that stayed finite for the whole horizon.
    fig, ax = plt.subplots(figsize=(6, 3.6), facecolor=_SURFACE)
    nx = np.asarray(result.exact).shape[-1]
    spec_period = period if period > 0 else float(nx)
    k, e = analysis.energy_spectrum(np.asarray(result.exact), spec_period)
    ax.loglog(k[1:], e[1:], color=_EXACT_COLOR, linewidth=2,
              linestyle="--", label="exact")
    for i, name in enumerate(names):
        traj = np.asarray(result.trajectories[name], dtype=np.float64)
        alive = np.isfinite(traj).all(axis=(1, 2))
        if not alive.any():
            continue
        k, e = analysis.energy_spectrum(traj[alive], spec_period)
        ax.loglog(k[1:], e[1:], color=_color(name, i), linewidth=2,
                  label=name)
    ax.set_xlabel(
        "wavenumber k" if period > 0 else "wavenumber (cycles/domain scale)"
    )
    ax.set_ylabel("E(k)")
    _style_axes(ax)
    ax.legend(frameon=False, labelcolor=_INK)
    fig.tight_layout()
    p = os.path.join(output_dir, "spectrum.png")
    fig.savefig(p, dpi=dpi, facecolor=_SURFACE)
    plt.close(fig)
    paths.append(p)

    # 4. Space-time diagrams of one member: exact + every scheme, shared
    # symmetric diverging scale (u is signed; blue <-> red, neutral mid).
    # An optional window crops the spatial axis (periodic fields carry the
    # same statistics everywhere; the full width of a large domain aliases
    # into an unreadable raster).
    w = spacetime_window
    crop = (lambda u: u[..., :w]) if w else (lambda u: u)
    panels = [("exact", crop(np.asarray(result.exact)[sample]))]
    panels += [
        (name, crop(np.asarray(result.trajectories[name])[sample]))
        for name in names
    ]
    vmax = float(np.nanmax(np.abs(panels[0][1]))) or 1.0
    fig, axes = plt.subplots(
        1, len(panels), figsize=(3.2 * len(panels), 3.6),
        facecolor=_SURFACE, sharey=True,
    )
    for ax, (name, u) in zip(np.atleast_1d(axes), panels):
        u = np.where(np.isfinite(u), u, 0.0)
        ax.imshow(
            u, aspect="auto", origin="lower", cmap="RdBu_r",
            vmin=-vmax, vmax=vmax,
            extent=(0, u.shape[1], float(rel[0]), float(rel[-1])),
        )
        ax.set_title(name)
        ax.set_xlabel("x (grid index)")
        ax.tick_params(colors=_MUTED, labelcolor=_MUTED)
        ax.title.set_color(_INK)
        ax.xaxis.label.set_color(_INK)
    np.atleast_1d(axes)[0].set_ylabel("time")
    np.atleast_1d(axes)[0].yaxis.label.set_color(_INK)
    fig.tight_layout()
    p = os.path.join(output_dir, "spacetime.png")
    fig.savefig(p, dpi=dpi, facecolor=_SURFACE)
    plt.close(fig)
    paths.append(p)

    return paths


def make_coefficients_figure(model, params, u, output_dir: str,
                             dpi: int = 150) -> str:
    """The paper's central qualitative figure: learned coefficients adapt
    to the local solution.

    For each derivative order, two views of one state ``u``:
      * a diverging heatmap of (learned − classic) per stencil tap across
        the whole field — where the model departs from polynomial numerics;
      * the full coefficient vectors (learned vs classic) at the roughest
        point (max |∂u/∂x| — a shock/front) and the smoothest point, the
        comparison the reference paper draws (model.py §predict_coefficients
        vs §baseline_space_derivatives; unverified — SURVEY.md).

    Coefficients are shown in grid units (× dx^order), so classic taps are
    O(1) ([1,−2,1]-style) regardless of resolution.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    u = np.asarray(u, dtype=np.float64)
    nx = u.shape[-1]
    dx = model.grid.dx
    coeffs = {
        d: np.asarray(c[0], dtype=np.float64) * dx**d  # [nx, S], grid units
        for d, c in model.coefficients(params, u[None]).items()
    }
    orders = sorted(coeffs)
    # roughest / smoothest points of this state (periodic gradient)
    slope = np.abs(np.gradient(u, dx))
    i_rough, i_smooth = int(slope.argmax()), int(slope.argmin())

    fig = plt.figure(
        figsize=(9, 2.6 * (len(orders) + 1)), facecolor=_SURFACE
    )
    gs = fig.add_gridspec(len(orders) + 1, 2)
    # top row: the state, with the two probed locations marked
    ax_u = fig.add_subplot(gs[0, :])
    x = np.arange(nx) * dx
    ax_u.plot(x, u, color=_EXACT_COLOR, linewidth=2)
    for idx, label in ((i_rough, "roughest"), (i_smooth, "smoothest")):
        ax_u.axvline(x[idx], color=_SCHEME_COLORS["model"], linewidth=1,
                     linestyle=":" if label == "smoothest" else "-")
        ax_u.annotate(label, (x[idx], float(u[idx])), color=_INK,
                      fontsize=8, xytext=(4, 4), textcoords="offset points")
    ax_u.set_xlabel("x")
    ax_u.set_ylabel("u")
    _style_axes(ax_u)

    for row, d in enumerate(orders, start=1):
        c = coeffs[d]  # [nx, S]
        layer = model.constraint_layers[d]
        classic = np.asarray(layer.c0, dtype=np.float64) * dx**d
        offsets = np.asarray(layer.offsets, dtype=np.float64)
        dev = c - classic[None, :]

        ax = fig.add_subplot(gs[row, 0])
        vmax = float(np.nanmax(np.abs(dev))) or 1.0
        im = ax.imshow(
            dev.T, aspect="auto", origin="lower", cmap="RdBu_r",
            vmin=-vmax, vmax=vmax,
            extent=(0, nx * dx, offsets[0], offsets[-1]),
        )
        ax.set_xlabel("x")
        ax.set_ylabel(f"tap offset (order {d})")
        ax.set_title(f"learned − classic, order {d}", fontsize=9)
        ax.title.set_color(_INK)
        ax.tick_params(colors=_MUTED, labelcolor=_MUTED)
        ax.xaxis.label.set_color(_INK)
        ax.yaxis.label.set_color(_INK)
        fig.colorbar(im, ax=ax, fraction=0.046)

        ax = fig.add_subplot(gs[row, 1])
        ax.plot(offsets, classic, color=_SCHEME_COLORS["baseline"],
                linewidth=2, linestyle="--", marker="o", markersize=5,
                fillstyle="none", label="classic")
        ax.plot(offsets, c[i_rough], color=_SCHEME_COLORS["model"],
                linewidth=2, marker="o", markersize=5, label="learned @ roughest")
        ax.plot(offsets, c[i_smooth], color=_SCHEME_COLORS["model"],
                linewidth=2, linestyle=":", marker="o", markersize=5,
                fillstyle="none", label="learned @ smoothest")
        ax.axhline(0.0, color=_AXIS, linewidth=0.8)
        ax.set_xlabel("stencil offset (grid units)")
        ax.set_ylabel(f"coefficient · dx^{d}")
        _style_axes(ax)
        ax.legend(frameon=False, labelcolor=_INK, fontsize=8)

    fig.tight_layout()
    p = os.path.join(output_dir, "coefficients.png")
    fig.savefig(p, dpi=dpi, facecolor=_SURFACE)
    plt.close(fig)
    return p


def make_sweep_figures(records: list, output_dir: str, dpi: int = 150) -> list:
    """The paper's accuracy-vs-coarsening figure from run_sweep JSONL rows.

    Two panels as separate PNGs: final MAE vs resample factor (log-log)
    and median survival time vs factor (log x). A scheme's point is drawn
    hollow when some ensemble members diverged (its MAE is then over the
    survivors only); a fully-diverged row has no MAE point but still has
    a survival point (survival of a dead member is its blowup time).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    names = sorted(
        {k[: -len("_mae")] for r in records for k in r if k.endswith("_mae")}
    )
    factors = sorted({int(r["factor"]) for r in records})
    by_factor = {int(r["factor"]): r for r in records}
    paths = []
    specs = [
        ("sweep_mae.png", "_mae", "final MAE vs exact (survivors)", True),
        ("sweep_survival.png", "_survival_median",
         "median survival time", False),
    ]
    for fname, suffix, ylabel, logy in specs:
        fig, ax = plt.subplots(figsize=(6, 3.6), facecolor=_SURFACE)
        for i, name in enumerate(names):
            color = _color(name, i)
            xs, ys, hollow = [], [], []
            for f in factors:
                r = by_factor[f]
                v = r.get(name + suffix)
                if v is None:
                    continue
                xs.append(f)
                ys.append(v)
                hollow.append(bool(r.get(name + "_diverged")))
            if not xs:
                continue
            ax.plot(xs, ys, color=color, linewidth=2, label=name, zorder=2)
            for x, y, h in zip(xs, ys, hollow):
                ax.plot([x], [y], marker="o", markersize=6, color=color,
                        fillstyle="none" if h else "full", zorder=3)
        ax.set_xscale("log", base=2)
        ax.set_xticks(factors)
        ax.set_xticklabels([f"{f}x" for f in factors])
        if logy:
            ax.set_yscale("log")
        ax.set_xlabel("resample factor (coarsening)")
        ax.set_ylabel(ylabel)
        _style_axes(ax)
        ax.legend(frameon=False, labelcolor=_INK)
        fig.tight_layout()
        p = os.path.join(output_dir, fname)
        fig.savefig(p, dpi=dpi, facecolor=_SURFACE)
        plt.close(fig)
        paths.append(p)
    return paths


def main(argv):
    del argv
    # Post-processing never needs the accelerator; force CPU so this CLI
    # can run alongside a TPU job (the axon plugin ignores JAX_PLATFORMS —
    # DECISIONS.md — so the config call is the only reliable way).
    import jax

    jax.config.update("jax_platforms", "cpu")
    if bool(FLAGS.input_path) == bool(FLAGS.sweep_jsonl):
        raise app.UsageError(
            "pass exactly one of --input_path / --sweep_jsonl")
    if FLAGS.sweep_jsonl:
        import json

        with open(FLAGS.sweep_jsonl) as f:
            records = [json.loads(l) for l in f if l.strip()]
        for p in make_sweep_figures(records, FLAGS.output_dir, dpi=FLAGS.dpi):
            print("wrote", p)
        return
    result = analysis.load_eval_h5(FLAGS.input_path)
    print(analysis.report(result))
    paths = make_figures(
        result,
        FLAGS.output_dir,
        period=FLAGS.period,
        sample=FLAGS.sample,
        dpi=FLAGS.dpi,
        spacetime_window=FLAGS.spacetime_window,
    )
    if FLAGS.checkpoint_dir:
        from pde_superresolution_tpu.training import loop as loop_lib

        model, params, _ = loop_lib.load_model(FLAGS.checkpoint_dir)
        traj = np.asarray(result.trajectories.get(
            "model", result.exact))[FLAGS.sample]
        t_idx = FLAGS.coeff_time_index
        if t_idx < 0:
            t_idx = traj.shape[0] // 2
        u = traj[t_idx]
        if traj.shape[-1] != model.grid.size:
            raise ValueError(
                f"artifact grid ({traj.shape[-1]} points) does not match "
                f"the checkpoint's ({model.grid.size})"
            )
        if not np.isfinite(u).all():
            # a diverged member: fall back to the exact trajectory's state
            u = np.asarray(result.exact)[FLAGS.sample, t_idx]
        paths.append(
            make_coefficients_figure(
                model, params, u, FLAGS.output_dir, dpi=FLAGS.dpi
            )
        )
    for p in paths:
        print("wrote", p)


if __name__ == "__main__":
    app.run(main)
