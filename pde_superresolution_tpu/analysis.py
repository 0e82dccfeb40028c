"""Offline analysis helpers for evaluation artifacts.

The reference's downstream analysis (MAE-vs-time curves, survival-time
distributions, spectra) lived in notebooks outside the three binaries
(SURVEY.md §3.4 [LOW]); these are the equivalent library utilities,
operating on ``evaluate.EvalResult`` / the HDF5 artifacts it saves.
"""

from __future__ import annotations

import numpy as np

from pde_superresolution_tpu.evaluate import EvalResult, load_eval_h5  # noqa: F401


def mae_curves(result: EvalResult) -> dict:
    """Ensemble-mean MAE vs time per scheme: {scheme: (times, mae[T])}."""
    times = np.asarray(result.times)
    return {
        name: (times, np.asarray(mae).mean(axis=0))
        for name, mae in result.mae.items()
    }


def survival_summary(result: EvalResult) -> dict:
    """Survival-time stats per scheme: median/mean/quantiles over the ensemble."""
    out = {}
    for name, st in result.survival_time.items():
        st = np.asarray(st, dtype=np.float64)
        out[name] = {
            "median": float(np.median(st)),
            "mean": float(st.mean()),
            "q25": float(np.quantile(st, 0.25)),
            "q75": float(np.quantile(st, 0.75)),
            "min": float(st.min()),
            "max": float(st.max()),
        }
    return out


def survival_curves(result: EvalResult) -> dict:
    """Fraction of ensemble members still valid vs time, per scheme.

    The paper's survival-time figures are distributions over the ensemble;
    this is the standard survival-curve view of the same data: for each
    scheme, ``frac[t] = P(survival_time >= t)`` on the evaluation's own
    time grid (relative to the evaluation start, warmup excluded — the
    same convention as ``EvalResult.survival_time``).
    """
    rel = np.asarray(result.times, dtype=np.float64)
    rel = rel - rel[0]
    return {
        name: (
            rel,
            (np.asarray(st, dtype=np.float64)[:, None] >= rel[None, :]).mean(
                axis=0
            ),
        )
        for name, st in result.survival_time.items()
    }


def energy_spectrum(u: np.ndarray, period: float) -> tuple[np.ndarray, np.ndarray]:
    """Mean 1-D energy spectrum E(k) over all leading (ensemble/time) axes.

    Returns (k, E) with k the angular wavenumbers of the rfft and
    ``E[k] = <|u_hat_k|^2> / n^2`` (Parseval-normalized so that
    ``sum E ~ <u^2>`` up to the one-sided counting).
    """
    u = np.asarray(u)
    n = u.shape[-1]
    u_hat = np.fft.rfft(u, axis=-1)
    e = (np.abs(u_hat) ** 2).reshape(-1, u_hat.shape[-1]).mean(axis=0) / n**2
    k = 2 * np.pi * np.fft.rfftfreq(n, d=period / n)
    return k, e


def report(result: EvalResult, reference_scheme: str = "exact") -> str:
    """Human-readable comparison table (what run_evaluation prints, richer)."""
    lines = []
    surv = survival_summary(result)
    horizon = float(np.asarray(result.times)[-1] - np.asarray(result.times)[0])
    for name in sorted(result.mae):
        final = np.asarray(result.mae[name])[:, -1]
        finite = np.isfinite(final)
        mae = final[finite].mean() if finite.any() else float("nan")
        note = f" [{int((~finite).sum())} diverged]" if (~finite).any() else ""
        s = surv[name]
        lines.append(
            f"{name:>12}: MAE final {mae:.4f}{note} | "
            f"survival median {s['median']:.2f} (IQR {s['q25']:.2f}-"
            f"{s['q75']:.2f}) of horizon {horizon:.1f}"
        )
    return "\n".join(lines)
