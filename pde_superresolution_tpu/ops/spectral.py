"""Spectral (FFT) derivatives and filters on periodic 1-D domains.

≈ pde_superresolution/duckarray.py §spectral_derivative, §smoothing_filter
(unverified — see SURVEY.md provenance warning).

All ops use ``rfft/irfft`` on the last axis and trace under jit; on TPU the
FFTs lower to XLA's native FFT.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def wavenumbers(size: int, period: float) -> np.ndarray:
    """Angular wavenumbers ``2*pi*k/period`` for the rfft of a length-``size``
    real signal. Returned as float64 numpy (setup-time constant)."""
    return 2 * np.pi * np.fft.rfftfreq(size, d=period / size)


# NOTE: every public op here is jit-compiled with static non-array args.
# This is not (only) an optimization: on this environment's axon TPU backend
# eager (op-by-op) FFTs raise UNIMPLEMENTED — FFTs must go through XLA
# compilation. The jit caches key on (shape, order, period, axis).


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _spectral_derivative(u, order, period, axis):
    if axis != -1:
        u = jnp.moveaxis(u, axis, -1)
    n = u.shape[-1]
    k = wavenumbers(n, period)
    mult = (1j * k) ** order  # setup-time numpy constant
    if order % 2 and n % 2 == 0:
        mult = mult.copy()
        mult[-1] = 0
    out = jnp.fft.irfft(jnp.fft.rfft(u) * mult, n=n).astype(u.dtype)
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def spectral_derivative(
    u: jnp.ndarray, order: int, period: float, axis: int = -1
) -> jnp.ndarray:
    """Exact derivative of a band-limited periodic signal via FFT.

    Multiplies by ``(i*k)**order`` in Fourier space. For odd orders the
    Nyquist mode is zeroed (its derivative is pure-imaginary and cannot be
    represented on the real grid; zeroing is the standard symmetric choice).
    """
    return _spectral_derivative(jnp.asarray(u), order, float(period), axis)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _spectral_derivative_at_offset(u, order, period, offset):
    n = u.shape[-1]
    k = wavenumbers(n, period)
    mult = (1j * k) ** order * np.exp(1j * k * offset)
    # zero the Nyquist bin for odd orders or genuine (non-grid-multiple)
    # shifts; the grid-multiple test must be tolerance-based — exact float
    # modulo can misclassify offsets like 3*period/n
    dx = period / n
    frac = offset / dx - round(offset / dx)
    if n % 2 == 0 and (order % 2 or abs(frac) > 1e-9):
        mult = mult.copy()
        mult[-1] = 0
    return jnp.fft.irfft(jnp.fft.rfft(u) * mult, n=n).astype(u.dtype)


def spectral_derivative_at_offset(
    u: jnp.ndarray, order: int, period: float, offset: float
) -> jnp.ndarray:
    """Derivative evaluated at points shifted by ``offset`` (physical units).

    Combines the differentiation symbol ``(ik)^order`` with the Fourier shift
    theorem ``exp(ik*offset)``: output index j is the derivative at
    ``x_j + offset``. Used to produce exact *face* labels (x_{j+1/2}) for
    conservative models. The Nyquist bin is zeroed whenever a genuine shift
    or odd derivative is requested (its shifted value is not representable).
    """
    return _spectral_derivative_at_offset(
        jnp.asarray(u), order, float(period), float(offset)
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _smoothing_filter(u, period, cutoff_fraction, axis):
    if axis != -1:
        u = jnp.moveaxis(u, axis, -1)
    n = u.shape[-1]
    k = wavenumbers(n, period)
    k_c = cutoff_fraction * k[-1]
    mult = np.exp(-((k / k_c) ** 2))
    out = jnp.fft.irfft(jnp.fft.rfft(u) * mult, n=n).astype(u.dtype)
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def smoothing_filter(
    u: jnp.ndarray, period: float, cutoff_fraction: float = 0.5, axis: int = -1
) -> jnp.ndarray:
    """Gaussian low-pass filter: attenuates modes above a fraction of Nyquist.

    Multiplies spectrum by ``exp(-(k/k_c)**2)`` with
    ``k_c = cutoff_fraction * k_nyquist``. Used to smooth random initial
    conditions so the fine-grid exact solve is well resolved.
    """
    return _smoothing_filter(
        jnp.asarray(u), float(period), float(cutoff_fraction), axis
    )
