"""Batched 1-D convolution along time: direct and FFT-based.

Not in the reference (SURVEY §2) — the ``convolve``/``fftconvolve``
utilities torchaudio ships (RIR application, filtering with measured
kernels).  TPU formulation:

* :func:`convolve` lowers to ONE grouped ``lax.conv_general_dilated``
  (a per-example kernel becomes ``feature_group_count = batch`` — the
  MXU's native layout; HIGHEST precision, the parity default of this
  library).
* :func:`fftconvolve` multiplies one-sided rFFTs at the next power of
  two — O((n+m)·log) work, the right engine once kernels pass a few
  hundred taps (RIRs).

Both broadcast leading dims NumPy-style, support ``mode`` ∈
full|valid|same with ``scipy.signal`` semantics, and are
differentiable in both inputs.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["convolve", "fftconvolve"]


def _broadcast_lead(x: jnp.ndarray, y: jnp.ndarray):
    lead = np.broadcast_shapes(x.shape[:-1], y.shape[:-1])
    x = jnp.broadcast_to(x, lead + x.shape[-1:])
    y = jnp.broadcast_to(y, lead + y.shape[-1:])
    return x, y, lead


def _trim(full: jnp.ndarray, n: int, m: int, mode: str) -> jnp.ndarray:
    if mode == "full":
        return full
    if mode == "valid":
        length = max(n, m) - min(n, m) + 1
        start = min(n, m) - 1
        return full[..., start:start + length]
    if mode == "same":
        start = (min(n, m) - 1) // 2
        return full[..., start:start + max(n, m)]
    raise ValueError(f"mode must be full|valid|same, got {mode!r}")


def convolve(x: jnp.ndarray, y: jnp.ndarray,
             mode: str = "full") -> jnp.ndarray:
    """Direct linear convolution of ``x`` and ``y`` along the last axis.

    Leading dims broadcast; each broadcast element convolves its own
    pair (grouped conv — one MXU call for the whole batch).  Matches
    ``np.convolve`` / ``scipy.signal.convolve`` for every ``mode``.
    """
    if x.ndim == 0 or y.ndim == 0:
        raise ValueError("convolve needs at least 1-D inputs")
    x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    y = y.astype(x.dtype)
    n, m = x.shape[-1], y.shape[-1]
    x, y, lead = _broadcast_lead(x, y)
    g = int(np.prod(lead)) if lead else 1
    lhs = x.reshape((1, g, n))
    rhs = jnp.flip(y, -1).reshape((g, 1, m))
    full = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(m - 1, m - 1)],
        dimension_numbers=("NCT", "OIT", "NCT"),
        feature_group_count=g,
        precision=jax.lax.Precision.HIGHEST)
    full = full.reshape(lead + (n + m - 1,))
    return _trim(full, n, m, mode)


def fftconvolve(x: jnp.ndarray, y: jnp.ndarray,
                mode: str = "full") -> jnp.ndarray:
    """FFT-based linear convolution (same semantics as :func:`convolve`).

    Zero-pads to the next power of two ≥ ``n+m−1`` and multiplies
    one-sided spectra — preferable once kernels reach a few hundred
    taps (e.g. room impulse responses).
    """
    if x.ndim == 0 or y.ndim == 0:
        raise ValueError("fftconvolve needs at least 1-D inputs")
    x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    y = y.astype(x.dtype)
    n, m = x.shape[-1], y.shape[-1]
    x, y, lead = _broadcast_lead(x, y)
    size = n + m - 1
    nfft = 1 << max(int(math.ceil(math.log2(size))), 1)
    full = jnp.fft.irfft(jnp.fft.rfft(x, nfft) * jnp.fft.rfft(y, nfft),
                         nfft)[..., :size]
    return _trim(full, n, m, mode)
