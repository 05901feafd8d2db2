"""Approximate mel-spectrogram inversion (rebuild-only addition).

Completes the inversion path the library's users need:
``log-mel → mel → linear magnitude → (griffin_lim) → waveform``.
Not in the reference (SURVEY §2); included so the feature pipeline is
invertible end-to-end (torchaudio's ``InverseMelScale`` analog, solved
in closed form instead of by SGD).

TPU-first: inversion is a single precomputed matrix applied as one MXU
GEMM — the regularized least-squares solve happens once in float64
NumPy at trace time (mel matrices are tiny), so runtime cost is the
same as ``apply_filterbank``.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .filters import _mel_filter_np

__all__ = ["create_inverse_mel_filter", "mel_to_linear"]


@functools.lru_cache(maxsize=16)
def _inverse_mel_np(num_mels: int, sample_rate: float, f_min: float,
                    f_max: float, num_bins: int, ridge: float) -> np.ndarray:
    """(num_mels, num_bins) regularized pseudo-inverse of the mel matrix.

    Solves ``min_G ||F·G - I||² + ridge·||G||²`` for ``G`` mapping mel →
    linear bins (``F`` is the (num_bins, num_mels) filterbank), in
    float64.  Rows of ``F`` outside every triangle (DC/Nyquist edges) are
    unrecoverable and invert to ~0.
    """
    fb = _mel_filter_np(num_mels, sample_rate, f_min, f_max, num_bins)
    a = fb.T @ fb + ridge * np.eye(num_mels)
    g = np.linalg.solve(a, fb.T)          # (num_mels, num_bins)
    return g


def create_inverse_mel_filter(num_mels: int = 128,
                              sample_rate: float = 22050,
                              f_min: float = 0.0,
                              f_max: Optional[float] = None,
                              num_bins: int = 1025,
                              ridge: float = 1e-8,
                              dtype=jnp.float32) -> jnp.ndarray:
    """Inverse-projection matrix ``(num_mels, num_bins)`` for
    :func:`mel_to_linear`; parameters mirror ``create_mel_filter``."""
    if f_max is None:
        f_max = sample_rate / 2.0
    g = _inverse_mel_np(int(num_mels), float(sample_rate), float(f_min),
                        float(f_max), int(num_bins), float(ridge))
    return jnp.asarray(g, dtype=dtype)


def mel_to_linear(mel_specgrams: jnp.ndarray,
                  inverse_filterbank: jnp.ndarray) -> jnp.ndarray:
    """Project ``(..., num_mels, time)`` mel magnitudes back to
    ``(..., num_bins, time)`` linear-frequency magnitudes (clipped ≥ 0).

    One einsum → one MXU GEMM, like the forward projection.
    """
    out = jnp.einsum("...mt,mf->...ft", mel_specgrams, inverse_filterbank,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(out, 0.0)
