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

__all__ = ["create_inverse_mel_filter", "create_inverse_bark_filter",
           "mel_to_linear", "mel_to_audio"]


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


@functools.lru_cache(maxsize=16)
def _inverse_bark_np(n_barks: int, sample_rate: float, f_min: float,
                     f_max: float, num_bins: int, bark_scale: str,
                     ridge: float) -> np.ndarray:
    """(n_barks, num_bins) ridge pseudo-inverse of the bark matrix —
    the same solve as :func:`_inverse_mel_np` on the bark bank."""
    from .filters import _bark_filter_np
    fb = _bark_filter_np(n_barks, sample_rate, f_min, f_max,
                         num_bins, bark_scale)
    a = fb.T @ fb + ridge * np.eye(n_barks)
    return np.linalg.solve(a, fb.T)


def create_inverse_bark_filter(n_barks: int = 128,
                               sample_rate: float = 22050,
                               f_min: float = 0.0,
                               f_max: Optional[float] = None,
                               num_bins: int = 1025,
                               bark_scale: str = "traunmuller",
                               ridge: float = 1e-8,
                               dtype=jnp.float32) -> jnp.ndarray:
    """Inverse-projection matrix ``(n_barks, num_bins)`` for
    :func:`mel_to_linear` (the projection GEMM is scale-agnostic);
    parameters mirror ``create_bark_filter``."""
    if f_max is None:
        f_max = sample_rate / 2.0
    g = _inverse_bark_np(int(n_barks), float(sample_rate),
                         float(f_min), float(f_max), int(num_bins),
                         str(bark_scale), float(ridge))
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


def mel_to_audio(mel_specgrams: jnp.ndarray,
                 num_mels: Optional[int] = None,
                 sample_rate: float = 22050,
                 f_min: float = 0.0,
                 f_max: Optional[float] = None,
                 fft_length: int = 2048,
                 hop_length: Optional[int] = None,
                 window="hann",
                 power: float = 2.0,
                 from_db: bool = False,
                 db_ref: float = 1.0,
                 n_iter: int = 32,
                 momentum: float = 0.99,
                 length: Optional[int] = None,
                 center: bool = True,
                 key: Optional[jax.Array] = None,
                 ridge: float = 1e-8,
                 method: str = "matmul") -> jnp.ndarray:
    """Invert a (log-)mel spectrogram ``(..., num_mels, time)`` all the
    way to a waveform: [dB→power] → mel→linear (ridge pseudo-inverse
    GEMM) → magnitude → Griffin-Lim phase reconstruction.

    The one-call composition of :func:`db_to_amplitude`,
    :func:`mel_to_linear`, and :func:`griffin_lim` — the vocoder-style
    serving path for mel features produced by ``Melspectrogram()`` or
    ``fused_melspectrogram`` (match ``power``/``from_db``/``db_ref`` to
    how the features were made; ``fused_melspectrogram(to_db=True)`` →
    ``power=2.0, from_db=True``).  ``method`` selects the Griffin-Lim
    engine ("matmul" default; "pallas" = the fused kernel where
    eligible).  Returns ``(..., samples)``.
    """
    from .db import db_to_amplitude
    from .griffinlim import griffin_lim

    mel = mel_specgrams.astype(jnp.float32)
    if from_db:
        mel = db_to_amplitude(mel, ref=db_ref, power=power)
    if num_mels is None:
        num_mels = mel.shape[-2]
    inv = create_inverse_mel_filter(num_mels, sample_rate, f_min, f_max,
                                    fft_length // 2 + 1, ridge)
    lin = mel_to_linear(mel, inv)
    if power != 1.0:
        mag = jnp.power(jnp.maximum(lin, 0.0), 1.0 / power)
    else:
        mag = lin
    if hop_length is None:
        hop_length = fft_length // 4
    return griffin_lim(mag, fft_length, hop_length, window=window,
                       n_iter=n_iter, momentum=momentum, length=length,
                       center=center, key=key, method=method)
