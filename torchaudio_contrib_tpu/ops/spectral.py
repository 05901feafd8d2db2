"""Spectral shape descriptors (rebuild-only addition).

Not in the reference (SURVEY §2), but standard companions to its
spectrogram stack (torchaudio later shipped ``spectral_centroid``;
librosa's feature module is the de-facto API shape).  All are
reductions over the frequency axis of a magnitude spectrogram —
TPU-first they are batched VPU reductions / one tiny GEMM, fully
jit/vmap/grad-compatible, with no data-dependent shapes.

Every function takes ``(..., freq, time)`` magnitudes (power=1, e.g.
``complex_norm(stft(x))``) plus the bin→Hz mapping implied by
``sample_rate``/``fft_length``, and returns ``(..., time)``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "spectral_centroid",
    "spectral_bandwidth",
    "spectral_rolloff",
    "spectral_flatness",
    "zero_crossing_rate",
]


def _bin_freqs(n_freqs: int, sample_rate: float) -> jnp.ndarray:
    """Center frequency of each onesided bin, ``(n_freqs,)`` Hz."""
    return jnp.linspace(0.0, sample_rate / 2.0, n_freqs)


def spectral_centroid(mag_specgrams: jnp.ndarray,
                      sample_rate: float) -> jnp.ndarray:
    """Magnitude-weighted mean frequency per frame, in Hz.

    Silent frames (all-zero magnitude) return 0 rather than NaN.
    """
    f = _bin_freqs(mag_specgrams.shape[-2], sample_rate)
    num = jnp.einsum("...ft,f->...t", mag_specgrams, f)
    den = jnp.sum(mag_specgrams, axis=-2)
    return num / jnp.maximum(den, 1e-20)


def spectral_bandwidth(mag_specgrams: jnp.ndarray,
                       sample_rate: float,
                       p: float = 2.0) -> jnp.ndarray:
    """p-th-order magnitude-weighted spread around the centroid, Hz."""
    f = _bin_freqs(mag_specgrams.shape[-2], sample_rate)
    cent = spectral_centroid(mag_specgrams, sample_rate)
    dev = jnp.abs(f[..., :, None] - cent[..., None, :]) ** p
    num = jnp.sum(mag_specgrams * dev, axis=-2)
    den = jnp.maximum(jnp.sum(mag_specgrams, axis=-2), 1e-20)
    return (num / den) ** (1.0 / p)


def spectral_rolloff(mag_specgrams: jnp.ndarray,
                     sample_rate: float,
                     roll_percent: float = 0.85) -> jnp.ndarray:
    """Frequency below which ``roll_percent`` of the energy lies, Hz.

    Computed from the cumulative energy along frequency with an
    argmax-over-mask — static shapes, no sorting, grad-safe (the
    result is piecewise constant, gradient 0, like librosa's).
    """
    energy = mag_specgrams
    cum = jnp.cumsum(energy, axis=-2)
    total = cum[..., -1:, :]
    thresh = roll_percent * total
    # first bin index where cumulative energy crosses the threshold
    reached = cum >= thresh
    idx = jnp.argmax(reached, axis=-2)           # (..., time)
    f = _bin_freqs(mag_specgrams.shape[-2], sample_rate)
    return f[idx]


def spectral_flatness(mag_specgrams: jnp.ndarray,
                      amin: float = 1e-10) -> jnp.ndarray:
    """Geometric mean / arithmetic mean of the power spectrum ∈ (0, 1]
    (1 = white noise, →0 = pure tone)."""
    p = jnp.maximum(mag_specgrams, amin) ** 2
    log_gm = jnp.mean(jnp.log(p), axis=-2)
    am = jnp.mean(p, axis=-2)
    # am >= amin**2 > 0 by construction — a magnitude-scale amin floor
    # here would crush quiet flat frames toward 0 (a 1e-8 white
    # spectrum must still read 1.0, librosa's behavior)
    return jnp.exp(log_gm) / am


def zero_crossing_rate(waveform: jnp.ndarray,
                       frame_length: int = 2048,
                       hop_length: Optional[int] = None,
                       center: bool = True) -> jnp.ndarray:
    """Fraction of sign changes per frame of ``waveform (..., T)`` →
    ``(..., n_frames)`` (``center=True`` pads ``frame_length // 2`` on
    both sides, librosa-style framing)."""
    from .stft import frame_signal, _pad_center

    if hop_length is None:
        hop_length = frame_length // 4
    x = waveform
    if center:
        x = _pad_center(x, frame_length // 2, "constant")
    crossings = (jnp.signbit(x[..., 1:]) !=
                 jnp.signbit(x[..., :-1])).astype(jnp.float32)
    crossings = jnp.pad(crossings, [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    frames = frame_signal(crossings, frame_length, hop_length)
    return jnp.mean(frames, axis=-1)
