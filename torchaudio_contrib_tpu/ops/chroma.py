"""Chroma (pitch-class) filterbank — rebuild-only addition.

Not in the reference (SURVEY §2 stops at the mel filterbank), but the
chroma projection is the other canonical ``filterbank @ spectrogram``
feature (librosa's ``chroma_stft`` is the de-facto API shape) and drops
straight into this library's existing GEMM path
(:func:`~.filters.apply_filterbank`) and ``ApplyFilterbank`` /
``Pipeline`` layers, trainable path included.

Construction follows the classic Gaussian-bump design (Ellis' chroma
toolbox, as adopted by librosa): each FFT bin's center frequency is
mapped to a fractional chroma coordinate on a ``bins_per_octave``
circle, each of the ``n_chroma`` pitch classes collects bins with a
Gaussian window in chroma distance (wrapped), and an optional Gaussian
octave weighting centered on ``ctroct`` tames the extreme octaves.
Built in float64 at trace time (same parity rationale as the mel bank)
and cached; a compile-time constant under ``jit``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["create_chroma_filter", "chroma_filterbank"]


@functools.lru_cache(maxsize=32)
def _chroma_filter_np(n_chroma: int, sample_rate: float, num_bins: int,
                      tuning: float, ctroct: float,
                      octwidth: Optional[float], base_c: bool,
                      norm: Optional[int]) -> np.ndarray:
    # onesided bins assumed: num_bins = n_fft//2 + 1
    freqs = np.linspace(0.0, sample_rate / 2.0, num_bins)[1:]  # skip DC

    a440 = 440.0 * 2.0 ** (tuning / n_chroma)
    # fractional chroma coordinate of each bin (octaves × n_chroma)
    frqbins = n_chroma * np.log2(freqs / (a440 / 16.0))
    frqbins = np.concatenate([[frqbins[0] - 1.5 * n_chroma], frqbins])

    binwidth = np.concatenate(
        [np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]])

    d = frqbins[None, :] - np.arange(n_chroma, dtype=np.float64)[:, None]
    half = n_chroma / 2.0
    d = np.remainder(d + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2.0 * d / binwidth[None, :]) ** 2)

    if norm is not None:
        col = np.linalg.norm(wts, ord=norm, axis=0)
        wts = wts / np.where(col > 0, col, 1.0)

    if octwidth is not None:
        wts *= np.exp(
            -0.5 * ((frqbins / n_chroma - ctroct) / octwidth) ** 2)[None, :]

    if base_c:
        # rotate so row 0 is pitch class C instead of A
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)

    return np.ascontiguousarray(wts.T)            # (num_bins, n_chroma)


def create_chroma_filter(n_chroma: int = 12, sample_rate: float = 22050,
                         num_bins: int = 1025, tuning: float = 0.0,
                         ctroct: float = 5.0,
                         octwidth: Optional[float] = 2.0,
                         base_c: bool = True,
                         norm: Optional[int] = 2,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Chroma filterbank ``(num_bins, n_chroma)`` for onesided specs.

    Apply with :func:`~.filters.apply_filterbank` on magnitude
    spectrograms (same contract as the mel bank), or via the
    ``ChromaFilterbank`` layer.  ``num_bins = fft_length//2 + 1``;
    ``base_c=True`` puts pitch class C in row 0 (librosa convention),
    otherwise A.  ``octwidth=None`` disables the octave weighting.
    """
    if num_bins < 2:
        raise ValueError(f"num_bins must be >= 2, got {num_bins}")
    fb = _chroma_filter_np(int(n_chroma), float(sample_rate),
                           int(num_bins), float(tuning), float(ctroct),
                           None if octwidth is None else float(octwidth),
                           bool(base_c), norm)
    return jnp.asarray(fb, dtype=dtype)


def chroma_filterbank(sample_rate: float, n_freqs: int, n_chroma: int,
                      *, tuning: float = 0.0, ctroct: float = 5.0,
                      octwidth: Optional[float] = 2.0,
                      norm: Optional[int] = 2,
                      base_c: bool = True) -> jnp.ndarray:
    """torchaudio-signature alias of :func:`create_chroma_filter`
    (``torchaudio.prototype.functional.chroma_filterbank`` argument
    order) → ``(n_freqs, n_chroma)``."""
    return create_chroma_filter(n_chroma, sample_rate, n_freqs,
                                tuning=tuning, ctroct=ctroct,
                                octwidth=octwidth, base_c=base_c,
                                norm=norm)
