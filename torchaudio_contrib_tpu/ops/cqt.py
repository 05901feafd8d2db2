"""Constant-Q transform via spectral-kernel GEMM — rebuild-only addition.

Not in the reference (SURVEY §2), but the CQT is the standard
log-frequency companion to its STFT stack (librosa's ``cqt`` family is
the de-facto API).  TPU-first this is the classic Brown–Puckette
efficient CQT: the constant-Q filters are built ONCE in the frequency
domain (float64, at trace time) and the transform is a single
``kernel @ stft`` GEMM on the MXU — no per-bin variable-length
convolutions, no dynamic shapes, fully differentiable.

Construction: bin ``k`` has center frequency
``f_min · 2^(k / bins_per_octave)`` and a Hann-windowed complex
exponential of length ``Q·sr/f_k`` (``Q = filter_scale /
(2^(1/bins_per_octave) − 1)``), zero-padded (centered) to ``fft_length``
and transformed with an rFFT.  The resulting ``(n_bins, freq)`` complex
kernel is applied to the onesided STFT; magnitudes follow the
``complex_norm`` convention.

The one approximation vs a multi-resolution CQT: every filter shares
one ``fft_length``/``hop`` analysis grid, so ``fft_length`` must cover
the LONGEST (lowest-frequency) filter — :func:`cqt` validates this and
tells the user the minimum.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .stft import stft as _stft
from .complexops import complex_norm

__all__ = ["cqt_frequencies", "create_cqt_kernel", "cqt", "pseudo_cqt"]


def cqt_frequencies(n_bins: int, f_min: float,
                    bins_per_octave: int = 12) -> np.ndarray:
    """Center frequencies ``f_min · 2^(k/bins_per_octave)``, ``(n_bins,)``."""
    return f_min * 2.0 ** (np.arange(n_bins) / bins_per_octave)


@functools.lru_cache(maxsize=8)
def _cqt_kernel_np(n_bins: int, f_min: float, bins_per_octave: int,
                   sample_rate: float, fft_length: int,
                   filter_scale: float):
    freqs = cqt_frequencies(n_bins, f_min, bins_per_octave)
    Q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    lengths = np.ceil(Q * sample_rate / freqs).astype(int)
    if lengths[0] > fft_length:
        raise ValueError(
            f"fft_length={fft_length} is shorter than the lowest-bin "
            f"constant-Q filter ({lengths[0]} samples at "
            f"{freqs[0]:.1f} Hz); use fft_length >= {int(lengths[0])} "
            f"or raise f_min")
    if freqs[-1] > sample_rate / 2.0:
        raise ValueError(
            f"top CQT bin ({freqs[-1]:.1f} Hz) exceeds Nyquist "
            f"({sample_rate / 2.0:.1f} Hz); lower n_bins or f_min")

    F = fft_length // 2 + 1
    kt = np.zeros((n_bins, fft_length), np.complex128)
    for k, (fk, lk) in enumerate(zip(freqs, lengths)):
        n = np.arange(lk, dtype=np.float64) - (lk - 1) / 2.0
        win = np.hanning(lk)
        win = win / win.sum()                     # unit-DC-gain window
        ph = 2.0 * np.pi * fk / sample_rate * n
        start = (fft_length - lk) // 2            # center in the frame
        kt[k, start:start + lk] = win * np.exp(1j * ph)
    # full-spectrum kernel, conjugated for the analysis inner product
    kc = np.fft.fft(kt, axis=-1).conj() / fft_length
    # fold onto the onesided grid of a REAL-signal STFT (X Hermitian):
    #   Σ_f X[f]·kc[f] = Σ_{onesided} X·k1 + conj(X)·k2
    # with k1 the positive-frequency slab and k2 the reflected
    # negative-frequency slab (zero at DC and Nyquist, counted once)
    k1 = kc[:, :F]
    k2 = np.zeros_like(k1)
    k2[:, 1:F - 1] = kc[:, fft_length - np.arange(1, F - 1)]  # kc[N-f]
    return (np.ascontiguousarray(k1.real), np.ascontiguousarray(k1.imag),
            np.ascontiguousarray(k2.real), np.ascontiguousarray(k2.imag),
            lengths)


def create_cqt_kernel(n_bins: int = 84, f_min: float = 32.703,
                      bins_per_octave: int = 12,
                      sample_rate: float = 22050,
                      fft_length: int = 2048,
                      filter_scale: float = 1.0,
                      dtype=jnp.float32):
    """Frequency-domain CQT kernel ``(re, im)`` each ``(n_bins, freq)``.

    ``f_min`` defaults to C1.  Returns ``(k1, k2)`` complex arrays: the
    positive-frequency slab and the folded negative-frequency slab —
    apply to an onesided complex STFT ``X`` of a real signal as
    ``k1 @ X + k2 @ conj(X)`` (:func:`cqt` does exactly that).
    """
    k1r, k1i, k2r, k2i, _ = _cqt_kernel_np(
        int(n_bins), float(f_min), int(bins_per_octave),
        float(sample_rate), int(fft_length), float(filter_scale))
    rdt = jnp.dtype(dtype)
    return (jax.lax.complex(jnp.asarray(k1r, rdt), jnp.asarray(k1i, rdt)),
            jax.lax.complex(jnp.asarray(k2r, rdt), jnp.asarray(k2i, rdt)))


def cqt(waveform: jnp.ndarray, sample_rate: float = 22050,
        hop_length: int = 512, n_bins: int = 84, f_min: float = 32.703,
        bins_per_octave: int = 12, fft_length: Optional[int] = None,
        filter_scale: float = 1.0, power: float = 1.0) -> jnp.ndarray:
    """Constant-Q magnitude spectrogram ``(..., n_bins, time)``.

    One STFT (onesided, centered) + one complex GEMM with the cached
    constant-Q spectral kernel.  ``fft_length`` defaults to the smallest
    power of two covering the lowest-frequency filter.  ``power``
    follows :func:`~.complexops.complex_norm` (1 = magnitude).
    """
    freqs = cqt_frequencies(n_bins, f_min, bins_per_octave)
    Q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    min_len = int(np.ceil(Q * sample_rate / freqs[0]))
    if fft_length is None:
        fft_length = 1 << (min_len - 1).bit_length()
    k1, k2 = create_cqt_kernel(n_bins, f_min, bins_per_octave,
                               sample_rate, fft_length, filter_scale)
    # rectangular analysis window: each CQT filter embeds its OWN
    # (hann) window, so the frames must enter the FFT unweighted
    spec = _stft(waveform, fft_length, hop_length,
                 window="rectangular")               # (..., F, T) complex
    out = (jnp.einsum("bf,...ft->...bt", k1, spec)
           + jnp.einsum("bf,...ft->...bt", k2, jnp.conj(spec)))
    return complex_norm(out, power=power)


def pseudo_cqt(mag_specgrams: jnp.ndarray, sample_rate: float = 22050,
               n_bins: int = 84, f_min: float = 32.703,
               bins_per_octave: int = 12,
               filter_scale: float = 1.0) -> jnp.ndarray:
    """Magnitude-domain CQT approximation: ``|kernel| @ |spec|``.

    Takes an EXISTING onesided magnitude spectrogram ``(..., freq,
    time)`` (power=1) — useful when the STFT is already computed (e.g.
    inside a mel pipeline) and phase is gone; cheaper, less exact than
    :func:`cqt`.
    """
    F = mag_specgrams.shape[-2]
    fft_length = 2 * (F - 1)
    k1r, k1i, _, _, _ = _cqt_kernel_np(
        int(n_bins), float(f_min), int(bins_per_octave),
        float(sample_rate), int(fft_length), float(filter_scale))
    kmag = jnp.asarray(np.hypot(k1r, k1i), mag_specgrams.dtype)
    return jnp.einsum("bf,...ft->...bt", kmag, mag_specgrams)
