"""MFCC: DCT-II projection of log-mel features (rebuild-only addition).

Not in the reference (SURVEY §2), but the most common consumer of its
mel pipeline; included so reference users who fed Melspectrogram into
their own DCT find it here.  TPU-first: the orthonormal DCT-II basis is
built once in float64 and applied as one MXU GEMM over the mel axis —
no FFT-based DCT needed at these sizes.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .stft import stft as _stft
from .complexops import complex_norm
from .filters import create_mel_filter, apply_filterbank
from .db import amplitude_to_db

__all__ = ["create_dct", "mfcc"]


@functools.lru_cache(maxsize=16)
def _dct_np(n_mfcc: int, n_input: int, norm: Optional[str]) -> np.ndarray:
    """(n_input, n_mfcc) DCT-II matrix, optionally orthonormal."""
    n = np.arange(n_input, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    basis = 2.0 * np.cos(np.pi / n_input * (n[:, None] + 0.5) * k[None, :])
    if norm == "ortho":
        basis[:, 0] *= 1.0 / np.sqrt(4.0 * n_input)
        basis[:, 1:] *= 1.0 / np.sqrt(2.0 * n_input)
    elif norm is not None:
        raise ValueError(f"unknown norm {norm!r}")
    return basis


def create_dct(n_mfcc: int, n_input: int, norm: Optional[str] = "ortho",
               dtype=jnp.float32) -> jnp.ndarray:
    """DCT-II basis ``(n_input, n_mfcc)`` (matches
    ``scipy.fft.dct(type=2)`` up to the same ``norm`` convention)."""
    return jnp.asarray(_dct_np(int(n_mfcc), int(n_input), norm), dtype)


def mfcc(waveform: jnp.ndarray,
         sample_rate: float = 22050,
         n_mfcc: int = 20,
         num_mels: int = 128,
         fft_length: int = 2048,
         hop_length: int = 512,
         f_min: float = 0.0,
         f_max: Optional[float] = None,
         window="hann",
         norm: Optional[str] = "ortho",
         top_db: Optional[float] = None,
         center: bool = True,
         use_fused: bool = False,
         precision: str = "auto") -> jnp.ndarray:
    """MFCCs of ``waveform (..., time)`` → ``(..., n_mfcc, frames)``.

    Chain: STFT → power → mel → dB(power) → DCT-II.  Every stage is the
    library's own op, so the whole thing jits to fused XLA and is
    differentiable end-to-end.

    ``use_fused=True`` computes the log-mel through the single-kernel
    Pallas path (~3× faster on TPU — the trailing DCT is one extra GEMM
    over the already-tiny mel output, measured free under device-loop
    timing).  ``precision`` selects the kernel tier (``"auto"`` /
    ``"split6"`` / ``"split3"`` / ``"fast"`` as in
    :func:`~torchaudio_contrib_tpu.ops.fused_melspectrogram`; at
    config 2: split3 11.2 ms, fast 6.0 ms — 6.9 M frames/s).
    ``top_db`` is incompatible with the fused kernel (the per-example
    max reduction cannot live inside the tiled program) — requesting
    both raises rather than silently changing the execution engine.
    """
    if precision != "auto" and not use_fused:
        raise ValueError("precision selects the fused-kernel mode; "
                         "pass use_fused=True with it")
    if use_fused and top_db is not None:
        raise ValueError(
            "use_fused=True cannot honor top_db (a per-example max "
            "reduction cannot run inside the tiled kernel); drop "
            "top_db or use use_fused=False")
    fb = create_mel_filter(num_mels, sample_rate, f_min, f_max,
                           fft_length // 2 + 1)
    if use_fused:
        from .fused import fused_melspectrogram
        mel_db = fused_melspectrogram(waveform, fb, fft_length,
                                      hop_length, window, 2.0, True,
                                      precision=precision,
                                      center=center)
    else:
        spec = _stft(waveform, fft_length, hop_length, window=window,
                     center=center)
        p = complex_norm(spec, 2.0)
        mel = apply_filterbank(p, fb)
        mel_db = amplitude_to_db(mel, power=2.0, top_db=top_db)
    dct = create_dct(n_mfcc, num_mels, norm)
    return jnp.einsum("...mt,mk->...kt", mel_db, dct,
                      precision=jax.lax.Precision.HIGHEST)


def lfcc(waveform: jnp.ndarray,
         sample_rate: float = 22050,
         n_lfcc: int = 20,
         n_filter: int = 128,
         fft_length: int = 2048,
         hop_length: int = 512,
         f_min: float = 0.0,
         f_max: Optional[float] = None,
         window="hann",
         norm: Optional[str] = "ortho",
         top_db: Optional[float] = None,
         center: bool = True,
         use_fused: bool = False,
         precision: str = "auto") -> jnp.ndarray:
    """Linear-frequency cepstral coefficients ``(..., n_lfcc, frames)``.

    Identical chain to :func:`mfcc` with the triangular filterbank's
    corners spaced linearly in Hz (:func:`~.filters
    .create_linear_filter`) instead of on the mel scale — the
    torchaudio ``LFCC`` front end.  All :func:`mfcc` engine rules apply
    (``use_fused`` runs the same single-kernel path — the Pallas kernel
    takes an arbitrary filterbank matrix; ``top_db`` is incompatible
    with it and raises).
    """
    from .filters import create_linear_filter
    if precision != "auto" and not use_fused:
        raise ValueError("precision selects the fused-kernel mode; "
                         "pass use_fused=True with it")
    if use_fused and top_db is not None:
        raise ValueError(
            "use_fused=True cannot honor top_db (a per-example max "
            "reduction cannot run inside the tiled kernel); drop "
            "top_db or use use_fused=False")
    fb = create_linear_filter(n_filter, sample_rate, f_min, f_max,
                              fft_length // 2 + 1)
    if use_fused:
        from .fused import fused_melspectrogram
        lin_db = fused_melspectrogram(waveform, fb, fft_length,
                                      hop_length, window, 2.0, True,
                                      precision=precision,
                                      center=center)
    else:
        spec = _stft(waveform, fft_length, hop_length, window=window,
                     center=center)
        p = complex_norm(spec, 2.0)
        lin = apply_filterbank(p, fb)
        lin_db = amplitude_to_db(lin, power=2.0, top_db=top_db)
    dct = create_dct(n_lfcc, n_filter, norm)
    return jnp.einsum("...mt,mk->...kt", lin_db, dct,
                      precision=jax.lax.Precision.HIGHEST)
