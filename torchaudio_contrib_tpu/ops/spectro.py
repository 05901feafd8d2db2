"""Plain functional ``spectrogram`` / ``melspectrogram``.

The reference exposes these compositions as layer factories
(``Spectrogram()``/``Melspectrogram()`` → pipelines,
[ref: layers.py — UNVERIFIED]); BASELINE.json's north-star also names
lowercase functional forms, so the one-call versions live here — the
same ``stft → complex_norm → (mel GEMM)`` chain the pipelines run
(``tests/test_spectro.py`` pins functional ≡ factory pipeline).  For
the single-kernel TPU fast path use
:func:`..fused.fused_melspectrogram`.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .stft import stft, istft, _resolve_window
from .complexops import complex_norm
from .filters import create_mel_filter, apply_filterbank

__all__ = ["spectrogram", "melspectrogram", "inverse_spectrogram"]


def inverse_spectrogram(spec: jnp.ndarray,
                        length: Optional[int] = None,
                        pad: int = 0,
                        window=None,
                        n_fft: int = 400,
                        hop_length: Optional[int] = None,
                        win_length: Optional[int] = None,
                        normalized=False,
                        center: bool = True,
                        pad_mode: str = "reflect",
                        onesided: bool = True) -> jnp.ndarray:
    """torchaudio-signature ``functional.inverse_spectrogram``: the
    least-squares inverse of a COMPLEX ``spectrogram(..., power=None)``
    (an adapter over :func:`istft` with torchaudio's ``pad`` and
    ``normalized`` conventions; ``pad_mode`` is accepted for signature
    symmetry — it only affects the forward transform)."""
    if not jnp.iscomplexobj(spec):
        raise ValueError(
            "inverse_spectrogram expects a complex spectrogram "
            "(forward power=None); magnitude spectrograms are not "
            "invertible — use griffin_lim")
    if win_length is None:
        win_length = n_fft
    if normalized:
        w = _resolve_window(window, win_length, n_fft)
        if normalized in (True, "window"):
            spec = spec * float((w ** 2).sum()) ** 0.5
        elif normalized == "frame_length":
            spec = spec * float(win_length) ** 0.5
        else:
            raise ValueError(
                f"normalized must be bool|'window'|'frame_length', "
                f"got {normalized!r}")
    out = istft(spec, hop_length=hop_length, win_length=win_length,
                window=window, center=center, normalized=False,
                onesided=onesided,
                length=None if length is None else length + 2 * pad,
                fft_length=n_fft)
    if pad > 0:
        out = out[..., pad:out.shape[-1] - pad]
    return out


def spectrogram(waveform: jnp.ndarray,
                fft_length: int = 2048,
                hop_length: Optional[int] = None,
                win_length: Optional[int] = None,
                window=None,
                center: bool = True,
                pad_mode: str = "reflect",
                normalized: bool = False,
                onesided: bool = True,
                power: float = 1.0) -> jnp.ndarray:
    """Magnitude spectrogram ``(..., freq, time)``:
    ``complex_norm(stft(waveform, ...), power)``."""
    spec = stft(waveform, fft_length, hop_length, win_length,
                window=window, center=center, pad_mode=pad_mode,
                normalized=normalized, onesided=onesided)
    return complex_norm(spec, power)


def melspectrogram(waveform: jnp.ndarray,
                   num_mels: int = 128,
                   sample_rate: float = 22050,
                   f_min: float = 0.0,
                   f_max: Optional[float] = None,
                   filterbank: Optional[jnp.ndarray] = None,
                   mel_scale: str = "htk",
                   norm: Optional[str] = None,
                   power: float = 2.0,
                   **spectrogram_kwargs) -> jnp.ndarray:
    """Mel spectrogram ``(..., num_mels, time)``.

    ``power`` defaults to 2 (the reference's Melspectrogram default);
    pass an explicit ``filterbank (num_bins, num_mels)`` matrix to
    swap scales.  Remaining kwargs flow to :func:`spectrogram`
    (``onesided=False`` is rejected — the mel matrix is one-sided).
    """
    if not spectrogram_kwargs.get("onesided", True):
        raise ValueError("melspectrogram requires onesided=True")
    mag = spectrogram(waveform, power=power, **spectrogram_kwargs)
    if filterbank is None:
        filterbank = create_mel_filter(
            num_mels, sample_rate, f_min, f_max, mag.shape[-2],
            mel_scale=mel_scale, norm=norm)
    elif filterbank.shape[0] != mag.shape[-2]:
        raise ValueError(
            f"filterbank rows {filterbank.shape[0]} != spectrogram "
            f"bins {mag.shape[-2]}")
    return apply_filterbank(mag, filterbank)
