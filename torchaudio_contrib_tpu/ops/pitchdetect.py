"""Pitch detection (NCCF): framed autocorrelation as batched FFTs.

Not in the reference (SURVEY §2) — torchaudio's
``detect_pitch_frequency`` is the de-facto API.  The classic algorithm
(Kaldi/torchaudio lineage): per ~30 ms frame, a normalized
cross-correlation over candidate lags picks the fundamental period;
a short median filter smooths octave errors.

TPU-first: the lag correlation for ALL lags of ALL frames is computed
as one batched rFFT product (cross-correlation theorem) instead of a
per-lag loop — ``O(F·L)`` work collapses into three batched FFTs the
XLA TPU backend runs on the VPU/MXU; sliding lag energies come from one
cumulative sum.  Static shapes throughout (the lag search range is a
compile-time constant), so the whole detector jits/vmaps cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .stft import frame_signal

__all__ = ["detect_pitch_frequency"]


def detect_pitch_frequency(waveform: jnp.ndarray, sample_rate: float,
                           frame_time: float = 0.01,
                           win_length: int = 30,
                           freq_low: float = 85.0,
                           freq_high: float = 3400.0) -> jnp.ndarray:
    """Per-frame fundamental frequency estimate, ``(..., n_frames)`` Hz.

    ``frame_time`` is the hop in seconds; ``win_length`` the number of
    hops per analysis window (torchaudio-compatible semantics: a 30 ×
    10 ms ≈ 300 ms window by default, median-smoothed).  The lag search
    spans ``sample_rate/freq_high .. sample_rate/freq_low``.
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    lead = waveform.shape[:-1]
    t = waveform.shape[-1]
    x = waveform.reshape((-1, t))

    hop = max(int(sample_rate * frame_time), 1)
    flen = hop * win_length                       # analysis window
    lag_min = max(int(sample_rate / freq_high), 1)
    lag_max = int(np.ceil(sample_rate / freq_low))
    ext = flen + lag_max                          # window + lag tail
    if t < ext:
        raise ValueError(
            f"waveform too short for pitch detection: {t} samples < "
            f"window+max_lag = {ext} (frame_time={frame_time}, "
            f"win_length={win_length}, freq_low={freq_low})")

    n_frames = (t - ext) // hop + 1
    u = frame_signal(x, ext, hop)                 # (B, n_frames, ext)
    w = u[..., :flen]                             # reference segment

    # all-lag correlation a[l] = Σ_t w[t]·u[t+l] via the correlation
    # theorem — one zero-padded rFFT product instead of a lag loop
    nfft = 1 << int(np.ceil(np.log2(ext + flen)))
    U = jnp.fft.rfft(u, n=nfft, axis=-1)
    W = jnp.fft.rfft(w, n=nfft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(W) * U, n=nfft,
                         axis=-1)[..., :lag_max + 1]

    # sliding energy of u over [l, l+flen) for each lag, via cumsum
    c2 = jnp.cumsum(u * u, axis=-1)
    zero = jnp.zeros(c2.shape[:-1] + (1,), c2.dtype)
    c2 = jnp.concatenate([zero, c2], axis=-1)     # (B, F, ext+1)
    e_u = c2[..., flen:flen + lag_max + 1] - c2[..., :lag_max + 1]
    e_w = e_u[..., :1]                            # lag-0 energy of w

    nccf = corr / jnp.sqrt(jnp.maximum(e_w * e_u, 1e-12))
    # restrict to the valid lag band and pick the best period
    lags = jnp.arange(lag_max + 1)
    band = (lags >= lag_min) & (lags <= lag_max)
    nccf = jnp.where(band, nccf, -jnp.inf)
    best = jnp.argmax(nccf, axis=-1)              # (B, n_frames)
    freq = sample_rate / best.astype(jnp.float32)

    # median smoothing over a short frame window (odd width)
    med_w = 5 if n_frames >= 5 else (n_frames | 1)
    half = med_w // 2
    padded = jnp.pad(freq, ((0, 0), (half, half)), mode="edge")
    stack = jnp.stack([padded[:, k:k + n_frames] for k in range(med_w)],
                      axis=-1)
    freq = jnp.median(stack, axis=-1)
    return freq.reshape(lead + (n_frames,))
