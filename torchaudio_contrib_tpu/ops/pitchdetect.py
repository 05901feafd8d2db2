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
    """Per-frame fundamental frequency estimate, ``(..., n_out)`` Hz.

    torchaudio's parameter semantics: the NCCF frame is ``frame_time``
    seconds long (frames tile the clip at that stride, ceil count,
    zero tail padding) and ``win_length`` is the MEDIAN-smoothing
    window in frames (front-replicated ``(win_length-1)//2`` padding,
    so ``n_out = ceil(T/frame) - win_length + 1 + (win_length-1)//2``).
    The lag search spans ``sample_rate/freq_high ..
    sample_rate/freq_low``.
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    lead = waveform.shape[:-1]
    t = waveform.shape[-1]
    x = waveform.reshape((-1, t))

    fs = max(int(np.ceil(sample_rate * frame_time)), 1)
    lag_min = max(int(np.ceil(sample_rate / freq_high)), 1)
    lag_max = int(np.ceil(sample_rate / freq_low))
    n_frames = int(np.ceil(t / fs))
    half = (win_length - 1) // 2
    n_out = n_frames - win_length + 1 + half
    if n_out < 1:
        raise ValueError(
            f"waveform too short for pitch detection: {t} samples "
            f"give {n_frames} frames of {fs}; the {win_length}-frame "
            f"median window needs at least {win_length - half}")
    # zero tail padding so every ceil-counted frame has its lag reach
    x = jnp.pad(x, ((0, 0), (0, lag_max + n_frames * fs - t)))

    ext = fs + lag_max                            # frame + lag tail
    u = frame_signal(x, ext, fs)[:, :n_frames]    # (B, n_frames, ext)
    w = u[..., :fs]                               # reference segment

    # all-lag correlation a[l] = Σ_t w[t]·u[t+l] via the correlation
    # theorem — one zero-padded rFFT product instead of a lag loop
    nfft = 1 << int(np.ceil(np.log2(ext + fs)))
    U = jnp.fft.rfft(u, n=nfft, axis=-1)
    W = jnp.fft.rfft(w, n=nfft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(W) * U, n=nfft,
                         axis=-1)[..., :lag_max + 1]

    # sliding energy of u over [l, l+fs) for each lag, via cumsum
    c2 = jnp.cumsum(u * u, axis=-1)
    zero = jnp.zeros(c2.shape[:-1] + (1,), c2.dtype)
    c2 = jnp.concatenate([zero, c2], axis=-1)     # (B, F, ext+1)
    e_u = c2[..., fs:fs + lag_max + 1] - c2[..., :lag_max + 1]
    e_w = e_u[..., :1]                            # lag-0 energy of w

    nccf = corr / jnp.sqrt(jnp.maximum(e_w * e_u, 1e-12))
    # restrict to the valid lag band and pick the best period
    lags = jnp.arange(lag_max + 1)
    band = (lags >= lag_min) & (lags <= lag_max)
    nccf = jnp.where(band, nccf, -jnp.inf)
    best = jnp.argmax(nccf, axis=-1)              # (B, n_frames)
    freq = sample_rate / best.astype(jnp.float32)

    # median smoothing: torchaudio's front-replicated padding and
    # win_length-wide windows (output shorter than n_frames)
    padded = jnp.pad(freq, ((0, 0), (half, 0)), mode="edge")
    stack = jnp.stack([padded[:, k:k + n_out]
                       for k in range(win_length)], axis=-1)
    freq = jnp.median(stack, axis=-1)
    return freq.reshape(lead + (n_out,))
