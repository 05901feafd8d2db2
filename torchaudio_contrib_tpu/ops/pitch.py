"""Pitch shifting (rebuild-only addition).

Composes two ops the library already has — phase-vocoder time stretch
and polyphase resampling — into the classic pitch shifter: stretch time
by ``2^(n/12)`` at constant pitch, then resample back to the original
length, which shifts pitch by ``n`` semitones at constant duration.
Everything stays on the MXU/VPU and differentiable.
"""
from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp

from .stft import stft as _stft, istft as _istft
from .phase_vocoder import phase_vocoder, compute_phase_advance
from .resample import resample as _resample

__all__ = ["pitch_shift"]


def pitch_shift(waveform: jnp.ndarray,
                sample_rate: int,
                n_steps: float,
                bins_per_octave: int = 12,
                fft_length: int = 512,
                hop_length: int = 128,
                window="hann") -> jnp.ndarray:
    """Shift ``waveform (..., time)`` by ``n_steps`` semitones (can be
    fractional/negative), preserving duration.

    The shift ratio is approximated by a small rational so the resample
    stays a compact polyphase filter; output has the input's length.
    """
    if n_steps == 0:
        return waveform
    t = waveform.shape[-1]
    ratio = 2.0 ** (n_steps / bins_per_octave)
    # rational approximation keeps the polyphase filter small
    frac = Fraction(ratio).limit_denominator(64)
    p, q = frac.numerator, frac.denominator

    # 1) time-stretch by 1/ratio (constant pitch): rate q/p < 1 for an
    #    upward shift, lengthening duration to T·p/q
    spec = _stft(waveform, fft_length, hop_length, window=window)
    adv = compute_phase_advance(spec.shape[-2], hop_length, fft_length)
    stretched = phase_vocoder(spec, float(q) / p, adv)
    y = _istft(stretched, hop_length, window=window,
               fft_length=fft_length)
    # 2) resample by q/p: restores duration T, scales pitch by p/q
    z = _resample(y, orig_freq=p, new_freq=q)
    if z.shape[-1] >= t:
        return z[..., :t]
    pad = [(0, 0)] * (z.ndim - 1) + [(0, t - z.shape[-1])]
    return jnp.pad(z, pad)
