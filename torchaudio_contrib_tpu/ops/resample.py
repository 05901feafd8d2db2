"""Sample-rate conversion (rebuild-only addition).

Not in the reference (SURVEY §2), but every corpus pipeline needs it
(AudioSet-style shards mix rates; BASELINE config 5).  Implemented the
TPU way: a rational-ratio polyphase windowed-sinc FIR expressed as ONE
strided convolution — ``lax.conv_general_dilated`` with input dilation
``p`` (zero-stuffing upsample) and stride ``q``, so XLA lowers the whole
resampler onto the MXU.  Filter design happens once in float64 NumPy.

Matches ``scipy.signal.resample_poly`` semantics for the Kaiser-windowed
sinc (parity-tested against scipy, which is available in this
environment), and is differentiable like everything else here.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["resample"]


@functools.lru_cache(maxsize=32)
def _design_kernel(p: int, q: int, zeros: int, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc low-pass for p/q resampling (float64).

    Cutoff at ``min(1/p, 1/q)`` of the upsampled Nyquist; gain ``p`` to
    preserve amplitude after zero-stuffing.  Length is odd so the filter
    is symmetric about an integer tap (zero phase after delay trim).
    """
    cutoff = min(1.0 / p, 1.0 / q)
    half = zeros * max(p, q)
    n = np.arange(-half, half + 1, dtype=np.float64)
    taps = cutoff * np.sinc(cutoff * n)
    taps *= np.kaiser(2 * half + 1, beta)
    # overall gain p: zero-stuffing spreads unit DC gain over p branches
    taps *= p / np.sum(taps)
    return taps


def resample(waveform: jnp.ndarray, orig_freq: int, new_freq: int,
             zeros: int = 24, beta: float = 14.769656459379492,
             precision=None) -> jnp.ndarray:
    """Resample ``waveform (..., time)`` from ``orig_freq`` to ``new_freq``.

    Output length is ``ceil(time · new/orig)``.  ``zeros`` controls filter
    sharpness (sinc zero crossings per side); the default Kaiser beta
    gives ~140 dB stopband.  One fused convolution on the MXU; identity
    when the rates match.
    """
    if orig_freq <= 0 or new_freq <= 0:
        raise ValueError("sample rates must be positive")
    if orig_freq == new_freq:
        return waveform
    g = math.gcd(int(orig_freq), int(new_freq))
    p = new_freq // g   # upsample factor
    q = orig_freq // g  # downsample factor

    taps64 = _design_kernel(p, q, zeros, beta)
    half = (taps64.shape[0] - 1) // 2

    lead = waveform.shape[:-1]
    t = waveform.shape[-1]
    x = waveform.reshape((-1, 1, t)).astype(jnp.float32)

    # upsampled stream has length p·t (lhs_dilation inserts p-1 zeros);
    # pad so output sample k corresponds to upsampled index k·q, with the
    # filter centered (delay = half)
    out_len = -(-t * p // q)
    kern = jnp.asarray(taps64[::-1].copy(), jnp.float32)[None, None, :]
    # right pad generously so the strided conv yields >= out_len samples
    # for every p/q (the dilated stream ends p-1 zeros short of p·t)
    y = jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(q,),
        padding=[(half, half + p + q)],
        lhs_dilation=(p,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
        preferred_element_type=jnp.float32)
    y = y[..., 0, :out_len]
    return y.reshape(lead + (out_len,))
