"""Classic speech-frontend companions: delta features, pre/de-emphasis.

Not in the reference (which stops at the mel/dB layer) — these are the
standard ops users bolt onto an MFCC/log-mel frontend, built TPU-first:

* :func:`compute_deltas` — the regression-formula delta is a small FIR
  along time; implemented as one `lax.conv_general_dilated` over the
  flattened leading dims (batched MXU/VPU work, no Python loop).
* :func:`preemphasis` — first-order FIR ``y[n] = x[n] − a·x[n−1]``,
  a shift-and-subtract (two fused elementwise ops).
* :func:`deemphasis` — the inverse IIR ``y[n] = x[n] + a·y[n−1]``.
  A sequential recurrence, but a first-order *linear* one: on TPU it
  runs as a `jax.lax.associative_scan` over ``(A, B)`` pairs composed
  with ``(A₂A₁, A₂B₁+B₂)`` — O(log T) depth instead of a T-step loop
  (the same trick as the phase vocoder's phase accumulation).

All differentiable; shapes follow the library convention (time last).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compute_deltas", "preemphasis", "deemphasis"]


def compute_deltas(specgram: jnp.ndarray,
                   win_length: int = 5,
                   mode: str = "replicate") -> jnp.ndarray:
    """Delta coefficients of ``specgram (..., freq, time)``.

    Standard regression formula with half-window ``n = (win_length-1)//2``:
    ``d[t] = Σ_{k=1..n} k·(x[t+k] − x[t−k]) / (2·Σ k²)`` — the usual
    companion to :func:`~torchaudio_contrib_tpu.ops.mfcc` (apply twice
    for delta-deltas).  ``win_length`` must be odd and ≥ 3; edges use
    ``mode`` padding (``"replicate"`` matches the common convention).
    """
    if win_length < 3 or win_length % 2 == 0:
        raise ValueError("win_length must be odd and >= 3, got "
                         f"{win_length}")
    # integer inputs would truncate the fractional kernel to zeros
    specgram = specgram.astype(jnp.promote_types(specgram.dtype,
                                                 jnp.float32))
    n = (win_length - 1) // 2
    denom = 2.0 * sum(k * k for k in range(1, n + 1))
    kernel = jnp.asarray(
        [k / denom for k in range(-n, n + 1)], specgram.dtype)

    lead = specgram.shape[:-1]
    t = specgram.shape[-1]
    x = specgram.reshape((-1, 1, t))            # (N, C=1, T)
    pad_mode = {"replicate": "edge", "edge": "edge",
                "reflect": "reflect", "zeros": "constant",
                "constant": "constant"}.get(mode)
    if pad_mode is None:
        raise ValueError(f"unsupported mode {mode!r}")
    x = jnp.pad(x, ((0, 0), (0, 0), (n, n)), mode=pad_mode)
    out = jax.lax.conv_general_dilated(
        x, kernel.reshape(1, 1, win_length),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCT", "OIT", "NCT"))
    return out.reshape(lead + (t,))


def preemphasis(waveform: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """``y[n] = x[n] − coeff·x[n−1]`` (``y[0] = x[0]``), time last."""
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    prev = jnp.pad(waveform[..., :-1],
                   [(0, 0)] * (waveform.ndim - 1) + [(1, 0)])
    return waveform - coeff * prev


def deemphasis(waveform: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """Exact inverse of :func:`preemphasis`: ``y[n] = x[n] + coeff·y[n−1]``.

    First-order linear recurrence evaluated as an associative scan
    (log-depth on TPU, one compiled program) rather than a sequential
    ``lax.scan`` over 10⁵+ samples.
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    a = jnp.full(waveform.shape, coeff, waveform.dtype)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, waveform), axis=-1)
    return y
