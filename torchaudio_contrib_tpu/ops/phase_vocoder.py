"""Phase vocoder — time-stretch a complex spectrogram without pitch shift.

Capability parity with [ref: torchaudio_contrib/functional.py::phase_vocoder
— UNVERIFIED; call stack per SURVEY.md §3e].

TPU-first design
----------------
* The fractional time-resample is a constant gather (indices are NumPy,
  computed from the static ``rate``), so nothing is data-dependent and the
  whole op jits to one fused program.
* The phase accumulation — the only sequentially-dependent op in the whole
  library — is ``jnp.cumsum``, which XLA lowers to a logarithmic-depth
  associative scan on TPU rather than a serial loop.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["phase_vocoder", "compute_phase_advance"]


def compute_phase_advance(n_freqs: int, hop_length: int,
                          fft_length: int | None = None) -> jnp.ndarray:
    """Expected per-frame phase advance per one-sided bin: ``hop·2πf/N``.

    Shape ``(n_freqs, 1)`` to broadcast over ``(..., freq, time)``.
    """
    if fft_length is None:
        fft_length = 2 * (n_freqs - 1)
    adv = (2.0 * np.pi * hop_length
           * np.arange(n_freqs, dtype=np.float64) / fft_length)
    return jnp.asarray(adv[:, None], dtype=jnp.float32)


def phase_vocoder(complex_specgrams: jnp.ndarray, rate: float,
                  phase_advance: jnp.ndarray) -> jnp.ndarray:
    """Stretch ``(..., freq, time)`` complex spec in time by ``rate``.

    ``rate > 1`` speeds up (fewer output frames); ``rate < 1`` slows down.
    Magnitudes are linearly interpolated at fractional frame positions;
    phases advance by the unwrapped instantaneous frequency, accumulated
    with a parallel scan.  Output has ``ceil(time / rate)`` frames.
    """
    if rate == 1.0:
        return complex_specgrams

    n_time = complex_specgrams.shape[-1]
    # static fractional sample positions
    time_steps = np.arange(0, n_time, rate, dtype=np.float64)
    idx0 = time_steps.astype(np.int64)
    alphas = jnp.asarray((time_steps - idx0)[None, :], dtype=jnp.float32)

    # pad two frames so idx0+1 (and the final gather) stay in range
    spec = jnp.pad(complex_specgrams, [(0, 0)] * (complex_specgrams.ndim - 1)
                   + [(0, 2)])
    s0 = spec[..., idx0]
    s1 = spec[..., idx0 + 1]

    r0, i0 = jnp.real(s0), jnp.imag(s0)
    r1, i1 = jnp.real(s1), jnp.imag(s1)
    norm0 = jnp.sqrt(r0 * r0 + i0 * i0)
    norm1 = jnp.sqrt(r1 * r1 + i1 * i1)
    angle0 = jnp.arctan2(i0, r0)
    angle1 = jnp.arctan2(i1, r1)

    phase_advance = jnp.asarray(phase_advance, dtype=angle0.dtype)

    # unwrapped instantaneous frequency between consecutive source frames
    dphase = angle1 - angle0 - phase_advance
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
    dphase = dphase + phase_advance

    # seed with the first frame's phase; accumulate with an associative scan
    phase0 = angle0[..., :1]
    phase = jnp.concatenate([phase0, dphase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)

    mag = alphas * norm1 + (1.0 - alphas) * norm0
    return jax.lax.complex(mag * jnp.cos(phase_acc),
                           mag * jnp.sin(phase_acc))
