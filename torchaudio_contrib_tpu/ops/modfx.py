"""Nonlinear + modulation effects: overdrive, contrast, phaser, flanger.

Not in the reference (SURVEY §2) — these are the SoX-derived waveform
effects torchaudio ships (``overdrive``, ``contrast``, ``phaser``,
``flanger``).  The TPU-first formulations:

* ``overdrive``: the waveshaper is elementwise; the trailing DC-blocking
  recurrence ``y[n] = x[n] − x[n−1] + 0.995·y[n−1]`` is an order-1 IIR,
  run as :func:`~.iir.lfilter`'s log-depth associative scan — no sample
  loop.
* ``contrast``: pure elementwise waveshaping (one fused VPU expression).
* ``phaser``: the SoX effect is a feedback delay line whose tap index is
  modulated by a periodic table — i.e. ``temp[i] = g_in·x[i] +
  decay·temp[i − lag[i]]`` where ``lag[i]`` is **data-independent**.
  Feedback therefore unrolls exactly: ``temp[i] = g_in·Σ_k decay^k ·
  x[chain_k(i)]`` with the index chains precomputed in NumPy and the
  series truncated once ``decay^k`` falls below float32 noise.  The
  whole effect becomes K parallel gathers + a weighted sum — O(1) depth
  on device instead of a length-T sequential loop.
* ``flanger``: with no feedback (``regen=0``, the default) the effect is
  a time-varying *fractional* delay — two parallel gathers blended by
  the precomputed fractional part.  With feedback the two-tap
  interpolation makes the unrolled chain branch, so that path runs as a
  ``lax.scan`` carrying the rolling delay buffer (correctness over
  speed; still one compiled program).

Semantics are pinned against float64 NumPy loop oracles in
``tests/test_modfx.py`` (torchaudio is not installed in this
environment; SoX parameter conventions are reproduced from its public
effect definitions).  All effects keep the library conventions: time
last, arbitrary leading dims, differentiable, jit/vmap-safe.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import iir

__all__ = ["overdrive", "contrast", "phaser", "flanger"]


def overdrive(waveform: jnp.ndarray, gain: float = 20.0,
              colour: float = 20.0) -> jnp.ndarray:
    """SoX-style overdrive: cubic soft clip + DC-blocking filter.

    ``gain`` is the drive in dB; ``colour`` adds an asymmetric offset
    (even harmonics).  Output mixes dry and shaped signal 0.5/0.75 and
    clips to [-1, 1], per the SoX definition.
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    g = 10.0 ** (gain / 20.0)
    c = colour / 200.0
    temp = waveform * g + c
    shaped = jnp.where(
        temp < -1.0, -2.0 / 3.0,
        jnp.where(temp > 1.0, 2.0 / 3.0, temp - temp ** 3 / 3.0))
    # y[n] = x[n] - x[n-1] + 0.995 y[n-1]  (zero initial state)
    blocked = iir.lfilter(shaped, (1.0, -0.995), (1.0, -1.0))
    return jnp.clip(waveform * 0.5 + blocked * 0.75, -1.0, 1.0)


def contrast(waveform: jnp.ndarray,
             enhancement_amount: float = 75.0) -> jnp.ndarray:
    """SoX contrast enhancement (a compressed-sounding waveshape).

    ``enhancement_amount`` ∈ [0, 100]; 0 still applies a plain
    ``sin(x·π/2)`` shape, matching SoX.
    """
    if not 0.0 <= enhancement_amount <= 100.0:
        raise ValueError("enhancement_amount must be in [0, 100]")
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    amount = enhancement_amount / 750.0
    t1 = waveform * (math.pi / 2.0)
    return jnp.sin(t1 + amount * jnp.sin(t1 * 4.0))


def _wave_table(wave_type: str, table_size: int, lo: float, hi: float,
                phase: float, as_int: bool) -> np.ndarray:
    """SoX periodic modulation table (float64 NumPy, built once).

    ``phase`` is in radians of the table period.  ``as_int`` rounds to
    nearest integer (SoX's INT tables, used for integer delay taps).
    """
    offset = int(phase / (2.0 * math.pi) * table_size + 0.5)
    point = (np.arange(table_size) + offset) % table_size
    p = point.astype(np.float64) / table_size
    if wave_type == "sine":
        d = (np.sin(p * 2.0 * math.pi) + 1.0) / 2.0
    elif wave_type == "triangle":
        # starts at 0.5 rising: /\ over one period
        d = np.where(p < 0.25, 0.5 + 2.0 * p,
                     np.where(p < 0.75, 1.5 - 2.0 * p, 2.0 * p - 1.5))
    else:
        raise ValueError(
            f"unknown wave type {wave_type!r}; expected sine|triangle")
    d = d * (hi - lo) + lo
    if as_int:
        d = np.floor(d + 0.5)
    return d


def phaser(waveform: jnp.ndarray, sample_rate: float,
           gain_in: float = 0.4, gain_out: float = 0.74,
           delay_ms: float = 3.0, decay: float = 0.4,
           mod_speed: float = 0.5,
           sinusoidal: bool = True) -> jnp.ndarray:
    """SoX phaser: modulated feedback delay line, fully parallelized.

    The recurrence ``temp[i] = gain_in·x[i] + decay·temp[i − lag[i]]``
    has data-independent lags (the modulation table is periodic), so it
    is unrolled into ``K = ⌈log(1e-7)/log(decay)⌉`` exact gather terms
    (module docstring) — the truncated tail is below float32
    resolution.  For strong feedback (``decay`` ≳ 0.78) K exceeds 64
    and the unroll would blow up trace size, so the recurrence runs
    instead as a ``lax.scan`` over the rolling delay buffer — exact at
    every permitted ``decay``.  ``decay`` must be in (0, 0.99].
    """
    if not 0.0 < decay <= 0.99:
        raise ValueError("decay must be in (0, 0.99]")
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    t = waveform.shape[-1]
    d = int(delay_ms * 0.001 * sample_rate + 0.5)
    if d < 1:
        raise ValueError("delay_ms too small: delay buffer is empty")
    m = int(sample_rate / mod_speed + 0.5)
    mod = _wave_table("sine" if sinusoidal else "triangle", m,
                      1.0, float(d), math.pi / 2.0, as_int=True)
    # write pos advances 1/step, read pos = write-1 + mod  ⇒  the read
    # tap is the value written lag = d + 1 - mod[i % m] steps earlier
    lag = (d + 1 - mod[np.arange(t) % m]).astype(np.int64)

    k_exact = max(int(math.ceil(math.log(1e-7) / math.log(decay))), 1)
    if k_exact > 64:
        # strong decay: exact rolling-buffer scan (lag[i] ∈ [1, d], so
        # slot j after the roll holds the temp written j steps ago)
        lead = waveform.shape[:-1]
        flat = waveform.reshape((-1, t))
        lag_j = jnp.asarray(lag)

        def step(buf, inputs):
            x_i, lag_i = inputs
            buf = jnp.roll(buf, 1, axis=-1)
            temp = gain_in * x_i + decay * buf[:, lag_i]
            buf = buf.at[:, 0].set(temp)
            return buf, temp * gain_out

        buf0 = jnp.zeros((flat.shape[0], d + 1), flat.dtype)
        _, y = jax.lax.scan(step, buf0, (flat.T, lag_j))
        return y.T.reshape(lead + (t,))

    # follow the index chains on host: chain_0 = identity,
    # chain_{k+1}[i] = chain_k[i] - lag[chain_k[i]]  (−1 = fell off)
    out = waveform * gain_in
    idx = np.arange(t)
    alive = np.ones(t, bool)
    w = gain_in
    for _ in range(1, k_exact):
        nxt = idx - lag[np.clip(idx, 0, t - 1)]
        alive = alive & (nxt >= 0)
        if not alive.any():
            break
        idx = np.where(alive, nxt, 0)
        w *= decay
        out = out + jnp.where(
            jnp.asarray(alive),
            w * jnp.take(waveform, jnp.asarray(idx), axis=-1), 0.0)
    return out * gain_out


def flanger(waveform: jnp.ndarray, sample_rate: float,
            delay: float = 0.0, depth: float = 2.0, regen: float = 0.0,
            width: float = 71.0, speed: float = 0.5,
            phase: float = 25.0,
            modulation: str = "sinusoidal",
            interpolation: str = "linear") -> jnp.ndarray:
    """SoX flanger: time-varying fractional delay with optional feedback.

    ``delay``/``depth`` in ms (ranges [0, 30]/[0, 10]), ``regen`` is
    feedback % in [-95, 95], ``width`` the wet mix %, ``speed`` the
    modulation rate in Hz, ``phase`` the per-channel LFO phase shift %
    in [0, 100] (channel ``c`` of ``C`` — the second-to-last axis —
    gets an LFO offset of ``phase/100 · lfo_len · c/C``; SoX man-page
    convention, torchaudio not verifiable in this environment).
    ``interpolation`` ∈ linear|quadratic.

    Gain balance follows SoX: ``in = 1/(1+w)``, ``wet = w/(1+w) ·
    (1 − |regen/100|)`` with the RAW ``regen/100`` as the feedback
    coefficient (the loop-balance step scales only the wet mix).

    ``regen == 0`` (default) runs the parallel two-gather path;
    feedback falls back to a ``lax.scan`` over the rolling delay buffer
    (the branching two-tap interpolation defeats the phaser-style exact
    unroll — see module docstring).
    """
    if not 0.0 <= delay <= 30.0:
        raise ValueError("delay must be in [0, 30] ms")
    if not 0.0 <= depth <= 10.0:
        raise ValueError("depth must be in [0, 10] ms")
    if not -95.0 <= regen <= 95.0:
        raise ValueError("regen must be in [-95, 95]")
    if not 0.0 <= width <= 100.0:
        raise ValueError("width must be in [0, 100]")
    if not 0.0 <= phase <= 100.0:
        raise ValueError("phase must be in [0, 100]")
    if modulation not in ("sinusoidal", "triangular"):
        raise ValueError("modulation must be sinusoidal|triangular")
    if interpolation not in ("linear", "quadratic"):
        raise ValueError("interpolation must be linear|quadratic")
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    t = waveform.shape[-1]
    n_ch = waveform.shape[-2] if waveform.ndim >= 2 else 1

    delay_gain = width / 100.0
    in_gain = 1.0 / (1.0 + delay_gain)
    delay_gain = delay_gain / (1.0 + delay_gain)
    fb_gain = regen / 100.0
    delay_gain *= 1.0 - abs(fb_gain)       # SoX feedback-loop balance

    buf_len = int((delay + depth) * 0.001 * sample_rate + 0.5) + 2
    lfo_len = max(int(sample_rate / speed + 0.5), 1)
    lo = math.floor(delay * 0.001 * sample_rate + 0.5)
    hi = buf_len - 2.0
    lfo = _wave_table(
        "sine" if modulation == "sinusoidal" else "triangle",
        lfo_len, lo, hi, 3.0 * math.pi / 2.0, as_int=False)
    offs = np.round(phase / 100.0 * lfo_len
                    * np.arange(n_ch) / n_ch).astype(np.int64)
    dly = lfo[(np.arange(t)[None, :] + offs[:, None]) % lfo_len]
    int_d = np.floor(dly).astype(np.int64)     # (C, t)
    frac = dly - int_d

    # read taps are the buffer slots written int_d (+1) steps earlier;
    # a lag beyond the write history wraps to the stale slot (zero for
    # the first buf_len steps — matches the zero-initialized SoX buffer)
    if interpolation == "linear":
        tap_lags = np.stack([int_d, int_d + 1])           # (2, C, t)
        tap_w = np.stack([1.0 - frac, frac])
    else:
        # SoX quadratic: Lagrange-style 3-tap around the integer delay
        tap_lags = np.stack([int_d, int_d + 1, int_d + 2])
        w0 = (frac - 1.0) * (frac - 2.0) / 2.0
        w1 = -frac * (frac - 2.0)
        w2 = frac * (frac - 1.0) / 2.0
        tap_w = np.stack([w0, w1, w2])
    # a lag of 0 reads the slot about to be overwritten → stale value
    # written buf_len steps ago (SoX ring-buffer wrap)
    tap_lags = np.where(tap_lags == 0, buf_len, tap_lags)

    if fb_gain == 0.0:
        steps = np.arange(t)
        out = waveform * in_gain
        wet = jnp.zeros_like(waveform)
        for lags, ws in zip(tap_lags, tap_w):   # (C, t) each
            src = steps[None, :] - lags
            valid = src >= 0
            idx = np.where(valid, src, 0)
            if waveform.ndim == 1:
                gathered = jnp.take(waveform, jnp.asarray(idx[0]),
                                    axis=-1)
                wet = wet + jnp.asarray(ws[0] * valid[0]) * gathered
            else:
                idx_b = jnp.broadcast_to(jnp.asarray(idx),
                                         waveform.shape)
                gathered = jnp.take_along_axis(waveform, idx_b,
                                               axis=-1)
                wet = wet + jnp.asarray(ws * valid) * gathered
        return out + delay_gain * wet

    # feedback path: rolling buffer scan (write pos fixed at 0 by
    # rolling the buffer itself one slot per step), channel-aware lags
    lead = waveform.shape[:-1]
    flat = (waveform.reshape((1, 1, t)) if waveform.ndim == 1
            else waveform.reshape((-1,) + waveform.shape[-2:]))
    b = flat.shape[0]
    n_taps = tap_lags.shape[0]
    lags_j = jnp.asarray(tap_lags % buf_len)    # (taps, C, t)
    w_j = jnp.asarray(tap_w, flat.dtype)        # (taps, C, t)

    def step(buf, inputs):                      # buf (B, C, L)
        x_i, lag_i, w_i = inputs                # (B, C) / (taps, C) ×2
        buf = jnp.roll(buf, 1, axis=-1)
        idx = jnp.broadcast_to(lag_i.T[None], (b, n_ch, n_taps))
        taps = jnp.take_along_axis(buf, idx, axis=-1)   # (B, C, taps)
        wet = jnp.sum(taps * w_i.T[None], axis=-1)      # (B, C)
        buf = buf.at[..., 0].set(x_i + wet * fb_gain)
        return buf, x_i * in_gain + wet * delay_gain

    buf0 = jnp.zeros((b, n_ch, buf_len), flat.dtype)
    _, y = jax.lax.scan(
        step, buf0,
        (jnp.moveaxis(flat, -1, 0), jnp.moveaxis(lags_j, -1, 0),
         jnp.moveaxis(w_j, -1, 0)))
    return jnp.moveaxis(y, 0, -1).reshape(lead + (t,))
