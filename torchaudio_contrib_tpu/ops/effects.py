"""Level/shape utilities: fade, gain, dither, DC shift, CMN.

Not in the reference (SURVEY §2) — the small waveform utilities every
pipeline ends up needing (torchaudio ships them as ``fade``, ``gain``,
``dither``, ``dcshift``, ``sliding_window_cmn``).  All are elementwise
or small-window ops that XLA fuses into neighbouring stages; shapes are
static and everything is jit/vmap/grad-friendly (dither takes an
explicit PRNG key — this library never hides randomness in state).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fade", "gain", "dither", "dcshift", "sliding_window_cmn",
           "add_noise", "speed", "apply_codec"]

_FADE_SHAPES = ("linear", "exponential", "logarithmic",
                "quarter_sine", "half_sine", "parabola")


def _fade_curve(n: int, shape: str, dtype) -> jnp.ndarray:
    r = jnp.linspace(0.0, 1.0, n, dtype=dtype)
    if shape == "linear":
        return r
    if shape == "exponential":
        return jnp.power(2.0, r - 1.0) * r
    if shape == "logarithmic":
        return jnp.sqrt(r)
    if shape == "quarter_sine":
        return jnp.sin(r * np.pi / 2.0)
    if shape == "half_sine":
        return (1.0 - jnp.cos(r * np.pi)) / 2.0
    if shape == "parabola":                   # sox fade 'p'
        return r * (2.0 - r)
    raise ValueError(
        f"unknown fade shape {shape!r}; expected one of {_FADE_SHAPES}")


def fade(waveform: jnp.ndarray, fade_in_len: int = 0,
         fade_out_len: int = 0,
         fade_shape: str = "linear") -> jnp.ndarray:
    """Apply fade-in/out envelopes over the first/last samples."""
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    t = waveform.shape[-1]
    if not (0 <= fade_in_len <= t and 0 <= fade_out_len <= t):
        raise ValueError(
            f"fade lengths ({fade_in_len}, {fade_out_len}) must be in "
            f"[0, {t}]")
    env = jnp.ones((t,), waveform.dtype)
    if fade_in_len > 0:
        env = env.at[:fade_in_len].mul(
            _fade_curve(fade_in_len, fade_shape, waveform.dtype))
    if fade_out_len > 0:
        env = env.at[t - fade_out_len:].mul(
            _fade_curve(fade_out_len, fade_shape, waveform.dtype)[::-1])
    return waveform * env


def gain(waveform: jnp.ndarray, gain_db: float = 1.0) -> jnp.ndarray:
    """Scale amplitude by ``gain_db`` decibels."""
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    return waveform * (10.0 ** (gain_db / 20.0))


def dcshift(waveform: jnp.ndarray, shift: float,
            limiter_gain: float | None = None) -> jnp.ndarray:
    """Add a DC offset; optional soft limiter near full scale.

    With ``limiter_gain``, samples that would clip are compressed with
    the SoX-style polynomial limiter instead of hard-clipping.
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    if limiter_gain is None:
        return jnp.clip(waveform + shift, -1.0, 1.0)
    thresh = 1.0 - limiter_gain
    shifted = waveform + shift
    if shift > 0:
        peak = jnp.where(
            waveform > thresh - shift,
            thresh + (shifted - thresh)
            / (1.0 + ((shifted - thresh) / limiter_gain) ** 2),
            shifted)
    else:
        peak = jnp.where(
            waveform < -thresh - shift,
            -thresh + (shifted + thresh)
            / (1.0 + ((shifted + thresh) / limiter_gain) ** 2),
            shifted)
    return jnp.clip(peak, -1.0, 1.0)


def dither(key, waveform: jnp.ndarray,
           density_function: str = "TPDF",
           bit_depth: int = 16) -> jnp.ndarray:
    """Add quantization dither at the LSB of ``bit_depth``.

    ``density_function`` ∈ TPDF (triangular, the audio default), RPDF
    (rectangular), GPDF (gaussian).  Takes an explicit PRNG ``key``
    (library convention: no hidden RNG state).
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    lsb = 2.0 ** (1 - bit_depth)
    df = density_function.upper()
    if df == "TPDF":
        k1, k2 = jax.random.split(key)
        noise = (jax.random.uniform(k1, waveform.shape, waveform.dtype)
                 - jax.random.uniform(k2, waveform.shape,
                                      waveform.dtype))
    elif df == "RPDF":
        noise = jax.random.uniform(key, waveform.shape, waveform.dtype,
                                   -0.5, 0.5)
    elif df == "GPDF":
        noise = jax.random.normal(key, waveform.shape,
                                  waveform.dtype) * 0.5
    else:
        raise ValueError(
            f"unknown density_function {density_function!r}; expected "
            "TPDF, RPDF or GPDF")
    return waveform + lsb * noise


def add_noise(waveform: jnp.ndarray, noise: jnp.ndarray, snr,
              lengths=None) -> jnp.ndarray:
    """Mix ``noise`` into ``waveform`` at a given signal-to-noise ratio.

    ``snr`` is in dB, broadcast over the leading dims (one value per
    clip is typical).  ``lengths`` optionally restricts the energy
    measurement (and the mixing) to the first ``lengths`` samples of
    each clip — padded tails stay untouched.
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    noise = noise.astype(waveform.dtype)
    if noise.shape != waveform.shape:
        raise ValueError(
            f"noise shape {noise.shape} != waveform {waveform.shape}")
    snr = jnp.asarray(snr, waveform.dtype)
    if lengths is not None:
        mask = (jnp.arange(waveform.shape[-1])
                < jnp.asarray(lengths)[..., None]).astype(waveform.dtype)
    else:
        mask = jnp.ones((), waveform.dtype)
    e_sig = jnp.sum((waveform * mask) ** 2, axis=-1)
    e_noi = jnp.maximum(jnp.sum((noise * mask) ** 2, axis=-1), 1e-20)
    # scale so that e_sig / (scale² e_noi) = 10^(snr/10)
    scale = jnp.sqrt(e_sig / e_noi) * 10.0 ** (-snr / 20.0)
    return waveform + scale[..., None] * noise * mask


def speed(waveform: jnp.ndarray, orig_freq: int, factor: float,
          lengths=None):
    """Speed up (``factor > 1``) or slow down a clip by resampling.

    Changes duration AND pitch together (tape-speed semantics, the
    usual speed-perturbation augmentation).  Rational approximation of
    ``factor`` to 1/1000 precision, then one polyphase resample on the
    MXU (:func:`~.resample.resample`).  Returns ``out`` or
    ``(out, new_lengths)`` when ``lengths`` is given.
    """
    from .resample import resample
    if factor <= 0:
        raise ValueError("factor must be positive")
    source_freq = int(round(factor * 1000.0))
    target_freq = 1000
    g = np.gcd(source_freq, target_freq)
    source_freq //= g
    target_freq //= g
    out = resample(waveform, orig_freq * source_freq,
                   orig_freq * target_freq)
    if lengths is None:
        return out
    new_lengths = jnp.ceil(jnp.asarray(lengths) * target_freq
                           / source_freq).astype(jnp.int32)
    return out, new_lengths


def sliding_window_cmn(specgram: jnp.ndarray, cmn_window: int = 600,
                       min_cmn_window: int = 100,
                       center: bool = False,
                       norm_vars: bool = False) -> jnp.ndarray:
    """Sliding-window cepstral mean (and variance) normalization.

    ``specgram`` is ``(..., freq, time)`` (MFCC/log-mel frames); each
    frame is normalized by statistics of a ``cmn_window``-frame window
    (centered when ``center``, else trailing with a ``min_cmn_window``
    warm-up, Kaldi semantics).  Windowed sums come from one cumulative
    sum along time — no per-frame loop, O(T) work, static shapes.
    """
    specgram = specgram.astype(jnp.promote_types(specgram.dtype,
                                                 jnp.float32))
    t = specgram.shape[-1]
    idx = np.arange(t)
    if center:
        start = np.clip(idx - cmn_window // 2, 0, None)
        end = np.minimum(start + cmn_window, t)
        start = np.minimum(start, np.clip(t - cmn_window, 0, None))
    else:
        # trailing window; early frames use at least min_cmn_window
        # (looking ahead, per Kaldi) when available
        start = np.clip(idx - cmn_window + 1, 0, None)
        end = np.maximum(idx + 1, np.minimum(min_cmn_window, t))
    cnt = jnp.asarray((end - start).astype(np.float32))

    c1 = jnp.cumsum(specgram, axis=-1)
    c2 = jnp.cumsum(specgram * specgram, axis=-1)
    zero = jnp.zeros(c1.shape[:-1] + (1,), c1.dtype)
    c1 = jnp.concatenate([zero, c1], axis=-1)
    c2 = jnp.concatenate([zero, c2], axis=-1)
    s1 = c1[..., end] - c1[..., start]
    s2 = c2[..., end] - c2[..., start]
    mean = s1 / cnt
    out = specgram - mean
    if norm_vars:
        var = jnp.maximum(s2 / cnt - mean * mean, 1e-10)
        out = out / jnp.sqrt(var)
    return out


def apply_codec(waveform: jnp.ndarray, sample_rate: int,
                format: str = "wav", encoding: str | None = None,
                bits_per_sample: int | None = None) -> jnp.ndarray:
    """Simulate a lossy/quantizing codec round trip (torchaudio's
    ``functional.apply_codec`` capability for the WAV family).

    ``format`` must be ``"wav"`` — compressed formats (mp3/vorbis/
    gsm/...) need ffmpeg/sox backends that do not exist in this
    zero-egress build and raise loudly.  ``encoding`` ∈ ``"PCM_S"``
    (default, ``bits_per_sample`` 8/16/24/32), ``"PCM_U"`` (8),
    ``"ULAW"``/``"ALAW"`` (8).  Pure traced math (quantize →
    dequantize; G.711 companding for the law codecs), so it is
    jit-able and differentiable-through in the straight-through sense
    (gradients of the rounding are zero).
    """
    if format != "wav":
        raise ValueError(
            f"apply_codec supports format='wav' only (got "
            f"{format!r}): compressed codecs need ffmpeg/sox, not "
            "available in this build")
    x = jnp.clip(waveform.astype(jnp.float32), -1.0, 1.0)
    enc = (encoding or "PCM_S").upper()
    if enc == "PCM_S":
        bits = bits_per_sample or 16
        if bits not in (8, 16, 24, 32):
            raise ValueError("PCM_S bits_per_sample must be "
                             "8/16/24/32")
        q = float(2 ** (bits - 1))
        return jnp.clip(jnp.round(x * q), -q, q - 1) / q
    if enc == "PCM_U":
        if bits_per_sample not in (None, 8):
            raise ValueError("PCM_U supports 8 bits")
        # WAV PCM_U grid: code = x·128 + 128, decode (code−128)/128 —
        # zero encodes exactly (code 128 → 0), like real decoders
        u = jnp.clip(jnp.round(x * 128.0) + 128.0, 0, 255)
        return (u - 128.0) / 128.0
    if enc == "ULAW":
        from .mulaw import mu_law_encoding, mu_law_decoding
        return mu_law_decoding(mu_law_encoding(x, 256), 256)
    if enc == "ALAW":
        A = 87.6
        lnA1 = 1.0 + jnp.log(A)
        ax = jnp.abs(x)
        comp = jnp.where(ax < 1.0 / A, A * ax / lnA1,
                         (1.0 + jnp.log(jnp.maximum(A * ax, 1.0)))
                         / lnA1)
        # signed 8-bit companded grid with an exact zero level
        code = jnp.clip(jnp.round(jnp.sign(x) * comp * 128.0),
                        -128, 127)
        y = code / 128.0
        ay = jnp.abs(y)
        exp = jnp.where(ay < 1.0 / lnA1, ay * lnA1 / A,
                        jnp.exp(ay * lnA1 - 1.0) / A)
        return jnp.sign(y) * exp
    raise ValueError(f"unknown encoding {encoding!r} (PCM_S, PCM_U, "
                     "ULAW, ALAW)")
