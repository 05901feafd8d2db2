"""Kaldi-compatible feature extraction (spectrogram / fbank / mfcc).

Not in the reference (SURVEY §2) — mirrors torchaudio's
``compliance.kaldi`` capability: features matching Kaldi's
``compute-spectrogram-feats`` / ``compute-fbank-feats`` /
``compute-mfcc-feats`` semantics (povey window, snip_edges framing,
per-frame DC removal + pre-emphasis, raw log-energy, power-of-two FFT
padding, Kaldi-style mel banks built in the MEL domain, orthonormal
DCT + cepstral liftering).

TPU formulation: everything is one vectorized pipeline over a static
``(num_frames, window)`` frame matrix — gather-framing, per-frame
elementwise preprocessing, one batched rFFT, one filterbank GEMM, one
DCT GEMM; no per-frame Python or scan.  Batched over leading dims and
jit-able.  Dither takes an explicit PRNG ``key`` (the library never
hides RNG state); ``dither=0.0`` by default.

Semantics pinned against a literal float64 NumPy re-derivation of the
Kaldi recipe in ``tests/test_kaldi.py`` (the Kaldi/torchaudio oracle
itself is unavailable in this environment — provenance: UNVERIFIED,
see docs/CONVENTIONS.md).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["spectrogram", "fbank", "mfcc"]

_EPS = float(np.finfo(np.float32).eps)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _window_vec(window_type: str, n: int, blackman_coeff: float):
    """Kaldi feature-window: periodic-in-(N-1) windows, float64."""
    a = 2 * np.pi / (n - 1)
    k = np.arange(n, dtype=np.float64)
    if window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * k)
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * k)
    elif window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * k)) ** 0.85
    elif window_type == "rectangular":
        w = np.ones(n)
    elif window_type == "blackman":
        w = (blackman_coeff - 0.5 * np.cos(a * k)
             + (0.5 - blackman_coeff) * np.cos(2 * a * k))
    else:
        raise ValueError(f"unknown window_type {window_type!r}")
    return w


def _frame_indices(n: int, window: int, shift: int, snip_edges: bool):
    """Static (num_frames, window) sample indices (reflect-padded when
    ``snip_edges=False``, Kaldi's symmetric mirroring)."""
    if snip_edges:
        m = 1 + (n - window) // shift if n >= window else 0
        starts = np.arange(m) * shift
        idx = starts[:, None] + np.arange(window)[None, :]
    else:
        m = (n + shift // 2) // shift
        starts = np.arange(m) * shift + shift // 2 - window // 2
        idx = starts[:, None] + np.arange(window)[None, :]
        # Kaldi reflects REPEATEDLY until in range (one reflection is
        # not enough when the clip is shorter than ~half the window);
        # the iterated boundary reflection has period 2n, giving the
        # closed form below (e.g. idx=-80, n=100 → 79, not a silent
        # negative-index wrap to 20)
        p = np.mod(idx, 2 * n)
        idx = np.where(p >= n, 2 * n - 1 - p, p)
    return m, idx.astype(np.int32)


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def _vtln_warp(freq, low, high, vtln_low, vtln_high, warp):
    """Kaldi's piecewise-linear VTLN warp (float64, Hz domain)."""
    l = vtln_low * max(1.0, warp)
    h = vtln_high * min(1.0, warp)
    scale = 1.0 / warp
    fl = scale * l
    fh = scale * h
    out = np.asarray(freq, np.float64).copy()
    lo = freq < l
    hi = freq > h
    mid = ~(lo | hi)
    out[mid] = scale * freq[mid]
    lo_scale = (fl - low) / (l - low)
    hi_scale = (high - fh) / (high - h)
    out[lo] = low + lo_scale * (freq[lo] - low)
    out[hi] = high - hi_scale * (high - freq[hi])
    return out


def _mel_banks(num_bins: int, padded_window: int, sample_freq: float,
               low_freq: float, high_freq: float,
               vtln_low: float, vtln_high: float, vtln_warp: float):
    """Kaldi MelBanks: triangles linear in MEL over fft bins
    0..N/2-1 (nyquist bin excluded), float64 construction."""
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    if not (0.0 <= low_freq < high_freq <= nyquist):
        raise ValueError(
            f"bad frequency range [{low_freq}, {high_freq}] for "
            f"nyquist {nyquist}")
    n_fft_bins = padded_window // 2
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    delta = (mel_high - mel_low) / (num_bins + 1)
    vl = vtln_low if vtln_low >= 0 else nyquist + vtln_low
    vh = vtln_high if vtln_high >= 0 else nyquist + vtln_high

    edges_mel = mel_low + np.arange(num_bins + 2) * delta
    if vtln_warp != 1.0:
        hz = 700.0 * (np.exp(edges_mel / 1127.0) - 1.0)
        hz = _vtln_warp(hz, low_freq, high_freq, vl, vh, vtln_warp)
        edges_mel = _mel(hz)
    left = edges_mel[:-2][:, None]
    center = edges_mel[1:-1][:, None]
    right = edges_mel[2:][:, None]

    bin_mel = _mel(np.arange(n_fft_bins, dtype=np.float64)
                   * (sample_freq / padded_window))[None, :]
    up = (bin_mel - left) / (center - left)
    down = (right - bin_mel) / (right - center)
    return np.maximum(0.0, np.minimum(up, down))     # (num_bins, N/2)


def _dct_matrix(num_ceps: int, num_bins: int):
    """Orthonormal DCT-II rows 0..num_ceps-1 (Kaldi ComputeDctMatrix)."""
    j = np.arange(num_bins, dtype=np.float64)
    i = np.arange(num_ceps, dtype=np.float64)[:, None]
    m = np.cos(np.pi / num_bins * i * (j + 0.5)) * math.sqrt(2.0 / num_bins)
    m[0] = math.sqrt(1.0 / num_bins)
    return m


def _preprocess(waveform, *, sample_frequency, frame_length, frame_shift,
                round_to_power_of_two, snip_edges, dither, key,
                remove_dc_offset, preemphasis_coefficient, raw_energy,
                energy_floor, window_type, blackman_coeff, min_duration):
    """Shared front half: frames → (power_spectrum (m, N/2+1),
    log_energy (m,)).  Returns (None, None, 0) for too-short input."""
    x = jnp.asarray(waveform)
    n = x.shape[-1]
    window = int(sample_frequency * frame_length / 1000.0)
    shift = int(sample_frequency * frame_shift / 1000.0)
    if window < 2 or shift < 1:
        # degenerate parameters raise regardless of clip length — a
        # short clip must not swallow the bad-parameter error
        raise ValueError(f"bad frame_length/frame_shift "
                         f"({frame_length}, {frame_shift})")
    if window > n and snip_edges:
        return None, None, 0
    if n < min_duration * sample_frequency:
        return None, None, 0
    padded = _next_pow2(window) if round_to_power_of_two else window
    m, idx = _frame_indices(n, window, shift, snip_edges)
    if m == 0:
        return None, None, 0

    frames = x[..., idx]                              # (..., m, window)
    if dither != 0.0:
        if key is None:
            raise ValueError("dither != 0 requires an explicit PRNG key")
        frames = frames + dither * jax.random.normal(
            key, frames.shape, frames.dtype)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, -1, keepdims=True)

    def _log_energy(fr):
        return jnp.log(jnp.maximum(jnp.sum(fr * fr, -1), _EPS))

    log_e = _log_energy(frames) if raw_energy else None

    c = preemphasis_coefficient
    if c != 0.0:
        first = frames[..., :1] * (1.0 - c)
        rest = frames[..., 1:] - c * frames[..., :-1]
        frames = jnp.concatenate([first, rest], -1)
    w = jnp.asarray(_window_vec(window_type, window, blackman_coeff),
                    frames.dtype)
    frames = frames * w
    if not raw_energy:
        log_e = _log_energy(frames)
    if energy_floor > 0.0:
        log_e = jnp.maximum(log_e, math.log(energy_floor))

    if padded > window:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, padded - window)]
        frames = jnp.pad(frames, pad)
    spec = jnp.fft.rfft(frames)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (..., m, N/2+1)
    return power, log_e, padded


def _empty_dim(frame_length, sample_frequency,
               round_to_power_of_two) -> int:
    """Spectrogram feature dim for the zero-frame result (the output
    contract must hold even when the clip is too short to frame)."""
    window = int(sample_frequency * frame_length / 1000.0)
    padded = _next_pow2(window) if round_to_power_of_two else window
    return padded // 2 + 1


def spectrogram(waveform, blackman_coeff: float = 0.42,
                dither: float = 0.0, energy_floor: float = 1.0,
                frame_length: float = 25.0, frame_shift: float = 10.0,
                min_duration: float = 0.0,
                preemphasis_coefficient: float = 0.97,
                raw_energy: bool = True, remove_dc_offset: bool = True,
                round_to_power_of_two: bool = True,
                sample_frequency: float = 16000.0,
                snip_edges: bool = True, subtract_mean: bool = False,
                window_type: str = "povey", key=None):
    """Kaldi ``compute-spectrogram-feats``: log power spectrum with the
    DC bin replaced by the frame log-energy.  ``(..., time)`` →
    ``(..., num_frames, padded_window/2 + 1)``."""
    power, log_e, _ = _preprocess(
        waveform, sample_frequency=sample_frequency,
        frame_length=frame_length, frame_shift=frame_shift,
        round_to_power_of_two=round_to_power_of_two,
        snip_edges=snip_edges, dither=dither, key=key,
        remove_dc_offset=remove_dc_offset,
        preemphasis_coefficient=preemphasis_coefficient,
        raw_energy=raw_energy, energy_floor=energy_floor,
        window_type=window_type, blackman_coeff=blackman_coeff,
        min_duration=min_duration)
    if power is None:
        return jnp.zeros(jnp.asarray(waveform).shape[:-1]
                         + (0, _empty_dim(frame_length,
                                          sample_frequency,
                                          round_to_power_of_two)))
    feats = jnp.log(jnp.maximum(power, _EPS))
    feats = feats.at[..., 0].set(log_e)
    if subtract_mean:
        feats = feats - jnp.mean(feats, -2, keepdims=True)
    return feats


def fbank(waveform, blackman_coeff: float = 0.42, dither: float = 0.0,
          energy_floor: float = 1.0, frame_length: float = 25.0,
          frame_shift: float = 10.0, high_freq: float = 0.0,
          htk_compat: bool = False, low_freq: float = 20.0,
          min_duration: float = 0.0, num_mel_bins: int = 23,
          preemphasis_coefficient: float = 0.97, raw_energy: bool = True,
          remove_dc_offset: bool = True,
          round_to_power_of_two: bool = True,
          sample_frequency: float = 16000.0, snip_edges: bool = True,
          subtract_mean: bool = False, use_energy: bool = False,
          use_log_fbank: bool = True, use_power: bool = True,
          vtln_high: float = -500.0, vtln_low: float = 100.0,
          vtln_warp: float = 1.0, window_type: str = "povey", key=None):
    """Kaldi ``compute-fbank-feats``: (log-)mel filterbank energies,
    optionally with an energy column.  ``(..., time)`` →
    ``(..., num_frames, num_mel_bins [+1])``."""
    power, log_e, padded = _preprocess(
        waveform, sample_frequency=sample_frequency,
        frame_length=frame_length, frame_shift=frame_shift,
        round_to_power_of_two=round_to_power_of_two,
        snip_edges=snip_edges, dither=dither, key=key,
        remove_dc_offset=remove_dc_offset,
        preemphasis_coefficient=preemphasis_coefficient,
        raw_energy=raw_energy, energy_floor=energy_floor,
        window_type=window_type, blackman_coeff=blackman_coeff,
        min_duration=min_duration)
    if power is None:
        return jnp.zeros(jnp.asarray(waveform).shape[:-1]
                         + (0, num_mel_bins + int(use_energy)))
    banks = jnp.asarray(
        _mel_banks(num_mel_bins, padded, sample_frequency, low_freq,
                   high_freq, vtln_low, vtln_high, vtln_warp),
        power.dtype)
    spec = power[..., :padded // 2]          # Kaldi drops the nyquist bin
    if not use_power:
        spec = jnp.sqrt(spec)
    mel = jnp.einsum("...tf,mf->...tm", spec, banks,
                     precision=jax.lax.Precision.HIGHEST)
    if use_log_fbank:
        mel = jnp.log(jnp.maximum(mel, _EPS))
    if use_energy:
        e = log_e[..., None]
        mel = (jnp.concatenate([mel, e], -1) if htk_compat
               else jnp.concatenate([e, mel], -1))
    if subtract_mean:
        mel = mel - jnp.mean(mel, -2, keepdims=True)
    return mel


def mfcc(waveform, blackman_coeff: float = 0.42,
         cepstral_lifter: float = 22.0, dither: float = 0.0,
         energy_floor: float = 1.0, frame_length: float = 25.0,
         frame_shift: float = 10.0, high_freq: float = 0.0,
         htk_compat: bool = False, low_freq: float = 20.0,
         min_duration: float = 0.0, num_ceps: int = 13,
         num_mel_bins: int = 23, preemphasis_coefficient: float = 0.97,
         raw_energy: bool = True, remove_dc_offset: bool = True,
         round_to_power_of_two: bool = True,
         sample_frequency: float = 16000.0, snip_edges: bool = True,
         subtract_mean: bool = False, use_energy: bool = False,
         vtln_high: float = -500.0, vtln_low: float = 100.0,
         vtln_warp: float = 1.0, window_type: str = "povey", key=None):
    """Kaldi ``compute-mfcc-feats``: liftered DCT of log-mel energies.
    ``(..., time)`` → ``(..., num_frames, num_ceps)``."""
    if not 0 < num_ceps <= num_mel_bins:
        raise ValueError("need 0 < num_ceps <= num_mel_bins")
    power, log_e, padded = _preprocess(
        waveform, sample_frequency=sample_frequency,
        frame_length=frame_length, frame_shift=frame_shift,
        round_to_power_of_two=round_to_power_of_two,
        snip_edges=snip_edges, dither=dither, key=key,
        remove_dc_offset=remove_dc_offset,
        preemphasis_coefficient=preemphasis_coefficient,
        raw_energy=raw_energy, energy_floor=energy_floor,
        window_type=window_type, blackman_coeff=blackman_coeff,
        min_duration=min_duration)
    if power is None:
        return jnp.zeros(jnp.asarray(waveform).shape[:-1]
                         + (0, num_ceps))
    banks = jnp.asarray(
        _mel_banks(num_mel_bins, padded, sample_frequency, low_freq,
                   high_freq, vtln_low, vtln_high, vtln_warp),
        power.dtype)
    mel = jnp.log(jnp.maximum(
        jnp.einsum("...tf,mf->...tm", power[..., :padded // 2], banks,
                   precision=jax.lax.Precision.HIGHEST), _EPS))
    dct = jnp.asarray(_dct_matrix(num_ceps, num_mel_bins), mel.dtype)
    ceps = jnp.einsum("...tm,cm->...tc", mel, dct,
                      precision=jax.lax.Precision.HIGHEST)
    if cepstral_lifter != 0.0:
        q = cepstral_lifter
        lift = 1.0 + 0.5 * q * np.sin(np.pi * np.arange(num_ceps) / q)
        ceps = ceps * jnp.asarray(lift, ceps.dtype)
    if use_energy:
        ceps = ceps.at[..., 0].set(log_e)
    if htk_compat:
        # energy/C0 moves last; HTK scales C0 by sqrt(2) when it is a
        # true cepstral coefficient rather than log-energy
        first = ceps[..., :1]
        if not use_energy:
            first = first * math.sqrt(2.0)
        ceps = jnp.concatenate([ceps[..., 1:], first], -1)
    if subtract_mean:
        ceps = ceps - jnp.mean(ceps, -2, keepdims=True)
    return ceps
