"""``torchaudio.functional``-shaped namespace.

Migration alias so reference code written as ``import torchaudio.functional
as F`` ports by changing only the package name [ref-recon: torchaudio
``functional/__init__.py`` public surface — UNVERIFIED, mount empty].
Most names are the same objects as the flat package exports; semantics
and provenance live with the implementations in :mod:`.ops` (see
docs/CONVENTIONS.md).  Five functions whose house signatures diverge
from torchaudio's get thin argument adapters below (``spectrogram``,
``griffinlim``, ``pitch_shift``, ``spectral_centroid``, ``lfilter``).
RNG-consuming functions (``mask_along_axis``, ``mask_along_axis_iid``,
``dither``) keep the house key-first signatures: JAX has no global RNG,
so torchaudio's implicit-randomness signatures cannot be expressed —
pass a ``jax.random`` key explicitly (docs/MIGRATION.md).
House-convention extras that torchaudio spells differently
(``amplitude_to_db`` 10-vs-20 semantics, fused kernels) stay off this
namespace — this module is the torchaudio spelling only.
"""

from typing import Optional

from .ops import (
    # spectral
    inverse_spectrogram, phase_vocoder,
    melscale_fbanks, linear_fbanks, barkscale_fbanks, chroma_filterbank,
    create_dct, amplitude_to_DB, DB_to_amplitude,
    mask_along_axis, mask_along_axis_iid,
    # codecs / companding
    mu_law_encoding, mu_law_decoding, apply_codec,
    # resampling / time
    resample, speed,
    # features
    compute_deltas, detect_pitch_frequency,
    sliding_window_cmn, compute_kaldi_pitch, loudness,
    # waveform utilities
    preemphasis, deemphasis, gain, dither, dcshift, add_noise,
    convolve, fftconvolve, vad,
    # filtering
    filtfilt, biquad, allpass_biquad, band_biquad,
    bandpass_biquad, bandreject_biquad, bass_biquad, deemph_biquad,
    equalizer_biquad, highpass_biquad, lowpass_biquad, riaa_biquad,
    treble_biquad,
    # effects
    overdrive, contrast, phaser, flanger,
    # metrics / losses / alignment
    edit_distance, rnnt_loss, forced_align, merge_tokens, TokenSpan,
    # multichannel
    psd, mvdr_weights_souden, mvdr_weights_rtf, rtf_evd, rtf_power,
    apply_beamforming,
    # room acoustics
    simulate_rir_ism, ray_tracing,
)

from . import ops as _ops


def spectrogram(waveform, pad: int, window, n_fft: int,
                hop_length: int, win_length: int, power,
                normalized, center: bool = True,
                pad_mode: str = "reflect", onesided: bool = True):
    """torchaudio ``functional.spectrogram`` signature adapter over
    :func:`..ops.stft` / :func:`..ops.complex_norm` [ref-recon:
    torchaudio functional.spectrogram — UNVERIFIED, mount empty]:
    ``pad`` zero-pads the waveform two-sided, ``power=None`` returns
    the complex STFT, ``normalized`` accepts torchaudio's
    bool / ``"window"`` / ``"frame_length"`` forms."""
    import jax.numpy as jnp
    if pad:
        cfg = [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)]
        waveform = jnp.pad(waveform, cfg)
    frame_norm = normalized == "frame_length"
    win_norm = normalized is True or normalized == "window"
    spec = _ops.stft(waveform, n_fft, hop_length, win_length,
                     window=window, center=center, pad_mode=pad_mode,
                     normalized=win_norm, onesided=onesided)
    if frame_norm:
        spec = spec / jnp.sqrt(float(win_length or n_fft))
    if power is None:
        return spec
    return _ops.complex_norm(spec, power)


def griffinlim(specgram, window, n_fft: int, hop_length: int,
               win_length: int, power: float, n_iter: int,
               momentum: float, length, rand_init: bool, *, key=None):
    """torchaudio ``functional.griffinlim`` signature adapter over
    :func:`..ops.griffin_lim` [ref-recon: torchaudio
    functional.griffinlim — UNVERIFIED, mount empty].  ``specgram`` is
    a power-``power`` spectrogram (mapped back to magnitude here).
    JAX has no global RNG: ``rand_init=True`` uses ``key`` (keyword
    extension) or a fixed ``PRNGKey(0)`` — deterministic by design."""
    import jax
    if win_length not in (None, n_fft):
        raise NotImplementedError(
            "griffinlim: win_length != n_fft is not supported by the "
            "house kernel path; pass win_length=n_fft")
    if rand_init and key is None:
        key = jax.random.PRNGKey(0)
    mag = specgram if power == 1 else specgram ** (1.0 / power)
    return _ops.griffin_lim(mag, n_fft, hop_length, window=window,
                            n_iter=n_iter, momentum=momentum,
                            length=length, key=key)


def pitch_shift(waveform, sample_rate: int, n_steps: float,
                bins_per_octave: int = 12, n_fft: int = 512,
                win_length=None, hop_length=None, window=None):
    """torchaudio ``functional.pitch_shift`` signature adapter over
    :func:`..ops.pitch_shift` [ref-recon: torchaudio
    functional.pitch_shift — UNVERIFIED, mount empty]."""
    if win_length not in (None, n_fft):
        raise NotImplementedError(
            "pitch_shift: win_length != n_fft is not supported; pass "
            "win_length=n_fft")
    hop = hop_length if hop_length is not None else n_fft // 4
    win = window if window is not None else "hann"
    return _ops.pitch_shift(waveform, sample_rate, n_steps,
                            bins_per_octave, n_fft, hop, win)


def spectral_centroid(waveform, sample_rate: float, pad: int, window,
                      n_fft: int, hop_length: int, win_length: int):
    """torchaudio ``functional.spectral_centroid`` signature adapter
    (waveform-in, magnitude STFT inside) over
    :func:`..ops.spectral_centroid` [ref-recon: torchaudio
    functional.spectral_centroid — UNVERIFIED, mount empty]."""
    mag = spectrogram(waveform, pad, window, n_fft, hop_length,
                      win_length, power=1.0, normalized=False)
    return _ops.spectral_centroid(mag, sample_rate)


def lfilter(waveform, a_coeffs, b_coeffs, clamp: bool = True,
            batching: bool = True):
    """torchaudio ``functional.lfilter`` signature adapter over
    :func:`..ops.lfilter` (torchaudio's ``clamp=True`` default; the
    house default is False) [ref-recon: torchaudio functional.lfilter
    — UNVERIFIED, mount empty].  ``batching`` is accepted for
    signature parity; coefficient broadcasting is shape-driven here."""
    del batching
    return _ops.lfilter(waveform, a_coeffs, b_coeffs, clamp=clamp)

__all__ = [
    "spectrogram", "inverse_spectrogram", "griffinlim", "phase_vocoder",
    "melscale_fbanks", "linear_fbanks", "barkscale_fbanks",
    "chroma_filterbank", "create_dct", "amplitude_to_DB",
    "DB_to_amplitude", "mask_along_axis", "mask_along_axis_iid",
    "mu_law_encoding", "mu_law_decoding", "apply_codec",
    "resample", "speed", "pitch_shift",
    "compute_deltas", "detect_pitch_frequency", "spectral_centroid",
    "sliding_window_cmn", "compute_kaldi_pitch", "loudness",
    "preemphasis", "deemphasis", "gain", "dither", "dcshift",
    "add_noise", "convolve", "fftconvolve", "vad",
    "lfilter", "filtfilt", "biquad", "allpass_biquad", "band_biquad",
    "bandpass_biquad", "bandreject_biquad", "bass_biquad",
    "deemph_biquad", "equalizer_biquad", "highpass_biquad",
    "lowpass_biquad", "riaa_biquad", "treble_biquad",
    "overdrive", "contrast", "phaser", "flanger",
    "edit_distance", "rnnt_loss", "forced_align", "merge_tokens",
    "TokenSpan",
    "psd", "mvdr_weights_souden", "mvdr_weights_rtf", "rtf_evd",
    "rtf_power", "apply_beamforming",
    "simulate_rir_ism", "ray_tracing",
]
