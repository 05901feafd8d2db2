"""Layer wrappers for the extended op surface (rebuild extras).

The reference's layer file stops at the mel/dB family
[ref: torchaudio_contrib/layers.py — UNVERIFIED; SURVEY §2 #9-14];
these wrappers extend the same immutable-``Transform`` contract
(hashable config, pure ``__call__``, derived arrays recomputed — never
serialized) over the rest of the functional surface, mirroring the
transform classes torchaudio users expect (``MFCC``, ``Loudness``,
``PitchShift``, ``Fade``, ``Vol``, masking, deltas, CMN, spectral
descriptors, beamforming).

Randomized transforms (masking, ``AddNoise`` is deterministic given the
noise; ``FrequencyMasking``/``TimeMasking`` sample) take an explicit
PRNG ``key`` in ``__call__`` — the library never hides RNG state.
"""
from __future__ import annotations

from .layers import Transform
from .. import ops as _ops

__all__ = [
    "MFCC", "Loudness", "PitchShift", "Speed", "AddNoise",
    "Fade", "Vol", "FrequencyMasking", "TimeMasking",
    "Preemphasis", "Deemphasis", "ComputeDeltas", "SlidingWindowCmn",
    "SpectralCentroid", "MelScale", "InverseMelScale",
    "PSD", "SoudenMVDR", "RTFMVDR", "Vad",
    "Overdrive", "Phaser", "Flanger", "Contrast",
    "Lowpass", "Highpass", "Equalizer", "RNNTLoss",
    "LFCC", "Convolve", "FFTConvolve", "SpeedPerturbation",
]


class MFCC(Transform):
    """Waveform → MFCC (``ops/mfcc.py`` — DCT-II GEMM on log-mel)."""

    def __init__(self, sample_rate: int = 22050, n_mfcc: int = 40,
                 num_mels: int = 128, fft_length: int = 2048,
                 hop_length: int = 512, **kwargs):
        self.kw = dict(sample_rate=sample_rate, n_mfcc=n_mfcc,
                       num_mels=num_mels, fft_length=fft_length,
                       hop_length=hop_length, **kwargs)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        return _ops.mfcc(x, **self.kw)


class Loudness(Transform):
    """BS.1770-4 integrated loudness (LKFS) per clip."""

    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate
        self._config = (sample_rate,)

    def __call__(self, x, params=None):
        return _ops.loudness(x, self.sample_rate)


class PitchShift(Transform):
    """Shift pitch by ``n_steps`` semitones at constant duration."""

    def __init__(self, sample_rate: int, n_steps: float,
                 bins_per_octave: int = 12, fft_length: int = 1024,
                 hop_length: int = 256):
        self.kw = dict(sample_rate=sample_rate, n_steps=n_steps,
                       bins_per_octave=bins_per_octave,
                       fft_length=fft_length, hop_length=hop_length)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        return _ops.pitch_shift(x, **self.kw)


class Speed(Transform):
    """Tape-speed change (duration AND pitch) by ``factor``."""

    def __init__(self, orig_freq: int, factor: float):
        self.orig_freq, self.factor = orig_freq, factor
        self._config = (orig_freq, factor)

    def __call__(self, x, params=None):
        return _ops.speed(x, self.orig_freq, self.factor)


class AddNoise(Transform):
    """Mix provided noise at an SNR: ``t(x, noise, snr)``."""

    def __init__(self):
        self._config = ()

    def __call__(self, x, noise=None, snr=None, lengths=None,
                 params=None):
        if noise is None or snr is None:
            raise TypeError("AddNoise requires noise= and snr=")
        return _ops.add_noise(x, noise, snr, lengths=lengths)


class Fade(Transform):
    def __init__(self, fade_in_len: int = 0, fade_out_len: int = 0,
                 fade_shape: str = "linear"):
        self.kw = dict(fade_in_len=fade_in_len,
                       fade_out_len=fade_out_len, fade_shape=fade_shape)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        return _ops.fade(x, **self.kw)


class Vol(Transform):
    """Volume change; ``gain_type`` ∈ amplitude|power|db."""

    def __init__(self, gain: float, gain_type: str = "amplitude"):
        import math
        if gain_type == "amplitude":
            if gain < 0:
                raise ValueError("amplitude gain must be non-negative")
            self.gain_db = 20.0 * math.log10(max(gain, 1e-12))
        elif gain_type == "power":
            if gain <= 0:
                raise ValueError("power gain must be positive")
            self.gain_db = 10.0 * math.log10(gain)
        elif gain_type == "db":
            self.gain_db = float(gain)
        else:
            raise ValueError("gain_type must be amplitude|power|db")
        self._config = (self.gain_db,)

    def __call__(self, x, params=None):
        import jax.numpy as jnp
        return jnp.clip(_ops.gain(x, self.gain_db), -1.0, 1.0)


class FrequencyMasking(Transform):
    """SpecAugment frequency mask; ``t(spec, key=key)``."""

    def __init__(self, freq_mask_param: int, mask_value: float = 0.0):
        self.param, self.value = freq_mask_param, mask_value
        self._config = (freq_mask_param, mask_value)

    def __call__(self, x, key=None, params=None):
        if key is None:
            raise TypeError("FrequencyMasking requires key=")
        return _ops.freq_mask(key, x, self.param, mask_value=self.value)


class TimeMasking(Transform):
    """SpecAugment time mask; ``t(spec, key=key)``."""

    def __init__(self, time_mask_param: int, mask_value: float = 0.0):
        self.param, self.value = time_mask_param, mask_value
        self._config = (time_mask_param, mask_value)

    def __call__(self, x, key=None, params=None):
        if key is None:
            raise TypeError("TimeMasking requires key=")
        return _ops.time_mask(key, x, self.param, mask_value=self.value)


class Preemphasis(Transform):
    def __init__(self, coeff: float = 0.97):
        self.coeff = coeff
        self._config = (coeff,)

    def __call__(self, x, params=None):
        return _ops.preemphasis(x, self.coeff)


class Deemphasis(Transform):
    def __init__(self, coeff: float = 0.97):
        self.coeff = coeff
        self._config = (coeff,)

    def __call__(self, x, params=None):
        return _ops.deemphasis(x, self.coeff)


class ComputeDeltas(Transform):
    def __init__(self, win_length: int = 5):
        self.win_length = win_length
        self._config = (win_length,)

    def __call__(self, x, params=None):
        return _ops.compute_deltas(x, self.win_length)


class SlidingWindowCmn(Transform):
    def __init__(self, cmn_window: int = 600,
                 min_cmn_window: int = 100, center: bool = False,
                 norm_vars: bool = False):
        self.kw = dict(cmn_window=cmn_window,
                       min_cmn_window=min_cmn_window, center=center,
                       norm_vars=norm_vars)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        return _ops.sliding_window_cmn(x, **self.kw)


class SpectralCentroid(Transform):
    """Waveform → per-frame spectral centroid (Hz)."""

    def __init__(self, sample_rate: int, fft_length: int = 400,
                 hop_length: int = 200):
        self.sample_rate = sample_rate
        self.fft_length, self.hop_length = fft_length, hop_length
        self._config = (sample_rate, fft_length, hop_length)

    def __call__(self, x, params=None):
        mag = _ops.complex_norm(
            _ops.stft(x, self.fft_length, self.hop_length))
        return _ops.spectral_centroid(mag, self.sample_rate)


class MelScale(Transform):
    """Linear-magnitude spectrogram ``(..., F, T)`` → mel
    ``(..., n_mels, T)`` (torchaudio's ``transforms.MelScale``: the
    filterbank GEMM alone, for users composing on a precomputed
    spectrogram — the derived matrix recomputes from config)."""

    def __init__(self, num_mels: int = 128, sample_rate: int = 22050,
                 f_min: float = 0.0, f_max: float | None = None,
                 num_bins: int = 201, mel_scale: str = "htk",
                 norm: str | None = None):
        self.kw = dict(num_mels=num_mels, sample_rate=sample_rate,
                       f_min=f_min, f_max=f_max, num_bins=num_bins,
                       mel_scale=mel_scale, norm=norm)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        fb = _ops.create_mel_filter(**self.kw)
        return _ops.apply_filterbank(x, fb)


class InverseMelScale(Transform):
    """Mel spectrogram → linear spectrogram (closed-form ridge GEMM)."""

    def __init__(self, num_bins: int, num_mels: int = 128,
                 sample_rate: int = 22050, f_min: float = 0.0,
                 f_max: float | None = None, ridge: float = 1e-8):
        self.kw = dict(num_bins=num_bins, num_mels=num_mels,
                       sample_rate=sample_rate, f_min=f_min,
                       f_max=f_max, ridge=ridge)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        inv = _ops.create_inverse_mel_filter(**self.kw)
        return _ops.mel_to_linear(x, inv)


class PSD(Transform):
    """Multichannel spec → PSD stack; ``t(spec, mask=mask)``."""

    def __init__(self, normalize: bool = True, eps: float = 1e-10):
        self.normalize, self.eps = normalize, eps
        self._config = (normalize, eps)

    def __call__(self, x, mask=None, params=None):
        return _ops.psd(x, mask, self.normalize, self.eps)


class SoudenMVDR(Transform):
    """``t(spec, psd_s, psd_n)`` → enhanced single-channel spec."""

    def __init__(self, reference_channel: int = 0,
                 diagonal_loading: bool = True, diag_eps: float = 1e-7):
        self.kw = dict(reference_channel=reference_channel,
                       diagonal_loading=diagonal_loading,
                       diag_eps=diag_eps)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, psd_s=None, psd_n=None, params=None):
        if psd_s is None or psd_n is None:
            raise TypeError("SoudenMVDR requires psd_s= and psd_n=")
        w = _ops.mvdr_weights_souden(psd_s, psd_n, **self.kw)
        return _ops.apply_beamforming(w, x)


class RTFMVDR(Transform):
    """``t(spec, rtf, psd_n)`` → enhanced single-channel spec."""

    def __init__(self, reference_channel: int = 0,
                 diagonal_loading: bool = True, diag_eps: float = 1e-7):
        self.kw = dict(reference_channel=reference_channel,
                       diagonal_loading=diagonal_loading,
                       diag_eps=diag_eps)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, rtf=None, psd_n=None, params=None):
        if rtf is None or psd_n is None:
            raise TypeError("RTFMVDR requires rtf= and psd_n=")
        w = _ops.mvdr_weights_rtf(rtf, psd_n, **self.kw)
        return _ops.apply_beamforming(w, x)


class Overdrive(Transform):
    def __init__(self, gain: float = 20.0, colour: float = 20.0):
        self.gain, self.colour = gain, colour
        self._config = (gain, colour)

    def __call__(self, x, params=None):
        return _ops.overdrive(x, self.gain, self.colour)


class Phaser(Transform):
    def __init__(self, sample_rate: float, **kwargs):
        self.sample_rate, self.kw = sample_rate, kwargs
        self._config = (sample_rate,) + tuple(sorted(kwargs.items()))

    def __call__(self, x, params=None):
        return _ops.phaser(x, self.sample_rate, **self.kw)


class Flanger(Transform):
    def __init__(self, sample_rate: float, **kwargs):
        self.sample_rate, self.kw = sample_rate, kwargs
        self._config = (sample_rate,) + tuple(sorted(kwargs.items()))

    def __call__(self, x, params=None):
        return _ops.flanger(x, self.sample_rate, **self.kw)


class Contrast(Transform):
    def __init__(self, enhancement_amount: float = 75.0):
        self.enhancement_amount = enhancement_amount
        self._config = (enhancement_amount,)

    def __call__(self, x, params=None):
        return _ops.contrast(x, self.enhancement_amount)


class Lowpass(Transform):
    def __init__(self, sample_rate: float, cutoff_freq: float,
                 Q: float = 0.707):
        self.kw = (sample_rate, cutoff_freq, Q)
        self._config = self.kw

    def __call__(self, x, params=None):
        return _ops.lowpass_biquad(x, *self.kw)


class Highpass(Transform):
    def __init__(self, sample_rate: float, cutoff_freq: float,
                 Q: float = 0.707):
        self.kw = (sample_rate, cutoff_freq, Q)
        self._config = self.kw

    def __call__(self, x, params=None):
        return _ops.highpass_biquad(x, *self.kw)


class Equalizer(Transform):
    def __init__(self, sample_rate: float, center_freq: float,
                 gain_db: float, Q: float = 0.707):
        self.kw = (sample_rate, center_freq, gain_db, Q)
        self._config = self.kw

    def __call__(self, x, params=None):
        return _ops.equalizer_biquad(x, *self.kw)


class Vad(Transform):
    """Voice activity detection (jit-able; see ``ops/vad.py`` for the
    API split).  ``mode="onset"`` (default) → per-clip onset sample
    index; ``mode="trim"`` → ``(trimmed, valid_length)`` fixed-shape
    trim (speech shifted to sample 0, zero-filled tail) so the
    torchaudio ``transforms.Vad`` semantic composes under ``jit``."""

    def __init__(self, sample_rate: int, mode: str = "onset",
                 **kwargs):
        if mode not in ("onset", "trim"):
            raise ValueError("mode must be 'onset' or 'trim'")
        self.sample_rate, self.mode, self.kw = sample_rate, mode, kwargs
        self._config = (sample_rate, mode) + tuple(sorted(kwargs.items()))

    def __call__(self, x, params=None):
        if self.mode == "trim":
            return _ops.vad_trim(x, self.sample_rate, **self.kw)
        return _ops.vad_onset(x, self.sample_rate, **self.kw)


class RNNTLoss(Transform):
    """Transducer loss wrapper over ``ops/rnnt.py::rnnt_loss``.

    ``__call__(logits, targets, logit_lengths, target_lengths)`` —
    a loss takes the lattice plus labels, so this transform departs
    from the single-``x`` call shape (as torchaudio's does)."""

    def __init__(self, blank: int = -1, clamp: float = -1.0,
                 reduction: str = "mean",
                 fused_log_softmax: bool = True):
        self.kw = dict(blank=blank, clamp=clamp, reduction=reduction,
                       fused_log_softmax=fused_log_softmax)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, logits, targets, logit_lengths=None,
                 target_lengths=None):
        return _ops.rnnt_loss(logits, targets, logit_lengths,
                              target_lengths, **self.kw)


class LFCC(Transform):
    """Waveform → LFCC (linear-frequency cepstra; ``ops/mfcc.py``)."""

    def __init__(self, sample_rate: int = 22050, n_lfcc: int = 20,
                 n_filter: int = 128, fft_length: int = 2048,
                 hop_length: int = 512, **kwargs):
        self.kw = dict(sample_rate=sample_rate, n_lfcc=n_lfcc,
                       n_filter=n_filter, fft_length=fft_length,
                       hop_length=hop_length, **kwargs)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        return _ops.lfcc(x, **self.kw)


class Convolve(Transform):
    """Direct convolution with a second signal (``__call__(x, y)``)."""

    def __init__(self, mode: str = "full"):
        self.mode = mode
        self._config = (mode,)

    def __call__(self, x, y, params=None):
        return _ops.convolve(x, y, mode=self.mode)


class FFTConvolve(Transform):
    """FFT convolution with a second signal (``__call__(x, y)``)."""

    def __init__(self, mode: str = "full"):
        self.mode = mode
        self._config = (mode,)

    def __call__(self, x, y, params=None):
        return _ops.fftconvolve(x, y, mode=self.mode)


class SpeedPerturbation(Transform):
    """Random tape-speed augmentation: each call picks one factor from
    ``factors`` with the explicit PRNG ``key`` and applies
    ``ops.speed``.  The factor choice is made EAGERLY (each factor has
    its own static resample ratio, hence its own compiled program), so
    wrap the chosen-factor call in jit, not this dispatcher."""

    def __init__(self, orig_freq: int, factors):
        self.orig_freq = orig_freq
        self.factors = tuple(float(f) for f in factors)
        if not self.factors or any(f <= 0 for f in self.factors):
            raise ValueError("factors must be a non-empty positive list")
        self._config = (orig_freq,) + self.factors

    def __call__(self, x, key, lengths=None, params=None):
        import jax as _jax
        i = int(_jax.random.randint(key, (), 0, len(self.factors)))
        return _ops.speed(x, self.orig_freq, self.factors[i],
                          lengths=lengths)
