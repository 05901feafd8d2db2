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
    "AmplitudeToDB", "MelSpectrogram", "TimeStretch", "SpecAugment",
    "MVDR",
    "BarkScale", "InverseBarkScale", "BarkSpectrogram",
    "ChromaScale", "ChromaSpectrogram",
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


class AmplitudeToDB(Transform):
    """torchaudio-named dB transform: ``stype`` ∈ power|magnitude
    picks the 10·/20·log10 multiplier (the house ``AmplitudeToDb``
    layer derives the same from ``power=``); ``top_db`` clamps to each
    spectrogram's peak."""

    def __init__(self, stype: str = "power",
                 top_db: float | None = None):
        if stype not in ("power", "magnitude"):
            raise ValueError("stype must be 'power' or 'magnitude'")
        self.multiplier = 10.0 if stype == "power" else 20.0
        self.top_db = top_db
        self._config = (stype, top_db)

    def __call__(self, x, params=None):
        return _ops.amplitude_to_DB(x, self.multiplier, 1e-10, 0.0,
                                    self.top_db)


class MelSpectrogram(Transform):
    """torchaudio-named/argumented mel spectrogram (``n_fft``/
    ``n_mels``/``window_fn`` spelling; the house factory is
    ``Melspectrogram()`` with reference-style names).  ``pad`` zero-pads
    the waveform on both sides before the STFT, as torchaudio does."""

    def __init__(self, sample_rate: int = 16000, n_fft: int = 400,
                 win_length: int | None = None,
                 hop_length: int | None = None,
                 f_min: float = 0.0, f_max: float | None = None,
                 pad: int = 0, n_mels: int = 128, window_fn=None,
                 power: float = 2.0, normalized: bool = False,
                 center: bool = True, pad_mode: str = "reflect",
                 norm: str | None = None, mel_scale: str = "htk",
                 onesided: bool = True):
        if not onesided:
            raise ValueError("MelSpectrogram requires onesided=True")
        self.pad = int(pad)
        self.window_fn = window_fn
        if hop_length is None:
            # torchaudio: hop defaults to win_length // 2 (win_length
            # itself defaulting to n_fft), NOT n_fft // 2
            hop_length = (n_fft if win_length is None
                          else win_length) // 2
        self.kw = dict(
            num_mels=n_mels, sample_rate=sample_rate, f_min=f_min,
            f_max=f_max, mel_scale=mel_scale, norm=norm, power=power,
            fft_length=n_fft, hop_length=hop_length,
            win_length=win_length, center=center, pad_mode=pad_mode,
            normalized=normalized)
        self._config = (self.pad, window_fn,
                        tuple(sorted(self.kw.items())))

    def __call__(self, x, params=None):
        import jax.numpy as jnp
        if self.pad:
            cfg = [(0, 0)] * (x.ndim - 1) + [(self.pad, self.pad)]
            x = jnp.pad(x, cfg)
        window = None
        if self.window_fn is not None:
            wl = self.kw["win_length"] or self.kw["fft_length"]
            window = jnp.asarray(self.window_fn(wl))
        return _ops.melspectrogram(x, window=window, **self.kw)


class TimeStretch(Transform):
    """torchaudio-named phase-vocoder stretch on COMPLEX spectrograms:
    ``t(spec)`` at the fixed rate, or ``t(spec,
    overriding_rate=r)`` (the house layer is ``StretchSpecTime``,
    which derives the phase advance from STFT config)."""

    def __init__(self, hop_length: int | None = None,
                 n_freq: int = 201, fixed_rate: float | None = None):
        self.n_freq = n_freq
        self.hop = hop_length if hop_length is not None \
            else (n_freq - 1)  # torchaudio default: n_fft // 2
        self.fixed_rate = fixed_rate
        self._config = (self.hop, n_freq, fixed_rate)

    def __call__(self, x, overriding_rate=None, params=None):
        rate = overriding_rate if overriding_rate is not None \
            else self.fixed_rate
        if rate is None:
            raise ValueError(
                "TimeStretch built without fixed_rate needs "
                "overriding_rate=")
        if x.shape[-2] != self.n_freq:
            raise ValueError(
                f"spec has {x.shape[-2]} freq bins, transform built "
                f"for n_freq={self.n_freq}")
        if float(rate) == 1.0:
            return x
        # torchaudio's linspace(0, pi*hop, n_freq) IS hop*2*pi*f/n_fft
        advance = _ops.compute_phase_advance(
            self.n_freq, self.hop, 2 * (self.n_freq - 1))
        return _ops.phase_vocoder(x, float(rate), advance)


class SpecAugment(Transform):
    """torchaudio-named SpecAugment (mask-only form, Park et al.
    2019): ``n_time_masks`` time masks of width ≤
    ``min(time_mask_param, p·T)`` and ``n_freq_masks`` frequency masks
    of width ≤ ``freq_mask_param``; ``t(spec, key=key)``.
    ``iid_masks`` samples independent masks per leading-batch element
    (needs ``spec.ndim >= 3``); ``zero_masking=False`` fills with each
    spectrogram's mean instead of zero."""

    def __init__(self, n_time_masks: int, time_mask_param: int,
                 n_freq_masks: int, freq_mask_param: int,
                 iid_masks: bool = True, p: float = 1.0,
                 zero_masking: bool = True):
        if not 0.0 <= p <= 1.0:
            raise ValueError("p must be in [0, 1]")
        self.cfg = (int(n_time_masks), int(time_mask_param),
                    int(n_freq_masks), int(freq_mask_param),
                    bool(iid_masks), float(p), bool(zero_masking))
        self._config = self.cfg

    def __call__(self, x, key=None, params=None):
        import jax
        import jax.numpy as jnp
        if key is None:
            raise TypeError("SpecAugment requires key=")
        (n_t, t_param, n_f, f_param, iid, p, zero) = self.cfg
        t_param = min(t_param, int(p * x.shape[-1]))
        # torchaudio fills with the GLOBAL mean when not zero-masking
        val = 0.0 if zero else jnp.mean(x)
        kt, kf = jax.random.split(key)

        def one(spec, kt, kf):
            out = spec
            if n_t and t_param > 0:
                out = _ops.time_mask(kt, out, t_param, num_masks=n_t,
                                     mask_value=val)
            if n_f and f_param > 0:
                out = _ops.freq_mask(kf, out, f_param, num_masks=n_f,
                                     mask_value=val)
            return out

        if iid and x.ndim >= 3:
            B = x.shape[0]
            return jax.vmap(one)(x, jax.random.split(kt, B),
                                 jax.random.split(kf, B))
        return one(x, kt, kf)


class MVDR(Transform):
    """torchaudio's classic ``transforms.MVDR``: ``t(spec, mask_s,
    mask_n)`` — PSDs from time-frequency masks, then MVDR weights by
    ``solution`` ∈ ref_channel (Souden) | stv_evd | stv_power
    (steering-vector estimates + RTF formula) → enhanced
    single-channel complex spec.  The composable pieces are
    ``PSD``/``SoudenMVDR``/``RTFMVDR``; ``online=True`` (recursive
    PSD updates) is not provided."""

    def __init__(self, ref_channel: int = 0,
                 solution: str = "ref_channel",
                 multi_mask: bool = False,
                 diag_loading: bool = True, diag_eps: float = 1e-7,
                 online: bool = False):
        if solution not in ("ref_channel", "stv_evd", "stv_power"):
            raise ValueError(
                "solution must be ref_channel|stv_evd|stv_power")
        if online:
            raise NotImplementedError(
                "online (recursive) MVDR is not provided — compute "
                "PSDs per block and rebuild weights instead")
        self.kw = dict(ref_channel=int(ref_channel), solution=solution,
                       multi_mask=bool(multi_mask),
                       diag_loading=bool(diag_loading),
                       diag_eps=float(diag_eps))
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, mask_s=None, mask_n=None, params=None):
        import jax.numpy as jnp
        if mask_s is None or mask_n is None:
            raise TypeError("MVDR requires mask_s= and mask_n=")
        if self.kw["multi_mask"]:
            # (..., channel, freq, time) masks: average over channels
            mask_s = jnp.mean(mask_s, axis=-3)
            mask_n = jnp.mean(mask_n, axis=-3)
        psd_s = _ops.psd(x, mask_s)
        psd_n = _ops.psd(x, mask_n)
        ref, sol = self.kw["ref_channel"], self.kw["solution"]
        dl, de = self.kw["diag_loading"], self.kw["diag_eps"]
        if sol == "ref_channel":
            w = _ops.mvdr_weights_souden(psd_s, psd_n,
                                         reference_channel=ref,
                                         diagonal_loading=dl,
                                         diag_eps=de)
        else:
            if sol == "stv_evd":
                rtf = _ops.rtf_evd(psd_s, reference_channel=ref)
            else:
                rtf = _ops.rtf_power(psd_s, psd_n,
                                     reference_channel=ref,
                                     diagonal_loading=dl, diag_eps=de)
            w = _ops.mvdr_weights_rtf(rtf, psd_n,
                                      reference_channel=ref,
                                      diagonal_loading=dl, diag_eps=de)
        return _ops.apply_beamforming(w, x)


class BarkScale(Transform):
    """Linear-magnitude spectrogram ``(..., F, T)`` → bark
    ``(..., n_barks, T)`` (torchaudio prototype ``BarkScale``: the
    bark-filterbank GEMM alone)."""

    def __init__(self, n_stft: int = 201, sample_rate: int = 16000,
                 f_min: float = 0.0, f_max: float | None = None,
                 n_barks: int = 128, bark_scale: str = "traunmuller"):
        self.kw = dict(n_barks=n_barks, sample_rate=sample_rate,
                       f_min=f_min, f_max=f_max, num_bins=n_stft,
                       bark_scale=bark_scale)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        fb = _ops.create_bark_filter(**self.kw)
        return _ops.apply_filterbank(x, fb)


class InverseBarkScale(Transform):
    """Bark spectrogram → linear spectrogram.  torchaudio's prototype
    solves this by SGD; here it is the same closed-form ridge
    pseudo-inverse GEMM as :class:`InverseMelScale`
    (``create_inverse_bark_filter`` — float64 solve cached at trace
    time, clamped at 0) — a deliberate TPU-first divergence, one
    matmul instead of an optimization loop."""

    def __init__(self, n_stft: int, n_barks: int = 128,
                 sample_rate: int = 16000, f_min: float = 0.0,
                 f_max: float | None = None,
                 bark_scale: str = "traunmuller", ridge: float = 1e-8):
        self.kw = dict(n_barks=n_barks, sample_rate=sample_rate,
                       f_min=f_min, f_max=f_max, num_bins=n_stft,
                       bark_scale=bark_scale, ridge=ridge)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        inv = _ops.create_inverse_bark_filter(**self.kw)
        return _ops.mel_to_linear(x, inv)


class ChromaScale(Transform):
    """Spectrogram ``(..., F, T)`` → pitch-class chroma
    ``(..., n_chroma, T)`` (torchaudio prototype ``ChromaScale``)."""

    def __init__(self, sample_rate: int = 16000, n_freqs: int = 201,
                 n_chroma: int = 12, tuning: float = 0.0,
                 ctroct: float = 5.0, octwidth: float | None = 2.0,
                 norm: int | None = 2, base_c: bool = True):
        self.kw = dict(n_chroma=n_chroma, sample_rate=sample_rate,
                       num_bins=n_freqs, tuning=tuning, ctroct=ctroct,
                       octwidth=octwidth, base_c=base_c, norm=norm)
        self._config = tuple(sorted(self.kw.items()))

    def __call__(self, x, params=None):
        fb = _ops.create_chroma_filter(**self.kw)
        return _ops.apply_filterbank(x, fb)


class _SpectrogramFilterbank(Transform):
    """Shared plumbing for the torchaudio-named waveform →
    filterbank-spectrogram transforms (pad, ``window_fn``
    materialization, torchaudio's ``hop = win_length // 2`` default,
    spectrogram → one filterbank GEMM); subclasses supply the
    filterbank factory + its kwargs."""

    _fb_factory = None                   # staticmethod in subclasses

    def __init__(self, n_fft: int, win_length: int | None,
                 hop_length: int | None, pad: int, window_fn,
                 power: float, normalized: bool, center: bool,
                 pad_mode: str, fb_kw: dict):
        self.pad = int(pad)
        self.window_fn = window_fn
        if hop_length is None:
            # torchaudio: hop defaults to win_length // 2 (win_length
            # itself defaulting to n_fft), NOT n_fft // 2
            hop_length = (n_fft if win_length is None
                          else win_length) // 2
        self.spec_kw = dict(
            fft_length=n_fft, hop_length=hop_length,
            win_length=win_length, center=center, pad_mode=pad_mode,
            normalized=normalized, power=power)
        self.fb_kw = dict(fb_kw, num_bins=n_fft // 2 + 1)
        self._config = (self.pad, window_fn,
                        tuple(sorted(self.spec_kw.items())),
                        tuple(sorted(self.fb_kw.items())))

    def __call__(self, x, params=None):
        import jax.numpy as jnp
        if self.pad:
            cfg = [(0, 0)] * (x.ndim - 1) + [(self.pad, self.pad)]
            x = jnp.pad(x, cfg)
        kw = dict(self.spec_kw)
        if self.window_fn is not None:
            wl = kw["win_length"] or kw["fft_length"]
            kw["window"] = jnp.asarray(self.window_fn(wl))
        spec = _ops.spectrogram(x, **kw)
        return _ops.apply_filterbank(
            spec, type(self)._fb_factory(**self.fb_kw))


class BarkSpectrogram(_SpectrogramFilterbank):
    """torchaudio-prototype-named bark spectrogram (``n_fft``/
    ``n_barks`` spelling; the house factory is ``Barkspectrogram()``)."""

    _fb_factory = staticmethod(_ops.create_bark_filter)

    def __init__(self, sample_rate: int = 16000, n_fft: int = 400,
                 win_length: int | None = None,
                 hop_length: int | None = None,
                 f_min: float = 0.0, f_max: float | None = None,
                 pad: int = 0, n_barks: int = 128, window_fn=None,
                 power: float = 2.0, normalized: bool = False,
                 center: bool = True, pad_mode: str = "reflect",
                 bark_scale: str = "traunmuller"):
        super().__init__(
            n_fft, win_length, hop_length, pad, window_fn, power,
            normalized, center, pad_mode,
            dict(n_barks=n_barks, sample_rate=sample_rate,
                 f_min=f_min, f_max=f_max, bark_scale=bark_scale))


class ChromaSpectrogram(_SpectrogramFilterbank):
    """torchaudio-prototype-named chromagram: spectrogram +
    chroma-filterbank GEMM (the house factory is ``Chromagram()``)."""

    _fb_factory = staticmethod(_ops.create_chroma_filter)

    def __init__(self, sample_rate: int = 16000, n_fft: int = 400,
                 win_length: int | None = None,
                 hop_length: int | None = None, pad: int = 0,
                 window_fn=None, power: float = 2.0,
                 normalized: bool = False, center: bool = True,
                 pad_mode: str = "reflect", n_chroma: int = 12,
                 tuning: float = 0.0, ctroct: float = 5.0,
                 octwidth: float | None = 2.0, norm: int | None = 2,
                 base_c: bool = True):
        super().__init__(
            n_fft, win_length, hop_length, pad, window_fn, power,
            normalized, center, pad_mode,
            dict(n_chroma=n_chroma, sample_rate=sample_rate,
                 tuning=tuning, ctroct=ctroct, octwidth=octwidth,
                 base_c=base_c, norm=norm))
