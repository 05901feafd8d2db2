"""Layer API: composable transform objects + pipeline factories.

Capability parity with [ref: torchaudio_contrib/layers.py — UNVERIFIED]:
``STFT``, ``ComplexNorm``, ``Filterbank``/``MelFilterbank``,
``ApplyFilterbank``, ``AmplitudeToDb``, ``DbToAmplitude``,
``MuLawEncoding``, ``MuLawDecoding``, ``StretchSpecTime``, plus the
``Spectrogram`` / ``Melspectrogram`` factories returning a composable
pipeline (the reference returns ``nn.Sequential``).

TPU-first redesign (not a port of nn.Module)
--------------------------------------------
* Transforms are **immutable, hashable config objects** whose ``__call__``
  is pure.  They can close over ``jit`` (becoming compile-time constants)
  or be passed as static args — no mutable module state, no device moves.
* Derived arrays (window, filterbank, phase-advance) are recomputed from
  config, **never serialized** — the same contract the reference enforces
  with ``_ModuleNoStateBuffers`` [ref: layers.py::_ModuleNoStateBuffers —
  UNVERIFIED]; here it falls out of the functional design: ``state_dict()``
  returns only *trainable* leaves (empty for every stateless transform).
* Trainable frontends use the explicit-params path idiomatic to JAX:
  ``params = pipe.init_params()`` → ``pipe(x, params=params)`` →
  ``jax.grad`` w.r.t. ``params``.  With ``params=None`` every stage uses
  its config-derived constant.
"""
from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.stft import stft as _stft_fn, istft as _istft_fn
from ..ops.fused import fused_melspectrogram as _fused_mel
from ..ops.resample import resample as _resample
from ..ops.griffinlim import griffin_lim as _griffin_lim
from ..ops import (
    complex_norm as _complex_norm,
    apply_filterbank as _apply_filterbank,
    create_mel_filter,
    create_chroma_filter as _create_chroma_filter,
    amplitude_to_db as _amplitude_to_db,
    db_to_amplitude as _db_to_amplitude,
    mu_law_encoding as _mu_law_encoding,
    mu_law_decoding as _mu_law_decoding,
    phase_vocoder as _phase_vocoder,
    compute_phase_advance,
)

__all__ = [
    "Transform", "Pipeline",
    "STFT", "ISTFT", "ComplexNorm",
    "Filterbank", "MelFilterbank", "BarkFilterbank",
    "ChromaFilterbank", "ApplyFilterbank",
    "AmplitudeToDb", "DbToAmplitude",
    "MuLawEncoding", "MuLawDecoding",
    "StretchSpecTime", "Resample", "GriffinLim",
    "Spectrogram", "Melspectrogram", "FusedMelspectrogram",
    "Barkspectrogram", "Chromagram",
]


class Transform:
    """Base: an immutable, hashable, pure-callable audio transform.

    Subclasses set ``_config`` (a tuple of hashables) in ``__init__``;
    equality/hashing derive from it so transforms are safe ``jit`` static
    arguments and dict keys.
    """

    _config: tuple = ()

    # -- trainable-params protocol -------------------------------------
    def init_params(self):
        """Trainable parameter pytree for this transform (None if stateless)."""
        return None

    def state_dict(self):
        """Only trainable leaves are checkpoint-visible (the
        ``_ModuleNoStateBuffers`` contract): derived buffers are excluded
        by construction."""
        p = self.init_params()
        return {} if p is None else {"params": p}

    # -- call ------------------------------------------------------------
    def __call__(self, x, params=None):
        raise NotImplementedError

    # -- identity --------------------------------------------------------
    def __eq__(self, other):
        return type(self) is type(other) and self._config == other._config

    def __hash__(self):
        return hash((type(self).__name__, self._config))

    def __repr__(self):
        cfg = ", ".join(repr(c) for c in self._config)
        return f"{type(self).__name__}({cfg})"


def _hashable_window(window):
    if window is None or isinstance(window, str):
        return window
    if callable(window):
        return window
    return tuple(np.asarray(window, dtype=np.float64).tolist())


class STFT(Transform):
    """Short-time Fourier transform layer.  Window derives from config per
    call (constant-folded under jit) — never stored, never serialized.
    [ref: layers.py::STFT — UNVERIFIED]"""

    def __init__(self, fft_length: int, hop_length: Optional[int] = None,
                 win_length: Optional[int] = None, window="hann",
                 center: bool = True, pad_mode: str = "reflect",
                 normalized: bool = False, onesided: bool = True,
                 method: str = "fft"):
        self.fft_length = fft_length
        self.hop_length = hop_length if hop_length is not None else fft_length // 4
        self.win_length = win_length if win_length is not None else fft_length
        self.window = window
        self.center = center
        self.pad_mode = pad_mode
        self.normalized = normalized
        self.onesided = onesided
        self.method = method
        self._config = (fft_length, self.hop_length, self.win_length,
                        _hashable_window(window), center, pad_mode,
                        normalized, onesided, method)

    @property
    def num_freqs(self) -> int:
        return self.fft_length // 2 + 1 if self.onesided else self.fft_length

    def __call__(self, waveform, params=None):
        return _stft_fn(
            waveform, self.fft_length, self.hop_length, self.win_length,
            self.window, self.center, self.pad_mode, self.normalized,
            self.onesided, method=self.method)


class ISTFT(Transform):
    """Inverse STFT layer (rebuild extra; functional istft per SURVEY §2 #2)."""

    def __init__(self, fft_length: Optional[int] = None,
                 hop_length: Optional[int] = None,
                 win_length: Optional[int] = None, window="hann",
                 center: bool = True, normalized: bool = False,
                 onesided: bool = True, length: Optional[int] = None):
        self.fft_length = fft_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.window = window
        self.center = center
        self.normalized = normalized
        self.onesided = onesided
        self.length = length
        self._config = (fft_length, hop_length, win_length,
                        _hashable_window(window), center, normalized,
                        onesided, length)

    def __call__(self, stft_matrix, params=None):
        return _istft_fn(
            stft_matrix, self.hop_length, self.win_length, self.window,
            self.center, self.normalized, self.onesided, self.length,
            self.fft_length)


class InverseSpectrogram(ISTFT):
    """torchaudio-named alias of :class:`ISTFT` (complex spectrogram
    → waveform; ``transforms.InverseSpectrogram``)."""


class ComplexNorm(Transform):
    """Magnitude/power of a complex spectrogram.
    [ref: layers.py::ComplexNorm — UNVERIFIED]"""

    def __init__(self, power: float = 1.0):
        self.power = power
        self._config = (power,)

    def __call__(self, spec, params=None):
        return _complex_norm(spec, self.power)


class Filterbank(Transform):
    """Abstract filterbank provider: subclasses implement
    ``get_filterbank() -> (num_bins, num_banks)``.
    [ref: layers.py::Filterbank — UNVERIFIED]"""

    def get_filterbank(self) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, x, params=None):
        fb = params if params is not None else self.get_filterbank()
        return _apply_filterbank(x, fb)


class MelFilterbank(Filterbank):
    """Triangular mel filterbank, built in float64 from config.
    Defaults to the reference's HTK scale with no normalization
    [ref: layers.py::MelFilterbank — UNVERIFIED]; ``mel_scale=
    "slaney"``/``norm="slaney"`` select the librosa-default variant."""

    def __init__(self, num_mels: int = 128, sample_rate: float = 22050,
                 f_min: float = 0.0, f_max: Optional[float] = None,
                 num_bins: int = 1025, mel_scale: str = "htk",
                 norm: Optional[str] = None, dtype=jnp.float32):
        self.num_mels = num_mels
        self.sample_rate = sample_rate
        self.f_min = f_min
        self.f_max = f_max if f_max is not None else sample_rate / 2.0
        self.num_bins = num_bins
        self.mel_scale = mel_scale
        self.norm = norm
        self.dtype = dtype
        self._config = (num_mels, sample_rate, f_min, self.f_max, num_bins,
                        mel_scale, norm, str(jnp.dtype(dtype)))

    def get_filterbank(self) -> jnp.ndarray:
        return create_mel_filter(self.num_mels, self.sample_rate,
                                 self.f_min, self.f_max, self.num_bins,
                                 mel_scale=self.mel_scale,
                                 norm=self.norm, dtype=self.dtype)


class BarkFilterbank(Filterbank):
    """Triangular Bark-scale filterbank (rebuild-only; torchaudio's
    ``barkscale_fbanks`` capability).  Same splice points as
    :class:`MelFilterbank`."""

    def __init__(self, n_barks: int = 128, sample_rate: float = 22050,
                 f_min: float = 0.0, f_max: Optional[float] = None,
                 num_bins: int = 1025, bark_scale: str = "traunmuller",
                 dtype=jnp.float32):
        self.n_barks = n_barks
        self.sample_rate = sample_rate
        self.f_min = f_min
        self.f_max = f_max if f_max is not None else sample_rate / 2.0
        self.num_bins = num_bins
        self.bark_scale = bark_scale
        self.dtype = dtype
        self._config = (n_barks, sample_rate, f_min, self.f_max,
                        num_bins, bark_scale, str(jnp.dtype(dtype)))

    def get_filterbank(self) -> jnp.ndarray:
        from ..ops.filters import create_bark_filter
        return create_bark_filter(self.n_barks, self.sample_rate,
                                  self.f_min, self.f_max,
                                  self.num_bins,
                                  bark_scale=self.bark_scale,
                                  dtype=self.dtype)


class ChromaFilterbank(Filterbank):
    """Gaussian pitch-class filterbank (rebuild-only; librosa-style).

    Drops into the same slots as :class:`MelFilterbank` — splice into a
    :func:`Spectrogram` pipeline via :class:`ApplyFilterbank` (trainable
    path included) to get a chromagram frontend.
    """

    def __init__(self, n_chroma: int = 12, sample_rate: float = 22050,
                 num_bins: int = 1025, tuning: float = 0.0,
                 base_c: bool = True, dtype=jnp.float32):
        self.n_chroma = n_chroma
        self.sample_rate = sample_rate
        self.num_bins = num_bins
        self.tuning = tuning
        self.base_c = base_c
        self.dtype = dtype
        self._config = (n_chroma, sample_rate, num_bins, tuning, base_c,
                        str(jnp.dtype(dtype)))

    def get_filterbank(self) -> jnp.ndarray:
        return _create_chroma_filter(self.n_chroma, self.sample_rate,
                                     self.num_bins, tuning=self.tuning,
                                     base_c=self.base_c, dtype=self.dtype)


class ApplyFilterbank(Transform):
    """Project ``(..., freq, time)`` through a filterbank GEMM.

    ``trainable=True`` exposes the matrix as a parameter pytree
    (``init_params()``) so gradients flow into it — the reference's
    "trainable filterbank spliced into the Sequential" use case.
    [ref: layers.py::ApplyFilterbank — UNVERIFIED]"""

    def __init__(self, filterbank, trainable: bool = False):
        if isinstance(filterbank, Filterbank):
            self._fb_source = filterbank
            self._fb_array = None
            fb_key = filterbank
        else:
            self._fb_source = None
            self._fb_array = jnp.asarray(filterbank)
            # key by full content: transforms document themselves as safe
            # jit static args / dict keys, so two different filterbanks
            # must never hash equal (mel matrices all start with ~0s — a
            # prefix sample would collide and serve stale compilations)
            arr = np.ascontiguousarray(np.asarray(self._fb_array,
                                                  np.float64))
            fb_key = (arr.shape,
                      hashlib.sha256(arr.tobytes()).hexdigest())
        self.trainable = trainable
        self._config = (fb_key, trainable)

    def filterbank(self) -> jnp.ndarray:
        if self._fb_array is not None:
            return self._fb_array
        return self._fb_source.get_filterbank()

    def init_params(self):
        return self.filterbank() if self.trainable else None

    def __call__(self, x, params=None):
        fb = params if params is not None else self.filterbank()
        return _apply_filterbank(x, fb)


class AmplitudeToDb(Transform):
    """[ref: layers.py::AmplitudeToDb — UNVERIFIED]"""

    def __init__(self, ref: float = 1.0, amin: float = 1e-7,
                 power: float = 1.0):
        self.ref, self.amin, self.power = ref, amin, power
        self._config = (ref, amin, power)

    def __call__(self, x, params=None):
        return _amplitude_to_db(x, self.ref, self.amin, self.power)


class DbToAmplitude(Transform):
    """[ref: layers.py::DbToAmplitude — UNVERIFIED]"""

    def __init__(self, ref: float = 1.0, power: float = 1.0):
        self.ref, self.power = ref, power
        self._config = (ref, power)

    def __call__(self, x, params=None):
        return _db_to_amplitude(x, self.ref, self.power)


class MuLawEncoding(Transform):
    """[ref: layers.py::MuLawEncoding — UNVERIFIED]"""

    def __init__(self, n_quantize: int = 256):
        self.n_quantize = n_quantize
        self._config = (n_quantize,)

    def __call__(self, x, params=None):
        return _mu_law_encoding(x, self.n_quantize)


class MuLawDecoding(Transform):
    """[ref: layers.py::MuLawDecoding — UNVERIFIED]"""

    def __init__(self, n_quantize: int = 256):
        self.n_quantize = n_quantize
        self._config = (n_quantize,)

    def __call__(self, x, params=None):
        return _mu_law_decoding(x, self.n_quantize)


class Resample(Transform):
    """Rational-ratio polyphase resampler layer (rebuild extra; see
    ops/resample.py — one MXU convolution)."""

    def __init__(self, orig_freq: int, new_freq: int, zeros: int = 24,
                 beta: float = 14.769656459379492):
        self.orig_freq = orig_freq
        self.new_freq = new_freq
        self.zeros = zeros
        self.beta = beta
        self._config = (orig_freq, new_freq, zeros, beta)

    def __call__(self, waveform, params=None):
        return _resample(waveform, self.orig_freq, self.new_freq,
                         self.zeros, self.beta)


class StretchSpecTime(Transform):
    """Phase-vocoder time stretch with config-derived phase advance.
    [ref: layers.py::StretchSpecTime — UNVERIFIED, name low-confidence]"""

    def __init__(self, rate: float, hop_length: int = 512,
                 num_freqs: int = 1025):
        self.rate = rate
        self.hop_length = hop_length
        self.num_freqs = num_freqs
        self._config = (rate, hop_length, num_freqs)

    def __call__(self, spec, params=None, rate: Optional[float] = None):
        r = rate if rate is not None else self.rate
        adv = compute_phase_advance(self.num_freqs, self.hop_length)
        return _phase_vocoder(spec, r, adv)


class GriffinLim(Transform):
    """Griffin-Lim phase-reconstruction layer (rebuild extra; see
    ops/griffinlim.py).  ``__call__`` takes a magnitude spectrogram
    ``(..., freq, time)`` and an optional ``key=`` for random phase init."""

    def __init__(self, fft_length: Optional[int] = None,
                 hop_length: Optional[int] = None, window="hann",
                 n_iter: int = 32, momentum: float = 0.99,
                 length: Optional[int] = None, center: bool = True,
                 method: str = "fft"):
        self.fft_length = fft_length
        self.hop_length = hop_length
        self.window = window
        self.n_iter = n_iter
        self.momentum = momentum
        self.length = length
        self.center = center
        self.method = method
        self._config = (fft_length, hop_length, _hashable_window(window),
                        n_iter, momentum, length, center, method)

    def __call__(self, mag_specgrams, params=None, key=None):
        return _griffin_lim(mag_specgrams, self.fft_length,
                            self.hop_length, self.window, self.n_iter,
                            self.momentum, self.length, self.center,
                            key, self.method)


class Pipeline(Transform):
    """Sequential composition — the reference's ``nn.Sequential`` analog.

    Indexable/iterable/sliceable so users can splice custom stages
    (e.g. swap in a trainable filterbank) exactly as the reference's
    Sequential composition allows.  ``params`` threads per-stage trainable
    pytrees as a tuple aligned with the stages.
    """

    def __init__(self, *transforms: Transform):
        self.transforms = tuple(transforms)
        self._config = self.transforms

    def init_params(self):
        ps = tuple(t.init_params() for t in self.transforms)
        return None if all(p is None for p in ps) else ps

    def __call__(self, x, params=None):
        if params is None:
            params = (None,) * len(self.transforms)
        for t, p in zip(self.transforms, params):
            x = t(x, params=p)
        return x

    def __iter__(self):
        return iter(self.transforms)

    def __len__(self):
        return len(self.transforms)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return Pipeline(*self.transforms[i])
        return self.transforms[i]


class FusedMelspectrogram(Transform):
    """Single-kernel log-mel transform (the TPU fast path).

    Computes the same STFT→|·|²→mel[→dB] chain as
    ``Melspectrogram(...)`` + ``AmplitudeToDb`` but as ONE fused Pallas
    program on TPU (see ops/fused.py; ~2.5× the jitted XLA chain at
    parity precision, ~4.4× in ``precision="fast"``).  Default
    ``center=False`` frame semantics (streaming-compatible);
    ``center=True`` reflect-pads XLA-side for frame-for-frame parity
    with the ``Melspectrogram()`` pipeline.  Off-TPU or for unsupported
    configs it transparently runs the XLA chain.  Differentiable.
    """

    def __init__(self, num_mels: int = 128, sample_rate: float = 22050,
                 f_min: float = 0.0, f_max: Optional[float] = None,
                 fft_length: int = 2048, hop_length: int = 512,
                 window="hann", power: float = 2.0, to_db: bool = True,
                 db_ref: float = 1.0, amin: float = 1e-7,
                 precision: str = "auto", trainable: bool = False,
                 win_length: Optional[int] = None, center: bool = False,
                 pad_mode: str = "reflect"):
        self.num_mels = num_mels
        self.sample_rate = sample_rate
        self.f_min = f_min
        self.f_max = f_max if f_max is not None else sample_rate / 2.0
        self.fft_length = fft_length
        self.hop_length = hop_length
        self.window = window
        self.power = power
        self.to_db = to_db
        self.db_ref = db_ref
        self.amin = amin
        self.precision = precision
        self.trainable = trainable
        self.win_length = win_length
        self.center = center
        self.pad_mode = pad_mode
        self._config = (num_mels, sample_rate, f_min, self.f_max,
                        fft_length, hop_length, _hashable_window(window),
                        power, to_db, db_ref, amin, precision, trainable,
                        win_length, center, pad_mode)

    def filterbank(self) -> jnp.ndarray:
        return create_mel_filter(self.num_mels, self.sample_rate,
                                 self.f_min, self.f_max,
                                 self.fft_length // 2 + 1)

    def init_params(self):
        return self.filterbank() if self.trainable else None

    def __call__(self, waveform, params=None):
        fb = params if params is not None else self.filterbank()
        return _fused_mel(waveform, fb, self.fft_length, self.hop_length,
                          self.window, self.power, self.to_db,
                          self.db_ref, self.amin, self.precision,
                          self.win_length, center=self.center,
                          pad_mode=self.pad_mode)


def Spectrogram(power: float = 1.0, **stft_kwargs) -> Pipeline:
    """``Pipeline(STFT, ComplexNorm(power))`` factory.
    [ref: layers.py::Spectrogram — UNVERIFIED]"""
    fft_length = stft_kwargs.pop("fft_length", 2048)
    return Pipeline(STFT(fft_length, **stft_kwargs), ComplexNorm(power))


def Melspectrogram(num_mels: int = 128,
                   sample_rate: float = 22050,
                   f_min: float = 0.0,
                   f_max: Optional[float] = None,
                   num_bins: Optional[int] = None,
                   filterbank: Optional[Filterbank] = None,
                   trainable: bool = False,
                   fused: bool = False,
                   **spectrogram_kwargs) -> Pipeline:
    """``Pipeline(STFT, ComplexNorm(2), ApplyFilterbank)`` factory.

    ``power`` defaults to 2 (the reference's Melspectrogram default);
    pass a custom ``filterbank`` object to swap scales, or
    ``trainable=True`` to expose the mel matrix as a parameter.
    [ref: layers.py::Melspectrogram — UNVERIFIED]

    ``fused=True`` returns the same computation as a single-stage
    ``Pipeline(FusedMelspectrogram)`` running the one-kernel TPU fast
    path with identical (center=True by default) frame semantics —
    a drop-in ~2.5× speedup when you don't need to splice custom stages
    between STFT and the filterbank.  Requires the default mel
    filterbank, ``power=2``, and default ``normalized``/``onesided``.
    """
    power = spectrogram_kwargs.pop("power", 2.0)
    spec = Spectrogram(power=power, **spectrogram_kwargs)
    stft_layer: STFT = spec[0]
    if num_bins is None:
        num_bins = stft_layer.num_freqs
    elif num_bins != stft_layer.num_freqs:
        raise ValueError(
            f"num_bins={num_bins} inconsistent with STFT num_freqs="
            f"{stft_layer.num_freqs}")
    if fused:
        if power != 2.0:
            raise ValueError("fused=True requires power=2")
        if stft_layer.normalized or not stft_layer.onesided:
            raise ValueError("fused=True supports default normalized/"
                             "onesided semantics only")
        if filterbank is not None:
            raise ValueError("fused=True supports the built-in mel "
                             "filterbank only (splice a custom one into "
                             "the non-fused Pipeline instead)")
        return Pipeline(FusedMelspectrogram(
            num_mels=num_mels, sample_rate=sample_rate, f_min=f_min,
            f_max=f_max, fft_length=stft_layer.fft_length,
            hop_length=stft_layer.hop_length,
            win_length=stft_layer.win_length, window=stft_layer.window,
            center=stft_layer.center, pad_mode=stft_layer.pad_mode,
            power=2.0, to_db=False, trainable=trainable))
    if filterbank is None:
        filterbank = MelFilterbank(num_mels=num_mels,
                                   sample_rate=sample_rate, f_min=f_min,
                                   f_max=f_max, num_bins=num_bins)
    return Pipeline(*spec.transforms,
                    ApplyFilterbank(filterbank, trainable=trainable))


def Barkspectrogram(n_barks: int = 128,
                    sample_rate: float = 22050,
                    f_min: float = 0.0,
                    f_max: Optional[float] = None,
                    bark_scale: str = "traunmuller",
                    trainable: bool = False,
                    **spectrogram_kwargs) -> Pipeline:
    """``Pipeline(STFT, ComplexNorm(2), ApplyFilterbank(bark))``
    factory (torchaudio's ``BarkSpectrogram`` capability) — the
    :func:`Melspectrogram` shape with a Bark-scale bank."""
    power = spectrogram_kwargs.pop("power", 2.0)
    spec = Spectrogram(power=power, **spectrogram_kwargs)
    fb = BarkFilterbank(n_barks=n_barks, sample_rate=sample_rate,
                        f_min=f_min, f_max=f_max,
                        num_bins=spec[0].num_freqs,
                        bark_scale=bark_scale)
    return Pipeline(*spec.transforms,
                    ApplyFilterbank(fb, trainable=trainable))


def Chromagram(n_chroma: int = 12,
               sample_rate: float = 22050,
               tuning: float = 0.0,
               base_c: bool = True,
               trainable: bool = False,
               **spectrogram_kwargs) -> Pipeline:
    """``Pipeline(STFT, ComplexNorm(2), ApplyFilterbank(chroma))``
    factory (torchaudio's ``ChromaSpectrogram`` capability)."""
    power = spectrogram_kwargs.pop("power", 2.0)
    spec = Spectrogram(power=power, **spectrogram_kwargs)
    fb = ChromaFilterbank(n_chroma=n_chroma, sample_rate=sample_rate,
                          num_bins=spec[0].num_freqs, tuning=tuning,
                          base_c=base_c)
    return Pipeline(*spec.transforms,
                    ApplyFilterbank(fb, trainable=trainable))
