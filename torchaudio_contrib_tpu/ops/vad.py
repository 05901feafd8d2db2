"""Voice activity detection (SoX-parameter-surface, adaptive spectral SNR).

Not in the reference (SURVEY §2) — mirrors the ``vad`` effect torchaudio
ships (trim leading non-speech) with the same parameter names and
defaults.  The measurement chain:

1. band-limit the signal (HP/LP biquads — :mod:`.iir`'s log-depth scans);
2. every ``1/measure_freq`` seconds, window a short chunk and take its
   power spectrum (all measure frames batched through ONE rFFT —
   :func:`~.stft.frame_signal` + ``jnp.fft.rfft``);
3. track a smoothed spectrum and an **adaptive noise spectrum** with
   asymmetric up/down EMA rates (fast adaptation during ``boot_time``),
   spectrally subtract ``noise_reduction_amount × noise``.  Upward
   adaptation is **speech-gated**: a bin sitting >6 dB above the floor
   is treated as speech and only leaks into the floor on a slow (5 s)
   time constant — without this, ``noise_up_time`` (0.1 s) outruns
   ``measure_smooth_time`` (0.4 s) and a *sustained* loud voice would
   be absorbed into the floor before it could trigger;
4. the per-frame measure is the **band SNR in dB** of the subtracted
   spectrum against the adapted noise floor — scale-invariant, so the
   default ``trigger_level=7`` separates stationary floors (measured
   ≈ −5 dB on white noise at any level) from speech onsets (≥ +8 dB);
5. trigger when measures stay ≥ ``trigger_level`` for ``trigger_time``,
   bridging dropouts up to ``allowed_gap`` (morphological closing),
   then rewind by ``pre_trigger_time``.

Deliberate deviation from SoX, stated loudly: SoX scores frames by
cepstral-lifter power; a calibration study (recorded in
docs/CONVENTIONS.md) showed that measure separates poorly when rebuilt
from its description (noise ≈ 30 vs speech ≈ 35 on synthetic mixes)
while the adaptive-floor SNR separates by >13 dB at any input scale, so
this implementation uses the SNR measure.  ``hp_lifter_freq`` /
``lp_lifter_freq`` are accepted for API compatibility but **raise** if
changed from their defaults — they would otherwise be silently ignored.

Only step 3 is sequential (state = two spectra, one EMA step per
measure frame — a tiny ``lax.scan`` over ``measure_freq × seconds``
steps; the FFTs and trigger logic stay vectorized).

Boot assumption (shared with SoX): the first ``boot_time`` of the clip
seeds the noise floor, so a voice that is already present at t=0 with
literally zero amplitude modulation can be absorbed into the floor;
any natural syllable-rate envelope (its valleys re-anchor the floor
via the fast downward EMA) keeps t=0 speech detectable
(``tests/test_vad.py``).

TPU-first API split: :func:`vad_onset` is jit-able and returns the
**onset sample index** per clip (static shapes — compose with masks or
``lax.dynamic_slice`` in batched pipelines); :func:`vad` is the eager
convenience that actually trims one clip (dynamic output length ⇒
host-side).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .iir import highpass_biquad, lowpass_biquad
from .stft import frame_signal

__all__ = ["vad", "vad_onset", "vad_trim"]


def _vad_measures(waveform: jnp.ndarray, sample_rate: float,
                  boot_time: float, noise_up_time: float,
                  noise_down_time: float, noise_reduction_amount: float,
                  measure_freq: float, measure_duration: float | None,
                  measure_smooth_time: float, hp_filter_freq: float,
                  lp_filter_freq: float) -> jnp.ndarray:
    """Per-measure-frame SNR measures in dB, ``(..., n_measures)``."""
    x = waveform.astype(jnp.promote_types(waveform.dtype, jnp.float32))
    x = highpass_biquad(x, sample_rate, hp_filter_freq)
    x = lowpass_biquad(x, sample_rate, min(lp_filter_freq,
                                           0.49 * sample_rate))

    period = max(int(round(sample_rate / measure_freq)), 1)
    dur = (2.0 / measure_freq if measure_duration is None
           else measure_duration)
    win = max(int(round(dur * sample_rate)), 2)
    if x.shape[-1] < win:
        raise ValueError(
            f"clip too short for vad: {x.shape[-1]} samples < one "
            f"measure window ({win})")
    frames = frame_signal(x, win, period)         # (..., n_meas, win)
    n_fft = 1 << max(int(math.ceil(math.log2(win))), 4)
    w = jnp.asarray(np.hanning(win + 2)[1:-1].astype(np.float32))
    spec = jnp.abs(jnp.fft.rfft(frames * w, n=n_fft, axis=-1)) ** 2
    n_bins = spec.shape[-1]

    freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    band = jnp.asarray(((freqs >= hp_filter_freq)
                        & (freqs <= lp_filter_freq))
                       .astype(np.float32))

    dt = 1.0 / measure_freq
    a_smooth = math.exp(-dt / max(measure_smooth_time, 1e-6))
    a_up = math.exp(-dt / max(noise_up_time, 1e-6))
    a_down = math.exp(-dt / max(noise_down_time, 1e-6))
    boot_len = int(round(boot_time * measure_freq))

    lead = spec.shape[:-2]
    n_meas = spec.shape[-2]
    flat = spec.reshape((-1, n_meas, n_bins))

    a_leak = math.exp(-dt / 5.0)       # speech-gated slow upward leak

    def step(state, p):
        smooth, noise, idx = state
        smooth = a_smooth * smooth + (1 - a_smooth) * p
        booting = idx < boot_len
        # >6 dB above the floor = speech: leak, don't track (docstring)
        is_speech = p > 4.0 * (noise + 1e-12)
        a_up_eff = jnp.where(booting, 0.5,
                             jnp.where(is_speech, a_leak, a_up))
        coeff = jnp.where(p > noise, a_up_eff, a_down)
        noise = coeff * noise + (1 - coeff) * p
        clean = jnp.maximum(
            smooth - noise_reduction_amount * noise, 0.0)
        num = jnp.sum(clean * band, axis=-1)
        den = noise_reduction_amount * jnp.sum(noise * band,
                                               axis=-1) + 1e-12
        meas = 10.0 * jnp.log10(num / den + 1e-9)
        meas = jnp.where(booting, -90.0, meas)
        return (smooth, noise, idx + 1), meas

    z = jnp.zeros((flat.shape[0], n_bins), flat.dtype)
    (_, _, _), meas = jax.lax.scan(
        step, (z, z, jnp.zeros((), jnp.int32)),
        jnp.moveaxis(flat, -2, 0))
    return jnp.moveaxis(meas, 0, -1).reshape(lead + (n_meas,))


def vad_onset(waveform: jnp.ndarray, sample_rate: float,
              trigger_level: float = 7.0, trigger_time: float = 0.25,
              search_time: float = 1.0, allowed_gap: float = 0.25,
              pre_trigger_time: float = 0.0, boot_time: float = 0.35,
              noise_up_time: float = 0.1, noise_down_time: float = 0.01,
              noise_reduction_amount: float = 1.35,
              measure_freq: float = 20.0,
              measure_duration: float | None = None,
              measure_smooth_time: float = 0.4,
              hp_filter_freq: float = 50.0,
              lp_filter_freq: float = 6000.0,
              hp_lifter_freq: float = 150.0,
              lp_lifter_freq: float = 2000.0) -> jnp.ndarray:
    """Voice-onset sample index per clip (jit-able, static shapes).

    ``waveform`` is ``(..., time)``; returns int32 ``(...)`` — the
    sample index where speech starts (0 if the clip opens with speech,
    clip length if none found).  Parameters mirror
    ``torchaudio.functional.vad``; see the module docstring for the
    measure semantics (and the loud lifter-parameter deviation).
    ``search_time`` bounds how far the gap-bridging looks, matching its
    SoX role of limiting retroactive joining.
    """
    if (hp_lifter_freq, lp_lifter_freq) != (150.0, 2000.0):
        raise NotImplementedError(
            "this VAD scores frames by adaptive spectral SNR, not a "
            "cepstral lifter (module docstring); hp_lifter_freq/"
            "lp_lifter_freq have no effect and non-default values "
            "would be silently ignored")
    meas = _vad_measures(
        waveform, sample_rate, boot_time, noise_up_time,
        noise_down_time, noise_reduction_amount, measure_freq,
        measure_duration, measure_smooth_time, hp_filter_freq,
        lp_filter_freq)
    n_meas = meas.shape[-1]
    period = max(int(round(sample_rate / measure_freq)), 1)

    active = meas >= trigger_level
    gap_len = min(max(int(round(allowed_gap * measure_freq)), 0),
                  max(int(round(search_time * measure_freq)), 1))
    trig_len = max(int(round(trigger_time * measure_freq)), 1)

    if gap_len > 0:
        # bridge dropouts ≤ gap_len: morphological closing along time.
        # Both passes use VALID windows with explicit alignment — a
        # SAME-padded erode reuses the dilation's asymmetric split for
        # even k, which shifts every run one frame earlier and clips
        # runs touching frame 0 (C[t] must be min over the k dilation
        # windows CONTAINING t, i.e. ero offset t+1 below).
        k = gap_len + 1
        pad = jnp.pad(active, [(0, 0)] * (active.ndim - 1) + [(k, k)])
        f = pad.astype(jnp.float32)
        dil = jax.lax.reduce_window(
            f, -jnp.inf, jax.lax.max, (1,) * (f.ndim - 1) + (k,),
            (1,) * f.ndim, "VALID")
        ero = jax.lax.reduce_window(
            dil, jnp.inf, jax.lax.min, (1,) * (f.ndim - 1) + (k,),
            (1,) * f.ndim, "VALID")
        closed = ero[..., 1:1 + n_meas] > 0.5
    else:
        closed = active

    # run length of consecutive closed-activity ending at each frame
    def run_step(run, a):
        run = jnp.where(a, run + 1, 0)
        return run, run

    _, runs = jax.lax.scan(
        run_step,
        jnp.zeros(closed.shape[:-1], jnp.int32),
        jnp.moveaxis(closed.astype(jnp.int32), -1, 0))
    runs = jnp.moveaxis(runs, 0, -1)              # (..., n_meas)

    hit = runs >= trig_len
    any_hit = jnp.any(hit, axis=-1)
    first_end = jnp.argmax(hit, axis=-1)
    onset_meas = first_end - (trig_len - 1)
    pre = int(round(pre_trigger_time * measure_freq))
    onset_meas = jnp.maximum(onset_meas - pre, 0)
    onset = jnp.where(any_hit, onset_meas * period,
                      waveform.shape[-1]).astype(jnp.int32)
    return onset


def vad_trim(waveform: jnp.ndarray, sample_rate: float,
             **kwargs):
    """Jit-able fixed-shape trim: → ``(trimmed, valid_length)``.

    ``trimmed`` has the SAME shape as ``waveform`` with the detected
    speech shifted to sample 0 and the tail zero-filled;
    ``valid_length`` (int32, scalar per clip) is the number of valid
    samples (``T − onset``).  Batched inputs ``(..., time)`` trim each
    clip independently except that a trailing channel axis marked via
    2-D ``(channel, time)`` input shares the min onset across channels
    (same rule as :func:`vad`).  Everything is static-shaped, so
    ``transforms.Vad``/pipelines compose under ``jit``; slice
    host-side with ``trimmed[..., :int(valid_length)]`` if the
    dynamic-length view is wanted.
    """
    waveform = jnp.asarray(waveform)
    onset = vad_onset(waveform, sample_rate, **kwargs)
    if waveform.ndim == 2:
        # (channel, time): channels share the conservative min onset
        onset = jnp.broadcast_to(jnp.min(onset, keepdims=True),
                                 onset.shape)
    T = waveform.shape[-1]
    idx = jnp.arange(T)
    if waveform.ndim == 0:
        raise ValueError("waveform must have a time axis")
    gather = jnp.minimum(idx + onset[..., None]
                         if waveform.ndim > 1 else idx + onset, T - 1)
    shifted = jnp.take_along_axis(
        waveform.reshape((-1, T)),
        gather.reshape((-1, T)) if waveform.ndim > 1
        else jnp.broadcast_to(gather, (1, T)),
        axis=-1).reshape(waveform.shape)
    valid = (T - onset).astype(jnp.int32)
    mask = (idx < (valid[..., None] if waveform.ndim > 1 else valid))
    return jnp.where(mask, shifted, 0.0), valid


def vad(waveform: jnp.ndarray, sample_rate: float,
        **kwargs) -> jnp.ndarray:
    """Trim leading non-speech from ONE clip (eager convenience).

    ``waveform`` is ``(time,)`` or ``(channel, time)``; channels share
    the min onset (conservative — keeps all channels aligned and never
    cuts into any channel's speech).  Output length is data-dependent,
    so this cannot be jit-ed — inside jit use :func:`vad_onset` with a
    mask or ``lax.dynamic_slice``.
    """
    if waveform.ndim > 2:
        raise ValueError(
            "vad trims single clips; use vad_onset for batches")
    onset = vad_onset(waveform, sample_rate, **kwargs)
    start = int(jnp.min(onset)) if onset.ndim else int(onset)
    return waveform[..., start:]
