"""Kaldi-style pitch + voicing features (``compute_kaldi_pitch``).

Not in the reference (SURVEY §2) — torchaudio's (now-removed)
``functional.compute_kaldi_pitch`` bound Kaldi's pitch tracker
(Ghahremani et al., "A pitch extraction algorithm tuned for automatic
speech recognition", ICASSP 2014).  This is a from-scratch JAX
implementation of that ALGORITHM — the binding's exact numerics are
unverifiable here [ref-recon: torchaudio 0.x functional.compute_kaldi_pitch
/ Kaldi pitch-functions.cc — UNVERIFIED, mount empty], so the contract
is paper-faithful structure + behavioral pinning (tone accuracy, scale
invariance, voicing contrast) rather than bit parity.  Output layout
follows the Kaldi feature matrix: ``(..., frames, 2)`` with
``[..., 0] = NCCF`` (voicing evidence, input to POV) and
``[..., 1] = pitch in Hz``.

Algorithm (offline, whole-clip):

1. Low-pass + resample the waveform to ``resample_frequency`` (the
   package's polyphase Kaiser resampler, then an explicit zero-phase
   windowed-sinc low-pass at ``lowpass_cutoff`` when that sits below
   the resampler's own Nyquist cutoff).
2. Normalize to unit average power — this makes the ballast term
   (step 3) scale-invariant, which Kaldi achieves by scaling the
   ballast with the running signal energy instead.
3. NCCF per frame over every integer lag in
   ``[rf/max_f0, rf/min_f0]``:  ``φ(l) = Σ w(n)·w(n+l) /
   sqrt(e1·e2 + ballast)``, computed for ALL lags of ALL frames as one
   batched rFFT cross-correlation (correlation theorem) + one cumsum
   for the sliding energies — no lag loop.  Two variants: ``ballast =
   nccf_ballast·(W/100)²`` for the Viterbi observation (damps quiet
   frames toward 0) and ``ballast = 0`` for the reported NCCF.
4. Interpolate the integer-lag NCCF onto a geometric lag grid with
   ratio ``1 + delta_pitch`` (sub-sample pitch resolution) — one
   windowed-sinc design matrix, applied as a single GEMM.
5. Viterbi over the lag grid: local cost ``1 − φ·(1 −
   soft_min_f0·lag/rf)``, transition cost ``penalty_factor ·
   log²(lag_i/lag_j)`` — forward pass is one ``lax.scan`` over frames
   (state costs + int32 backpointers), traceback a second reversed
   ``lax.scan`` (the ``ops/align.py`` pattern).

Everything is static-shaped and jit/vmap-clean; batch dims are
flattened internally and restored.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .resample import resample
from .stft import frame_signal

__all__ = ["compute_kaldi_pitch"]


def _lowpass_taps(cutoff: float, sr: float, half_zeros: int = 16):
    """Zero-phase windowed-sinc low-pass (odd length, unit DC gain)."""
    n = np.arange(-half_zeros, half_zeros + 1, dtype=np.float64)
    fc = cutoff / sr                       # cycles per sample
    taps = 2.0 * fc * np.sinc(2.0 * fc * n)
    taps *= np.hanning(n.size + 2)[1:-1]
    return taps / taps.sum()


def _lag_grid(min_lag: int, max_lag: int, delta_pitch: float):
    """Geometric lag grid covering [min_lag, max_lag] with ratio
    ``1 + delta_pitch`` (matching Kaldi's relative pitch resolution)."""
    ratio = math.log1p(delta_pitch)
    count = int(math.floor(math.log(max_lag / min_lag) / ratio)) + 1
    lags = min_lag * np.exp(ratio * np.arange(count, dtype=np.float64))
    return np.minimum(lags, float(max_lag))


def _interp_matrix(grid: np.ndarray, min_lag: int, max_lag: int,
                   half_width: int = 2):
    """(S, L) windowed-sinc interpolation from integer lags
    ``min_lag..max_lag`` onto the fractional ``grid`` lags."""
    ints = np.arange(min_lag, max_lag + 1, dtype=np.float64)
    d = grid[:, None] - ints[None, :]            # (S, L)
    w = np.sinc(d) * (np.cos(np.pi * d / (2 * half_width + 1)) ** 2)
    w[np.abs(d) > half_width + 0.5] = 0.0
    # exact on constants (renormalize rows; edge rows lose taps)
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w


def _viterbi(local: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Min-cost path through ``local (B, T, S)`` with pairwise
    ``trans (S_prev, S_next)`` costs → states ``(B, T)`` int32.
    Forward pass = one ``lax.scan`` (costs + int32 backpointers),
    traceback a second reversed scan (float64-oracle-pinned by
    ``tests/test_kaldi_pitch.py::test_viterbi_oracle``)."""

    def fwd(cost, local_t):
        # cost (B, S); choose best predecessor per next-state
        total = cost[:, :, None] + trans[None]     # (B, Sp, Sn)
        bp = jnp.argmin(total, axis=1).astype(jnp.int32)
        new = jnp.min(total, axis=1) + local_t
        return new, bp

    local_tb = jnp.swapaxes(local, 0, 1)           # (T, B, S)
    cost0 = local_tb[0]
    final_cost, bps = jax.lax.scan(fwd, cost0, local_tb[1:])

    s_end = jnp.argmin(final_cost, axis=-1).astype(jnp.int32)  # (B,)

    def back(state, bp_t):
        # bp_t[j] = best frame-t state given frame-t+1 lands in j;
        # emit the PREDECESSOR so ys[t] is frame t's state (emitting
        # the carry instead shifts the whole track a frame early)
        prev = jnp.take_along_axis(bp_t, state[:, None],
                                   axis=1)[:, 0]
        return prev, prev

    _, states_rev = jax.lax.scan(back, s_end, bps, reverse=True)
    states = jnp.concatenate(
        [states_rev, s_end[None]], axis=0)          # (T, B)
    return jnp.swapaxes(states, 0, 1)               # (B, T)


def compute_kaldi_pitch(waveform: jnp.ndarray, sample_rate: float,
                        frame_length: float = 25.0,
                        frame_shift: float = 10.0,
                        min_f0: float = 50.0, max_f0: float = 400.0,
                        soft_min_f0: float = 10.0,
                        penalty_factor: float = 0.1,
                        lowpass_cutoff: float = 1000.0,
                        resample_frequency: float = 4000.0,
                        delta_pitch: float = 0.005,
                        nccf_ballast: float = 7000.0,
                        snip_edges: bool = True) -> jnp.ndarray:
    """Kaldi pitch features for ``waveform (..., time)``.

    Returns ``(..., num_frames, 2)`` float32 with ``[..., 0]`` the
    NCCF at the chosen lag (voicing evidence, roughly ``[-1, 1]``) and
    ``[..., 1]`` the pitch track in Hz (always within
    ``[min_f0, max_f0]`` — Kaldi emits a pitch for every frame and
    leaves voicing decisions to the NCCF/POV column).

    ``num_frames = 1 + (T_rs - window) // shift`` at the resampled
    rate when ``snip_edges`` (Kaldi's convention), else
    ``ceil(T_rs / shift)`` with symmetric reflection padding.
    """
    if not (0 < min_f0 < max_f0):
        raise ValueError("need 0 < min_f0 < max_f0")
    if max_f0 >= lowpass_cutoff:
        raise ValueError("max_f0 must sit below lowpass_cutoff")
    if lowpass_cutoff > resample_frequency / 2:
        raise ValueError(
            "lowpass_cutoff must be <= resample_frequency / 2")
    rf = float(resample_frequency)
    sample_rate = float(sample_rate)

    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    lead = waveform.shape[:-1]
    x = waveform.reshape((-1, waveform.shape[-1]))

    if sample_rate != rf:
        if int(sample_rate) != sample_rate or int(rf) != rf:
            raise ValueError("sample rates must be integral to "
                             "resample (rational polyphase)")
        x = resample(x, int(sample_rate), int(rf))
    if lowpass_cutoff < 0.49 * rf:
        taps = jnp.asarray(_lowpass_taps(lowpass_cutoff, rf),
                           jnp.float32)
        half = (taps.shape[0] - 1) // 2
        x = jax.lax.conv_general_dilated(
            x[:, None, :], taps[None, None, ::-1],
            window_strides=(1,), padding=[(half, half)],
            dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]

    # unit average power (per batch element) — scale invariance
    power = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(jnp.maximum(power, 1e-20))

    window = max(int(round(rf * frame_length / 1000.0)), 2)
    shift = max(int(round(rf * frame_shift / 1000.0)), 1)
    min_lag = max(int(math.floor(rf / max_f0)), 1)
    max_lag = int(math.ceil(rf / min_f0))
    t_rs = x.shape[-1]

    if snip_edges:
        n_frames = 1 + (t_rs - window) // shift
        if n_frames < 1:
            raise ValueError(
                f"waveform too short: {t_rs} resampled samples < "
                f"one {window}-sample frame")
    else:
        n_frames = -(-t_rs // shift)
        pad_left = (window - shift) // 2
        x = jnp.concatenate(
            [x[:, 1:pad_left + 1][:, ::-1], x], axis=-1) \
            if pad_left > 0 else x
    # zero tail so every frame has its full window + lag reach
    need = (n_frames - 1) * shift + window + max_lag
    x = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[-1]))))

    ext = window + max_lag
    u = frame_signal(x, ext, shift)[:, :n_frames]  # (B, T, ext)
    w = u[..., :window]

    # all-lag correlation via one rFFT product (pitchdetect.py idiom)
    nfft = 1 << int(np.ceil(np.log2(ext + window)))
    uf = jnp.fft.rfft(u, n=nfft, axis=-1)
    wf = jnp.fft.rfft(w, n=nfft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(wf) * uf, n=nfft,
                         axis=-1)[..., :max_lag + 1]

    c2 = jnp.cumsum(u * u, axis=-1)
    zero = jnp.zeros(c2.shape[:-1] + (1,), c2.dtype)
    c2 = jnp.concatenate([zero, c2], axis=-1)
    e_lag = c2[..., window:window + max_lag + 1] - c2[..., :max_lag + 1]
    e_w = e_lag[..., :1]

    corr = corr[..., min_lag:]                     # (B, T, L)
    e2 = e_lag[..., min_lag:]
    ballast = float(nccf_ballast) * (window / 100.0) ** 2
    nccf_pitch = corr * jax.lax.rsqrt(
        jnp.maximum(e_w * e2 + ballast, 1e-12))
    nccf_pov = corr * jax.lax.rsqrt(jnp.maximum(e_w * e2, 1e-12))

    # integer lags -> geometric grid, one GEMM each
    grid = _lag_grid(min_lag, max_lag, delta_pitch)
    interp = jnp.asarray(_interp_matrix(grid, min_lag, max_lag),
                         jnp.float32)
    phi = jnp.einsum("btl,sl->bts", nccf_pitch, interp,
                     precision=jax.lax.Precision.HIGHEST)
    pov = jnp.einsum("btl,sl->bts", nccf_pov, interp,
                     precision=jax.lax.Precision.HIGHEST)

    # Viterbi over lag states
    lag_s = jnp.asarray(grid, jnp.float32)
    soft = 1.0 - float(soft_min_f0) * lag_s / rf   # (S,)
    local = 1.0 - phi * soft                       # (B, T, S)
    log_lag = np.log(grid)
    trans = jnp.asarray(
        float(penalty_factor)
        * (log_lag[:, None] - log_lag[None, :]) ** 2, jnp.float32)
    states = _viterbi(local, trans)                 # (B, T)

    pitch = rf / jnp.take(lag_s, states)
    nccf = jnp.take_along_axis(pov, states[..., None],
                               axis=-1)[..., 0]
    out = jnp.stack([nccf, pitch], axis=-1).astype(jnp.float32)
    return out.reshape(lead + (n_frames, 2))
