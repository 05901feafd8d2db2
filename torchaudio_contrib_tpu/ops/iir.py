"""IIR filtering, TPU-first: log-depth associative scans, not sample loops.

Not in the reference (SURVEY §2 stops at the mel/dB layer) — but IIR
filters are the standard audio-processing companions (torchaudio ships
``lfilter`` + the RBJ biquad family), and they are the canonical
"sequential recurrence" that naive ports run as a T-step loop.  The
TPU-native formulation used here:

* An order-K IIR is a linear recurrence ``s[n] = A·s[n-1] + c[n]`` on a
  K-vector state (companion form).  Affine maps compose associatively —
  ``(A2, c2)∘(A1, c1) = (A2·A1, A2·c1 + c2)`` — so the whole filter runs
  as one ``jax.lax.associative_scan`` of K×K matrix products: **O(log T)
  depth** instead of a 10⁵-step sequential loop, all elementwise-batched
  VPU work.  (Same trick as :func:`~.features.deemphasis` at K=1 and the
  phase vocoder's phase accumulation.)
* The feed-forward (FIR) half is a small convolution along time —
  one ``lax.conv_general_dilated`` — so only the strictly-recursive part
  pays the scan.
* Because ``A`` is the SAME matrix every step, the scan's matrix products
  collapse to powers of ``A``; we still materialize per-step pairs
  (memory T·K²) for K ≤ ``_SCAN_MAX_ORDER`` where that is cheap, and
  fall back to a sequential ``lax.scan`` above it.

All functions are differentiable and follow the library convention:
time is the last axis, arbitrary leading dims.

Biquad designs follow the Audio-EQ-Cookbook (R. Bristow-Johnson)
formulas, the same family torchaudio exposes
(``lowpass_biquad`` … ``treble_biquad``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lfilter",
    "biquad",
    "lowpass_biquad",
    "highpass_biquad",
    "bandpass_biquad",
    "bandreject_biquad",
    "allpass_biquad",
    "equalizer_biquad",
    "bass_biquad",
    "treble_biquad",
    "band_biquad",
    "deemph_biquad",
    "riaa_biquad",
]

_SCAN_MAX_ORDER = 8   # associative scan memory is T·K² — beyond this,
                      # use the sequential lax.scan path


def _fir_part(x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR ``Σ_k b[k]·x[n-k]`` along the last axis.

    Short kernels (every biquad, m ≤ 16) are summed as shifted slices —
    exact IEEE-f32 VPU arithmetic.  A conv would hit the MXU at bf16
    default precision, which costs ~1e-2 relative on the filter input
    and showed up as a 0.2 LU device error in BS.1770 loudness.
    """
    m = b.shape[0]
    if m == 1:
        return x * b[0]
    t = x.shape[-1]
    if m <= 16:
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(m - 1, 0)])
        out = b[0] * x
        for k in range(1, m):
            out = out + b[k] * jax.lax.slice_in_dim(
                xp, m - 1 - k, m - 1 - k + t, axis=-1)
        return out
    lead = x.shape[:-1]
    xp = jnp.pad(x.reshape((-1, 1, t)), ((0, 0), (0, 0), (m - 1, 0)))
    out = jax.lax.conv_general_dilated(
        xp, b[::-1].reshape(1, 1, m),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCT", "OIT", "NCT"),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + (t,))


def _recursive_part(v: jnp.ndarray, a_tail: jnp.ndarray) -> jnp.ndarray:
    """Solve ``y[n] = v[n] − Σ_{k≥1} a[k]·y[n−k]`` (zero initial state).

    Companion form: ``s[n] = A·s[n−1] + e₁·v[n]`` with
    ``A = [[-a1 … -aK], [I | 0]]``; ``y[n] = s[n][0]``.
    """
    k = a_tail.shape[0]
    if k == 0:
        return v
    if k == 1:
        # scalar fast path (identical math to features.deemphasis)
        coef = -a_tail[0]
        aa = jnp.full(v.shape, coef, v.dtype)

        def comb1(l, r):
            return r[0] * l[0], r[0] * l[1] + r[1]

        _, y = jax.lax.associative_scan(comb1, (aa, v), axis=-1)
        return y

    A = np.zeros((k, k), np.float64)
    A[0, :] = -np.asarray(a_tail, np.float64)
    A[1:, :-1] = np.eye(k - 1)

    if k <= _SCAN_MAX_ORDER:
        Aj = jnp.asarray(A, v.dtype)
        lead = v.shape[:-1]
        t = v.shape[-1]
        # per-step pairs (A, e1·v[n]) — A identical each step
        # both leaves must share the scanned axis position → keep the
        # c vectors as (…, t, k, 1) columns so axis=-3 is `t` for both
        As = jnp.broadcast_to(Aj, lead + (t, k, k))
        cs = jnp.concatenate(
            [v[..., None], jnp.zeros(lead + (t, k - 1), v.dtype)],
            axis=-1)[..., None]

        def matmul_vpu(x, y):
            # explicit mul-sum instead of a dot: TPU lowers dots to the
            # MXU where even HIGHEST is multi-pass bf16 — near-unit-pole
            # recurrences are conditioned like 1/(1−|p|) and bf16 dots
            # collapsed the K-weighting filters to ~zero on device
            # (−300 LKFS; HIGHEST still lost 0.2 dB).  K×K is tiny, so
            # elementwise IEEE-f32 VPU arithmetic is both exact-grade
            # and cheaper than MXU tile padding.
            return jnp.sum(x[..., :, :, None] * y[..., None, :, :],
                           axis=-2)

        def comb(l, r):
            A1, c1 = l
            A2, c2 = r
            return (matmul_vpu(A2, A1), matmul_vpu(A2, c1) + c2)

        _, s = jax.lax.associative_scan(comb, (As, cs), axis=-3)
        return s[..., 0, 0]

    # high order: sequential scan (still one compiled program)
    Aj = jnp.asarray(A, v.dtype)
    lead = v.shape[:-1]
    vt = jnp.moveaxis(v, -1, 0)                  # (T, ...)

    def step(s, vn):
        # mul-sum, not a dot: keep IEEE-f32 VPU arithmetic on TPU (see
        # the associative-scan path above)
        s = jnp.sum(Aj * s[..., None, :], axis=-1)
        s = s.at[..., 0].add(vn)
        return s, s[..., 0]

    s0 = jnp.zeros(lead + (k,), v.dtype)
    _, yt = jax.lax.scan(step, s0, vt)
    return jnp.moveaxis(yt, 0, -1)


def lfilter(waveform: jnp.ndarray, a_coeffs, b_coeffs,
            *, clamp: bool = False) -> jnp.ndarray:
    """Direct-form IIR filter along the last axis, zero initial state.

    ``a_coeffs``/``b_coeffs`` are denominator/numerator coefficients
    (``a[0]`` need not be 1 — both are normalized by it).  The argument
    ORDER follows torchaudio (`waveform, a, b`); the math matches
    ``scipy.signal.lfilter(b, a, x)``.  ``clamp=True`` clips the output
    to [-1, 1] (torchaudio compat).

    TPU path: FIR half as one conv; recursive half as a log-depth
    associative scan of companion-matrix affine maps (module docstring).
    """
    waveform = waveform.astype(jnp.promote_types(waveform.dtype,
                                                 jnp.float32))
    a = np.atleast_1d(np.asarray(a_coeffs, np.float64))
    b = np.atleast_1d(np.asarray(b_coeffs, np.float64))
    if a.ndim != 1 or b.ndim != 1:
        raise ValueError("a_coeffs/b_coeffs must be 1-D")
    if a[0] == 0:
        raise ValueError("a_coeffs[0] must be nonzero")
    b = b / a[0]
    a = a / a[0]
    v = _fir_part(waveform, jnp.asarray(b, waveform.dtype))
    y = _recursive_part(v, a[1:])
    if clamp:
        y = jnp.clip(y, -1.0, 1.0)
    return y


def biquad(waveform: jnp.ndarray, b0: float, b1: float, b2: float,
           a0: float, a1: float, a2: float) -> jnp.ndarray:
    """Second-order IIR section (order-2 :func:`lfilter`)."""
    return lfilter(waveform, (a0, a1, a2), (b0, b1, b2))


def _rbj(design: str, sample_rate: float, freq: float, Q: float,
         gain_db: float = 0.0):
    """Audio-EQ-Cookbook biquad coefficients (float64)."""
    w0 = 2.0 * math.pi * freq / sample_rate
    cw, sw = math.cos(w0), math.sin(w0)
    alpha = sw / (2.0 * Q)
    A = 10.0 ** (gain_db / 40.0)
    if design == "lowpass":
        b = ((1 - cw) / 2, 1 - cw, (1 - cw) / 2)
        a = (1 + alpha, -2 * cw, 1 - alpha)
    elif design == "highpass":
        b = ((1 + cw) / 2, -(1 + cw), (1 + cw) / 2)
        a = (1 + alpha, -2 * cw, 1 - alpha)
    elif design == "bandpass":             # constant 0 dB peak gain
        b = (alpha, 0.0, -alpha)
        a = (1 + alpha, -2 * cw, 1 - alpha)
    elif design == "bandreject":
        b = (1.0, -2 * cw, 1.0)
        a = (1 + alpha, -2 * cw, 1 - alpha)
    elif design == "allpass":
        b = (1 - alpha, -2 * cw, 1 + alpha)
        a = (1 + alpha, -2 * cw, 1 - alpha)
    elif design == "peaking":
        b = (1 + alpha * A, -2 * cw, 1 - alpha * A)
        a = (1 + alpha / A, -2 * cw, 1 - alpha / A)
    elif design == "lowshelf":
        sq = 2.0 * math.sqrt(A) * alpha
        b = (A * ((A + 1) - (A - 1) * cw + sq),
             2 * A * ((A - 1) - (A + 1) * cw),
             A * ((A + 1) - (A - 1) * cw - sq))
        a = ((A + 1) + (A - 1) * cw + sq,
             -2 * ((A - 1) + (A + 1) * cw),
             (A + 1) + (A - 1) * cw - sq)
    elif design == "highshelf":
        sq = 2.0 * math.sqrt(A) * alpha
        b = (A * ((A + 1) + (A - 1) * cw + sq),
             -2 * A * ((A - 1) + (A + 1) * cw),
             A * ((A + 1) + (A - 1) * cw - sq))
        a = ((A + 1) - (A - 1) * cw + sq,
             2 * ((A - 1) - (A + 1) * cw),
             (A + 1) - (A - 1) * cw - sq)
    else:  # pragma: no cover
        raise ValueError(design)
    return b, a


def lowpass_biquad(waveform, sample_rate: float, cutoff_freq: float,
                   Q: float = 0.707) -> jnp.ndarray:
    """RBJ low-pass (−12 dB/octave above ``cutoff_freq``)."""
    b, a = _rbj("lowpass", sample_rate, cutoff_freq, Q)
    return lfilter(waveform, a, b)


def highpass_biquad(waveform, sample_rate: float, cutoff_freq: float,
                    Q: float = 0.707) -> jnp.ndarray:
    """RBJ high-pass (−12 dB/octave below ``cutoff_freq``)."""
    b, a = _rbj("highpass", sample_rate, cutoff_freq, Q)
    return lfilter(waveform, a, b)


def bandpass_biquad(waveform, sample_rate: float, central_freq: float,
                    Q: float = 0.707) -> jnp.ndarray:
    """RBJ band-pass, constant 0 dB peak gain."""
    b, a = _rbj("bandpass", sample_rate, central_freq, Q)
    return lfilter(waveform, a, b)


def bandreject_biquad(waveform, sample_rate: float, central_freq: float,
                      Q: float = 0.707) -> jnp.ndarray:
    """RBJ notch filter."""
    b, a = _rbj("bandreject", sample_rate, central_freq, Q)
    return lfilter(waveform, a, b)


def allpass_biquad(waveform, sample_rate: float, central_freq: float,
                   Q: float = 0.707) -> jnp.ndarray:
    """RBJ all-pass (unit magnitude, phase rotation at ``central_freq``)."""
    b, a = _rbj("allpass", sample_rate, central_freq, Q)
    return lfilter(waveform, a, b)


def equalizer_biquad(waveform, sample_rate: float, center_freq: float,
                     gain_db: float, Q: float = 0.707) -> jnp.ndarray:
    """RBJ peaking equalizer: ±``gain_db`` around ``center_freq``."""
    b, a = _rbj("peaking", sample_rate, center_freq, Q, gain_db)
    return lfilter(waveform, a, b)


def bass_biquad(waveform, sample_rate: float, gain_db: float,
                central_freq: float = 100.0,
                Q: float = 0.707) -> jnp.ndarray:
    """RBJ low-shelf (bass control)."""
    b, a = _rbj("lowshelf", sample_rate, central_freq, Q, gain_db)
    return lfilter(waveform, a, b)


def treble_biquad(waveform, sample_rate: float, gain_db: float,
                  central_freq: float = 3000.0,
                  Q: float = 0.707) -> jnp.ndarray:
    """RBJ high-shelf (treble control)."""
    b, a = _rbj("highshelf", sample_rate, central_freq, Q, gain_db)
    return lfilter(waveform, a, b)


def band_biquad(waveform, sample_rate: float, central_freq: float,
                Q: float = 0.707, noise: bool = False) -> jnp.ndarray:
    """SoX ``band`` single-pole-pair band-pass [ref-recon: sox
    biquads.c / torchaudio functional.band_biquad — UNVERIFIED]:
    resonator with exponentially placed poles; ``noise=True`` uses the
    alternate (wider, pitched-noise) gain normalization."""
    w0 = 2.0 * math.pi * central_freq / sample_rate
    bw_hz = central_freq / Q
    a2 = math.exp(-2.0 * math.pi * bw_hz / sample_rate)
    a1 = -4.0 * a2 / (1.0 + a2) * math.cos(w0)
    b0 = math.sqrt(1.0 - a1 * a1 / (4.0 * a2)) * (1.0 - a2)
    if noise:
        b0 = math.sqrt(((1.0 + a2) ** 2 - a1 * a1)
                       * (1.0 - a2) / (1.0 + a2))
    return lfilter(waveform, (1.0, a1, a2), (b0, 0.0, 0.0))


# ISO 908 CD / DAT de-emphasis: a high-shelf whose (freq, slope,
# gain) are tabulated per rate [ref-recon: sox biquads.c deemph /
# torchaudio functional.deemph_biquad — UNVERIFIED]
_DEEMPH = {44100: (5283.0, 0.4845, -9.477),
           48000: (5356.0, 0.479, -9.62)}


def deemph_biquad(waveform, sample_rate: float) -> jnp.ndarray:
    """CD/DAT de-emphasis shelving EQ (SoX ``deemph``).  Supported
    sample rates: 44100, 48000."""
    cfg = _DEEMPH.get(int(sample_rate))
    if cfg is None:
        raise ValueError(
            f"deemph_biquad supports {sorted(_DEEMPH)} Hz, got "
            f"{sample_rate}")
    freq, slope, gain_db = cfg
    # shelf-slope parametrization: alpha = sw/2*sqrt((A+1/A)(1/S-1)+2)
    # == sw/(2Q) with Q = 1/sqrt((A+1/A)(1/S-1)+2)
    A = 10.0 ** (gain_db / 40.0)
    Q = 1.0 / math.sqrt((A + 1.0 / A) * (1.0 / slope - 1.0) + 2.0)
    b, a = _rbj("highshelf", sample_rate, freq, Q, gain_db)
    return lfilter(waveform, a, b)


# SoX riaa zero/pole tables per supported sample rate [ref-recon:
# sox biquads.c / torchaudio functional.riaa_biquad — UNVERIFIED]
_RIAA_ZP = {
    44100: ((-0.2014898, 0.9233820), (0.7083149, 0.9924091)),
    48000: ((-0.1766069, 0.9321590), (0.7396325, 0.9931330)),
    88200: ((-0.1168735, 0.9648312), (0.8590646, 0.9964002)),
    96000: ((-0.1141486, 0.9676817), (0.8699137, 0.9966946)),
}


def riaa_biquad(waveform, sample_rate: float) -> jnp.ndarray:
    """RIAA phono playback EQ (SoX ``riaa``): bass boost / treble cut
    from tabulated zero/pole pairs, gain-normalized to 0 dB at 1 kHz.
    Supported sample rates: 44100/48000/88200/96000."""
    zp = _RIAA_ZP.get(int(sample_rate))
    if zp is None:
        raise ValueError(
            f"riaa_biquad supports {sorted(_RIAA_ZP)} Hz, got "
            f"{sample_rate}")
    (z0, z1), (p0, p1) = zp
    b = np.array([1.0, -(z0 + z1), z0 * z1], np.float64)
    a = np.array([1.0, -(p0 + p1), p0 * p1], np.float64)
    # normalize to unit gain at 1 kHz
    w = 2.0 * math.pi * 1000.0 / sample_rate
    e = np.exp(-1j * w * np.arange(3))
    g = abs(np.dot(a, e) / np.dot(b, e))
    return lfilter(waveform, tuple(a), tuple(b * g))


def filtfilt(waveform: jnp.ndarray, a_coeffs, b_coeffs,
             *, clamp: bool = False) -> jnp.ndarray:
    """Zero-phase forward-backward IIR filtering.

    Zero initial state in both passes and no edge extension — the
    literal ``lfilter → flip → lfilter → flip`` composition (this is
    torchaudio's semantics; ``scipy.signal.filtfilt`` additionally
    seeds each pass with ``lfilter_zi``-matched initial conditions, so
    the two differ within a filter-settling length of the edges).

    Runs :func:`lfilter` twice with a time flip in between — both
    passes are the same log-depth associative scan, so the whole thing
    stays one compiled program with O(log T) depth.
    """
    y = lfilter(waveform, a_coeffs, b_coeffs)
    y = lfilter(y[..., ::-1], a_coeffs, b_coeffs)[..., ::-1]
    if clamp:
        y = jnp.clip(y, -1.0, 1.0)
    return y
