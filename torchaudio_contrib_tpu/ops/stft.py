"""STFT / ISTFT — TPU-native framed Fourier transforms.

Capability parity with the reference's ``stft``
[ref: torchaudio_contrib/functional.py::stft — UNVERIFIED] and ``istft``
[ref: torchaudio_contrib/istft.py — UNVERIFIED]; numerics match
``torch.stft`` / ``torch.istft`` (the oracle available in this environment —
see SURVEY.md §4) to float32 precision.

TPU-first design
----------------
* Shapes are static: framing is a constant-index gather XLA lowers to
  strided slices; frame count is a Python int so nothing recompiles per
  batch under ``jit``.
* Output is a **native complex64 array** ``(..., freq, time)`` — not the
  reference's pre-torch-1.8 trailing-``(..., 2)`` real view.  Use
  :func:`torchaudio_contrib_tpu.utils.compat.view_as_real` for the legacy
  layout when needed (parity tests do).
* Three execution paths:
  - ``method="fft"`` (default): reflect-pad → frame → window → ``rfft``.
    XLA fuses pad/window around its FFT custom-call.
  - ``method="gemm"``: four-step Cooley-Tukey rDFT as two MXU einsums
    with twiddles folded into the second basis — ties the fft path on
    TPU while keeping everything on the MXU.
  - ``method="matmul"``: the windowed DFT folded into one real matrix so
    frame→spectrum is a single MXU GEMM (GEMM-native NDFT; the fully
    fused single-kernel version lives in ops/fused.py).
* ISTFT overlap-add is phase-decomposed into dense shifted adds when
  ``hop | fft`` (scatter-add fallback otherwise); the NOLA envelope is
  precomputed in float64 NumPy and constant-folded.
* Everything is differentiable via JAX AD; the adjoint of reflect-pad
  framing (the correctness hot spot named in SURVEY.md §3c) is exercised
  by gradient parity tests against torch.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .windows import get_window, cola_window_sum

__all__ = [
    "stft",
    "istft",
    "frame_signal",
    "num_frames",
    "stft_output_length",
]


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------

def num_frames(n_samples: int, fft_length: int, hop_length: int,
               center: bool = True) -> int:
    """Number of STFT frames ``torch.stft`` produces for this config."""
    if center:
        n_samples = n_samples + 2 * (fft_length // 2)
    if n_samples < fft_length:
        raise ValueError(
            f"input too short: {n_samples} samples < fft_length={fft_length}")
    return 1 + (n_samples - fft_length) // hop_length


def stft_output_length(n_frames: int, fft_length: int, hop_length: int,
                       center: bool = True, length: Optional[int] = None) -> int:
    """Waveform length an ISTFT of ``n_frames`` frames reconstructs."""
    full = fft_length + hop_length * (n_frames - 1)
    if length is not None:
        return length
    if center:
        return full - 2 * (fft_length // 2)
    return full


@functools.lru_cache(maxsize=64)
def _frame_index_map(n_frames: int, fft_length: int, hop_length: int) -> np.ndarray:
    """Constant (n_frames, fft_length) gather indices; cached across traces."""
    return (np.arange(n_frames, dtype=np.int32)[:, None] * hop_length
            + np.arange(fft_length, dtype=np.int32)[None, :])


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``x (..., T)`` into overlapping frames ``(..., n_frames, frame_length)``.

    TPU note: a naive fancy-index gather here lowers to a slow generic
    gather kernel (measured ~40 ms for 32×30 s clips — 80 % of the whole
    mel pipeline).  Instead, frames decompose into ``r = ceil(frame/hop)``
    *phases*: within a phase, consecutive frames start ``r·hop ≥ frame``
    apart, so each phase is a contiguous reshape into rows of width
    ``r·hop`` sliced to ``frame_length`` — dense copies XLA compiles well
    (~10× faster than the gather).  When ``hop | frame`` the slice is a
    no-op and this reduces to the classic exact phase decomposition.
    Works for any hop (including ``hop ∤ frame`` and ``hop > frame``).
    """
    n = 1 + (x.shape[-1] - frame_length) // hop_length
    if frame_length == hop_length:
        usable = n * frame_length
        return x[..., :usable].reshape(x.shape[:-1] + (n, frame_length))
    r = -(-frame_length // hop_length)     # frames per phase cycle
    row = r * hop_length                   # phase-row width (≥ frame_length)
    k = -(-n // r)                         # rows per phase (padded up)
    need = (r - 1) * hop_length + k * row
    xp = x
    if need > x.shape[-1]:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, need - x.shape[-1])]
        xp = jnp.pad(x, pad)
    phases = [
        xp[..., p * hop_length: p * hop_length + k * row]
        .reshape(x.shape[:-1] + (k, row))[..., :frame_length]
        for p in range(r)
    ]
    frames = jnp.stack(phases, axis=-2)  # (..., k, r, frame_length)
    frames = frames.reshape(x.shape[:-1] + (k * r, frame_length))
    return frames[..., :n, :]


def _pad_center(x: jnp.ndarray, pad: int, pad_mode: str) -> jnp.ndarray:
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    if pad_mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if pad_mode == "constant" or pad_mode == "zeros":
        return jnp.pad(x, cfg, mode="constant")
    if pad_mode == "replicate" or pad_mode == "edge":
        return jnp.pad(x, cfg, mode="edge")
    if pad_mode == "circular" or pad_mode == "wrap":
        return jnp.pad(x, cfg, mode="wrap")
    raise ValueError(f"unsupported pad_mode {pad_mode!r}")


def _resolve_window(window, win_length: int, fft_length: int) -> np.ndarray:
    """Window as float64 NumPy, zero-padded to ``fft_length`` and centered
    (matching ``torch.stft`` when ``win_length < n_fft``)."""
    w = get_window(window if window is not None else "hann", win_length)
    if win_length < fft_length:
        left = (fft_length - win_length) // 2
        w = np.pad(w, (left, fft_length - win_length - left))
    elif win_length > fft_length:
        raise ValueError(
            f"win_length={win_length} > fft_length={fft_length}")
    return w


@functools.lru_cache(maxsize=32)
def _gemm_fft_constants(fft_length: int):
    """Constants for the four-step GEMM rDFT (float64 NumPy, cached).

    Cooley-Tukey split ``N = N1·N2`` (``n = N2·n1 + n2``, ``k = k1 +
    N1·k2``): stage 1 is a real GEMM with the ``(N1, N1)`` DFT basis over
    ``n1``; the twiddle ``W_N^{n2·k}`` is folded into the stage-2 basis,
    making stage 2 a single batched-over-``k1`` complex GEMM over ``n2``
    — no separate twiddle pass, and only the ``k2`` columns the onesided
    output needs are computed.
    """
    N = fft_length
    # largest power-of-two N2 <= sqrt(N) dividing N (near-square minimizes
    # 2·N1 + 4·N2 FLOPs/sample; N1 >= N2 keeps the big GEMM contraction)
    N2 = 1
    while N % (N2 * 2) == 0 and (N2 * 2) ** 2 <= N:
        N2 *= 2
    N1 = N // N2
    if N2 < 2:
        return None  # odd/prime lengths: caller falls back to jnp.fft

    n1 = np.arange(N1, dtype=np.float64)
    k1 = np.arange(N1, dtype=np.float64)
    ang1 = 2.0 * np.pi * np.outer(n1, k1) / N1
    C1, S1 = np.cos(ang1), -np.sin(ang1)                  # (N1, K1)

    n_k2 = (N // 2) // N1 + 1                             # onesided k2 count
    n2 = np.arange(N2, dtype=np.float64)
    k2 = np.arange(n_k2, dtype=np.float64)
    # k = k1 + N1·k2 ; TW[k1, n2, k2] = exp(-2πi·n2·k/N)
    k_full = k1[:, None, None] + N1 * k2[None, None, :]   # (K1, 1, K2)
    ang2 = 2.0 * np.pi * n2[None, :, None] * k_full / N
    TWr, TWi = np.cos(ang2), -np.sin(ang2)                # (K1, N2, K2)
    return N1, N2, n_k2, C1, S1, TWr, TWi


def _gemm_rfft(frames: jnp.ndarray, fft_length: int, dtype,
               precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Onesided DFT of real ``frames (..., fft_length)`` as two MXU GEMM
    stages (see :func:`_gemm_fft_constants`).  Returns ``(..., N//2+1)``
    complex.  All GEMMs run at ``precision`` (default HIGHEST: full f32
    accuracy; pass HIGH for bf16_3x at ~1e-6 relative error)."""
    consts = _gemm_fft_constants(fft_length)
    if consts is None:
        return jnp.fft.rfft(frames, n=fft_length, axis=-1)
    N1, N2, n_k2, C1, S1, TWr, TWi = consts
    c1 = jnp.asarray(C1, dtype)
    s1 = jnp.asarray(S1, dtype)
    twr = jnp.asarray(TWr, dtype)
    twi = jnp.asarray(TWi, dtype)

    x = frames.reshape(frames.shape[:-1] + (N1, N2)).astype(dtype)
    # stage 1: real GEMM over n1  -> A (..., K1, N2)
    ar = jnp.einsum("...ab,ak->...kb", x, c1, precision=precision)
    ai = jnp.einsum("...ab,ak->...kb", x, s1, precision=precision)
    # stage 2: twiddle-folded batched complex GEMM over n2 -> (..., K1, K2)
    xr = (jnp.einsum("...kb,kbq->...kq", ar, twr, precision=precision)
          - jnp.einsum("...kb,kbq->...kq", ai, twi, precision=precision))
    xi = (jnp.einsum("...kb,kbq->...kq", ar, twi, precision=precision)
          + jnp.einsum("...kb,kbq->...kq", ai, twr, precision=precision))
    # (..., K1, K2) -> flat k = k1 + N1·k2 -> slice onesided
    xr = jnp.swapaxes(xr, -1, -2).reshape(frames.shape[:-1] + (N1 * n_k2,))
    xi = jnp.swapaxes(xi, -1, -2).reshape(frames.shape[:-1] + (N1 * n_k2,))
    n_freqs = fft_length // 2 + 1
    return jax.lax.complex(xr[..., :n_freqs], xi[..., :n_freqs])


@functools.lru_cache(maxsize=32)
def _dft_matrices(fft_length: int, onesided: bool):
    """Real/imag DFT analysis matrices ``(fft_length, n_freqs)`` in float64.

    ``X[f] = sum_k x[k]·(cos - i·sin)(2πfk/N)`` — the matmul path computes
    ``frames @ cos_mat`` and ``frames @ (-sin_mat)`` on the MXU.
    """
    n_freqs = fft_length // 2 + 1 if onesided else fft_length
    k = np.arange(fft_length, dtype=np.float64)[:, None]
    f = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / fft_length
    return np.cos(ang), -np.sin(ang)


# ---------------------------------------------------------------------------
# stft
# ---------------------------------------------------------------------------

def stft(waveform: jnp.ndarray,
         fft_length: int,
         hop_length: Optional[int] = None,
         win_length: Optional[int] = None,
         window=None,
         center: bool = True,
         pad_mode: str = "reflect",
         normalized: bool = False,
         onesided: bool = True,
         method: str = "fft",
         precision=None) -> jnp.ndarray:
    """Short-time Fourier transform of ``waveform (..., time)``.

    Returns complex64 ``(..., n_freqs, n_frames)`` with
    ``n_freqs = fft_length//2 + 1`` when ``onesided``.  Arbitrary leading
    dims are preserved (the reference flattens/restores them around
    ``torch.stft``; XLA batches natively so we never reshape).

    Matches ``torch.stft(..., return_complex=True)`` semantics: reflect
    center padding, window zero-pad-centered when ``win_length <
    fft_length``, ``normalized`` multiplies by ``fft_length**-0.5``.

    ``precision`` applies to the GEMM-based methods (``matmul``/``gemm``/
    ``conv``): on TPU the default MXU precision is bf16 (~2e-3 relative);
    ``HIGH`` (bf16_3x, ~1e-6) is the throughput/parity sweet spot, and
    ``matmul``+HIGH has the fastest VJP of all paths (GEMM adjoints are
    GEMMs — measured 32 vs 52 ms for the fft chain's grad at batch
    32×30 s).  The ``fft`` method is always full float32.
    """
    if hop_length is None:
        hop_length = fft_length // 4
    if win_length is None:
        win_length = fft_length

    w = _resolve_window(window, win_length, fft_length)

    x = waveform
    if center:
        with jax.named_scope("stft.pad"):
            x = _pad_center(x, fft_length // 2, pad_mode)

    dtype = jnp.promote_types(x.dtype, jnp.float32)

    if method == "conv":
        # Framing + windowed DFT fused into ONE strided convolution: the
        # (2·n_freqs, fft_length) windowed-DFT basis is the conv kernel,
        # hop_length the stride.  The MXU does the whole analysis in a
        # single pass — the (..., n_frames, fft_length) frames buffer is
        # never materialized in HBM (GEMM-native NDFT; cf. PAPERS.md MelT).
        cos_m, msin_m = _dft_matrices(fft_length, onesided)
        n_freqs = cos_m.shape[1]
        basis = np.concatenate([w[:, None] * cos_m, w[:, None] * msin_m],
                               axis=1)                       # (n_fft, 2F)
        kern = jnp.asarray(basis.T[:, None, :], dtype=dtype)  # (2F, 1, n_fft)
        lead = x.shape[:-1]
        xf = x.reshape((-1, 1, x.shape[-1])).astype(dtype)    # (N, 1, T)
        out = jax.lax.conv_general_dilated(
            xf, kern, window_strides=(hop_length,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=(precision if precision is not None
                       else jax.lax.Precision.HIGHEST),
            preferred_element_type=dtype)                     # (N, 2F, T')
        out = out.reshape(lead + out.shape[1:])
        spec = jax.lax.complex(out[..., :n_freqs, :], out[..., n_freqs:, :])
        if normalized:
            spec = spec * (fft_length ** -0.5)
        return spec

    with jax.named_scope("stft.frame"):
        frames = frame_signal(x, fft_length, hop_length)  # (..., n_frames, n_fft)

    if method == "matmul":
        cos_m, msin_m = _dft_matrices(fft_length, onesided)
        wr = jnp.asarray(w[:, None] * cos_m, dtype=dtype)
        wi = jnp.asarray(w[:, None] * msin_m, dtype=dtype)
        fr = frames.astype(dtype)
        re = jnp.matmul(fr, wr, precision=precision)
        im = jnp.matmul(fr, wi, precision=precision)
        spec = jax.lax.complex(re, im)
    elif method == "gemm":
        if not onesided:
            raise ValueError("method='gemm' supports onesided only")
        frames = frames * jnp.asarray(w, dtype=dtype)
        spec = _gemm_rfft(frames, fft_length, dtype,
                          precision=(precision if precision is not None
                                     else jax.lax.Precision.HIGHEST))
    elif method == "fft":
        frames = frames * jnp.asarray(w, dtype=dtype)
        with jax.named_scope("stft.fft"):
            if onesided:
                spec = jnp.fft.rfft(frames, n=fft_length, axis=-1)
            else:
                spec = jnp.fft.fft(frames, n=fft_length, axis=-1)
    else:
        raise ValueError(f"unknown stft method {method!r}")

    if normalized:
        spec = spec * (fft_length ** -0.5)

    # (..., n_frames, n_freqs) -> (..., n_freqs, n_frames)
    return jnp.swapaxes(spec, -1, -2)


# ---------------------------------------------------------------------------
# istft
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _idft_matrices(fft_length: int):
    """Real inverse-DFT basis ``(n_freqs, fft_length)`` pair for the
    onesided irFFT-as-GEMM: ``frames = Re(X)@ICr + Im(X)@ICi`` with the
    conjugate-symmetry weights folded in (float64, cast at the edge)."""
    n_freqs = fft_length // 2 + 1
    k = np.arange(n_freqs, dtype=np.float64)[:, None]
    n = np.arange(fft_length, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / fft_length
    w = np.full((n_freqs, 1), 2.0 / fft_length)
    w[0] = 1.0 / fft_length
    if fft_length % 2 == 0:
        w[-1] = 1.0 / fft_length
    return w * np.cos(ang), -w * np.sin(ang)


def _overlap_add(frames: jnp.ndarray, fft_length: int, hop_length: int,
                 full_length: int) -> jnp.ndarray:
    """Overlap-add ``frames (..., n_frames, fft_length)`` into
    ``(..., full_length)`` — the exact adjoint of :func:`frame_signal`.

    TPU note: mirrors :func:`frame_signal`'s generalized phase
    decomposition — frames of the same phase (``r = ceil(fft/hop)``) are
    non-overlapping, so OLA is ``r`` dense shifted adds of contiguous
    rows (zero-padded from ``fft`` to ``r·hop``) — XLA-friendly instead
    of the generic scatter-add, for ANY hop.
    """
    n_frames = frames.shape[-2]
    lead = frames.shape[:-2]
    dtype = frames.dtype
    if fft_length == hop_length:
        flat = frames.reshape(lead + (n_frames * fft_length,))
        if full_length > flat.shape[-1]:
            flat = jnp.pad(flat, [(0, 0)] * len(lead)
                           + [(0, full_length - flat.shape[-1])])
        return flat[..., :full_length]
    r = -(-fft_length // hop_length)
    row = r * hop_length
    k = -(-n_frames // r)
    padf = k * r - n_frames
    if padf:
        frames = jnp.pad(frames, [(0, 0)] * len(lead)
                         + [(0, padf), (0, 0)])
    # (..., k, r, row); phase p holds frames m = q·r + p
    fr = frames.reshape(lead + (k, r, fft_length))
    if row > fft_length:
        fr = jnp.pad(fr, [(0, 0)] * len(lead)
                     + [(0, 0), (0, 0), (0, row - fft_length)])
    pad_len = max((r - 1) * hop_length + k * row, full_length)
    out = jnp.zeros(lead + (pad_len,), dtype=dtype)
    for p in range(r):
        seg = fr[..., :, p, :].reshape(lead + (k * row,))
        out = out.at[..., p * hop_length:
                     p * hop_length + k * row].add(seg)
    return out[..., :full_length]


def istft(stft_matrix: jnp.ndarray,
          hop_length: Optional[int] = None,
          win_length: Optional[int] = None,
          window=None,
          center: bool = True,
          normalized: bool = False,
          onesided: bool = True,
          length: Optional[int] = None,
          fft_length: Optional[int] = None,
          method: str = "fft",
          precision=None) -> jnp.ndarray:
    """Inverse STFT of ``stft_matrix (..., n_freqs, n_frames)`` (complex).

    Least-squares inverse matching ``torch.istft``: per-frame irFFT →
    synthesis-window multiply → overlap-add → divide by the summed squared
    window envelope (NOLA).  Raises at trace time if the window/hop pair
    violates NOLA on the retained samples.  [ref: torchaudio_contrib/
    istft.py — UNVERIFIED; call stack per SURVEY.md §3d]

    ``method="matmul"`` computes the per-frame irDFT as one MXU GEMM
    against the inverse real basis (onesided only) — the synthesis mirror
    of ``stft(method="matmul")``; useful in vocoder loops on TPU where
    GEMMs outrun the XLA FFT custom call.  ``precision`` as in ``stft``.
    """
    n_freqs = stft_matrix.shape[-2]
    n_frames = stft_matrix.shape[-1]
    if fft_length is None:
        fft_length = 2 * (n_freqs - 1) if onesided else n_freqs
    if hop_length is None:
        hop_length = fft_length // 4
    if win_length is None:
        win_length = fft_length

    w = _resolve_window(window, win_length, fft_length)

    spec = jnp.swapaxes(stft_matrix, -1, -2)  # (..., n_frames, n_freqs)
    if normalized:
        spec = spec * (fft_length ** 0.5)

    if method == "matmul":
        if not onesided:
            raise ValueError("istft method='matmul' supports onesided only")
        icr, ici = _idft_matrices(fft_length)
        re = jnp.real(spec).astype(jnp.float32)
        im = jnp.imag(spec).astype(jnp.float32)
        frames = (jnp.matmul(re, jnp.asarray(icr, jnp.float32),
                             precision=precision)
                  + jnp.matmul(im, jnp.asarray(ici, jnp.float32),
                               precision=precision))
    elif method == "fft":
        if onesided:
            frames = jnp.fft.irfft(spec, n=fft_length, axis=-1)
        else:
            frames = jnp.real(jnp.fft.ifft(spec, n=fft_length, axis=-1))
    else:
        raise ValueError(f"unknown istft method {method!r}")

    dtype = frames.dtype
    frames = frames * jnp.asarray(w, dtype=dtype)

    full_length = fft_length + hop_length * (n_frames - 1)
    out = _overlap_add(frames, fft_length, hop_length, full_length)

    env = cola_window_sum(w, hop_length, n_frames, full_length)

    pad = fft_length // 2 if center else 0
    start = pad
    if length is not None:
        # torch.istft zero-pads when the requested length exceeds the
        # reconstructable range — normalize the valid part, pad the rest
        stop = min(start + length, full_length)
    else:
        stop = full_length - pad

    env_kept = env[start:stop]
    if env_kept.size and np.min(env_kept) < 1e-11:
        raise ValueError(
            "window/hop pair violates NOLA on the output range; "
            "istft is not invertible for this configuration")

    out = out[..., start:stop] / jnp.asarray(env_kept, dtype=dtype)
    if length is not None and out.shape[-1] < length:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1)
                      + [(0, length - out.shape[-1])])
    return out
