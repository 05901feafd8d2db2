"""Fused Griffin-Lim: every projection iteration as ONE Pallas program.

The XLA GL loop (griffinlim.py) costs ~0.64 ms per iteration at
batch 8 × 5 s / fft 1024 — almost entirely per-op glue (transposes,
complex↔real conversion, overlap-add materialization) around ~6 µs of
GEMMs.  This kernel runs a complete projection per clip per program —
irDFT GEMM → in-kernel overlap-add (static 1-D slice adds) →
least-squares envelope clamp → re-framing → windowed-DFT GEMM — with
the spectrum resident in VMEM throughout.  Measured (v5e, batch 8 × 5 s
@ 22.05 kHz, fft 1024/hop 256, 32 iterations, device-loop):
**11.2 ms vs 20.3 ms** for the XLA loop at identical spectral
convergence (0.113 vs 0.115; bf16 GEMMs/state measurably do not affect
GL convergence — verified against an all-f32 replica).

Boundary semantics: the kernel iterates in the *free-edge* (clamped
least-squares envelope, center=False) domain — mathematically the GL
family fixed point for the padded signal — rather than re-applying
reflect padding each iteration like the XLA loop.  Measured convergence
is identical; edge samples where the window envelope vanishes are
zeroed.

Eligibility (``fused_gl_supported``): onesided mags, ``fft % 128 == 0``,
``hop % 128 == 0``, ``hop <= fft``, and the per-clip working set
(spectrum + frames + both bases) must fit VMEM — fft 1024 covers
clips to ~40 s; fft 2048's bases alone are 18.8 MB, so it falls back.
Off-kernel configs transparently run the XLA loop.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stft import (stft as _stft, _idft_matrices, _dft_matrices,
                   _resolve_window, _overlap_add)
from .windows import cola_window_sum
from .fused import _interpret, _round_up, _cdiv, _hashable_window

__all__ = ["fused_gl_supported"]

_VMEM_BUDGET = 16_000_000   # estimator overcounts ~2 MB vs the
                            # compile-verified fft=1024 batch-8x5s
                            # config (est 15.4M, runs); fft=2048's
                            # bases alone (18.8M) stay excluded


def _gl_vmem_est(rows, N, FP):
    W2 = 2 * FP
    L_pad = _round_up((rows - 1) * (N // 4) + N, 1024)  # worst small hop
    b = rows * W2 * 2 * 2 * 2        # spec in + out blocks, bf16, x2 buf
    b += 2 * W2 * N * 2              # syn + ana bases (bf16, resident)
    b += rows * N * 4                # frames scratch f32
    b += rows * N * 2                # reframe scratch bf16
    b += rows * W2 * 4               # dft temp f32
    b += 2 * L_pad * 4               # xbuf scratch + env input
    return b


def fused_gl_supported(fft_length: int, hop_length: int,
                       n_frames: int) -> bool:
    """Kernel-path eligibility for :func:`griffin_lim`'s pallas method."""
    if not (fft_length % 128 == 0 and hop_length % 128 == 0
            and 0 < hop_length <= fft_length):
        return False
    F = fft_length // 2 + 1
    FP = _round_up(F, 128)
    rows = _round_up(n_frames, 8)
    return _gl_vmem_est(rows, fft_length, FP) <= _VMEM_BUDGET


@functools.lru_cache(maxsize=16)
def _gl_bases(fft_length: int, win_key, fbt_pad: int):
    """(syn (2FP, fft), ana (fft, 2FP)) bf16 with the window, irDFT
    conjugate weights, and 1/N folded in; padded bins zero."""
    N = fft_length
    F = N // 2 + 1
    FP = fbt_pad
    w = _resolve_window(win_key if win_key is not None else "hann", N, N)
    icr, ici = _idft_matrices(N)                 # (F, N)
    syn = np.zeros((2 * FP, N), np.float32)
    syn[:F] = icr * w[None, :]
    syn[FP:FP + F] = ici * w[None, :]
    cos_m, msin_m = _dft_matrices(N, True)       # (N, F)
    ana = np.zeros((N, 2 * FP), np.float32)
    ana[:, :F] = w[:, None] * cos_m
    ana[:, FP:FP + F] = w[:, None] * msin_m
    import ml_dtypes
    return (syn.astype(ml_dtypes.bfloat16), ana.astype(ml_dtypes.bfloat16),
            w)


@functools.lru_cache(maxsize=16)
def _build_gl_call(N: int, HOP: int, bc: int, rows: int, FP: int,
                   L_pad: int, interpret: bool):
    W2 = 2 * FP

    def kernel(spec_ref, syn_ref, ana_ref, env_ref, o_ref, fr, xbuf, fr2):
        spec = spec_ref[0]                       # (rows, W2) bf16
        fr[:] = jnp.dot(spec, syn_ref[:],
                        preferred_element_type=jnp.float32)
        xbuf[:] = jnp.zeros((L_pad,), jnp.float32)
        for j in range(rows):                    # in-kernel overlap-add
            xbuf[j * HOP: j * HOP + N] = (xbuf[j * HOP: j * HOP + N]
                                          + fr[j, :])
        xbuf[:] = xbuf[:] * env_ref[:]           # least-squares clamp
        for j in range(rows):                    # re-frame
            fr2[j, :] = xbuf[j * HOP: j * HOP + N].astype(jnp.bfloat16)
        o_ref[0] = jnp.dot(fr2[:], ana_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, rows, W2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W2, N), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, W2), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L_pad,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, W2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, rows, W2), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, N), jnp.float32),
                        pltpu.VMEM((L_pad,), jnp.float32),
                        pltpu.VMEM((rows, N), jnp.bfloat16)],
        interpret=interpret,
    )


def _gl_pallas(mag_specgrams, fft_length, hop_length, window, n_iter,
               momentum, length, center):
    """The kernel-path GL loop; caller guarantees eligibility."""
    N, HOP = fft_length, hop_length
    F = N // 2 + 1
    FP = _round_up(F, 128)
    lead = mag_specgrams.shape[:-2]
    n_frames = mag_specgrams.shape[-1]
    mag = mag_specgrams.astype(jnp.float32).reshape((-1, F, n_frames))
    bc = mag.shape[0]
    rows = _round_up(n_frames, 8)
    L = (rows - 1) * HOP + N
    L_pad = _round_up(L, 1024)
    T_used = (n_frames - 1) * HOP + N

    win_key = _hashable_window(window)
    syn, ana, w = _gl_bases(N, win_key, FP)
    env = cola_window_sum(w, HOP, n_frames, L_pad)
    inv_env = jnp.asarray(
        np.where(env > 1e-3 * env.max(),
                 1.0 / np.maximum(env, 1e-8), 0.0).astype(np.float32))
    syn_j, ana_j = jnp.asarray(syn), jnp.asarray(ana)

    # mag → (bc, rows, FP) row-major layout
    magL = jnp.swapaxes(mag, -1, -2)
    magL = jnp.pad(magL, ((0, 0), (0, rows - n_frames), (0, FP - F)))

    project = _build_gl_call(N, HOP, bc, rows, FP, L_pad, _interpret())

    def body(i, carry):
        state, prev = carry
        rebuilt = project(state, syn_j, ana_j, inv_env) \
            .astype(jnp.float32)
        upd = rebuilt + momentum * (rebuilt - prev)
        re, im = upd[..., :FP], upd[..., FP:]
        nrm = jnp.sqrt(re * re + im * im)
        scale = magL / jnp.maximum(nrm, 1e-16)
        new = jnp.concatenate([re * scale, im * scale], axis=-1) \
            .astype(jnp.bfloat16)
        return new, rebuilt

    state0 = jnp.concatenate([magL, jnp.zeros_like(magL)], axis=-1) \
        .astype(jnp.bfloat16)
    state, _ = jax.lax.fori_loop(
        0, n_iter, body, (state0, jnp.zeros(state0.shape, jnp.float32)))

    # final clamped-envelope inverse (XLA; spec is (bc, rows, FP) pairs)
    st = state.astype(jnp.float32)
    spec_f = jax.lax.complex(st[..., :FP][:, :n_frames, :F],
                             st[..., FP:][:, :n_frames, :F])
    fr = jnp.fft.irfft(spec_f, n=N, axis=-1) * jnp.asarray(w, jnp.float32)
    y = _overlap_add(fr, N, HOP, T_used) * inv_env[:T_used]

    pad = N // 2 if center else 0
    y = y[..., pad:]
    if length is not None:
        if y.shape[-1] >= length:
            y = y[..., :length]
        else:
            y = jnp.pad(y, ((0, 0), (0, length - y.shape[-1])))
    return y.reshape(lead + (y.shape[-1],))
