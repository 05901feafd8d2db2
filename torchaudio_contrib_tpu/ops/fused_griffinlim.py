"""Fused Griffin-Lim: the ENTIRE iteration loop as ONE Pallas program
per clip.

The XLA GL loop (griffinlim.py) costs ~0.64 ms per iteration at
batch 8 × 5 s / fft 1024 — almost entirely per-op glue around ~10 µs of
GEMMs.  A first fused design (round 2/early round 3) ran one *grid
program per (clip, phase, freq-tile) per projection*; measured profile
showed that, too, was ~75 % per-program overhead (fft=2048: 2·9 grid
steps × 32 iterations × 8 clips ≈ 4.6 K programs ≈ 15 ms of the 20 ms
total).  This version collapses the whole solve to ``batch`` programs:

* **Grid ``(batch·channel,)``** — one program runs all ``n_iter``
  projections for its clip, with the spectrum state resident in the
  OUTPUT block (bf16, tile-interleaved ``[re_t | im_t]`` layout) and the
  momentum/normalize step fused in-kernel, so nothing crosses HBM
  between iterations except basis reads.
* **Basis tiles streamed by explicit DMA**: the windowed irDFT/DFT bases
  (18.8 MB at fft=2048 — far over VMEM) stay in HBM (`pl.ANY`); each
  freq tile's slab is `make_async_copy`'d into a 1 MB scratch right
  before its GEMM.  The ana basis is stored tile-stacked ``(FT·fft,
  2·FBT)`` so both copies are contiguous row-slabs.
* **Phase-decomposed 2-D overlap-add**: the clip buffer lives as a
  ``(L/hop, hop)`` 2-D view; frame ``j`` covers rows ``j..j+r−1``
  (``r = fft/hop``), so OLA and re-framing are ``r`` static 2-D
  slice-adds — compile time is flat in the number of frames (the
  round-2 kernel unrolled ~2·n_frames slice RMWs).  Requires
  ``fft % hop == 0``.

Boundary semantics: the kernel iterates in the *free-edge* (clamped
least-squares envelope, center=False) domain — mathematically the GL
family fixed point for the padded signal — rather than re-applying
reflect padding each iteration like the XLA loop.  Measured convergence
is identical (0.119 vs 0.115 at fft 1024); edge samples where the
window envelope vanishes are zeroed.  bf16 GEMMs/state measurably do
NOT affect GL convergence (verified against an all-f32 replica).

Eligibility (``fused_gl_supported``): onesided mags, ``fft % 128 == 0``,
``hop % 128 == 0``, ``fft % hop == 0``, and the per-clip working set
(dominated by the ``(rows, fft)`` f32 frames scratch — the bases are
streamed) must fit VMEM; the estimate uses the ACTUAL hop (the round-2
estimator hardcoded hop=fft/4 and undercounted for larger hops).
Off-kernel configs transparently run the XLA loop (with a warning — see
docs/API.md fallback table).
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

_FBT = 128                  # onesided bins per freq tile
_VMEM_BUDGET = 15_000_000   # ~1 MB empirical slack under Mosaic's 16 MB
                            # grid-size-dependent scoped-vmem (CLAUDE.md)


def _gl_vmem_est(rows, N, HOP, ft):
    r = N // HOP
    lrows = rows - 1 + r
    W2 = ft * 2 * _FBT
    b = rows * W2 * 2 * 2 * 2         # state0 in + state/out blocks ×2 buf
    b += rows * ft * _FBT * 2 * 2     # mag blocks (bf16) ×2 buf
    b += rows * W2 * 2                # prev (momentum memory, bf16)
    b += lrows * HOP * 4 * 2          # xv scratch + env block (f32)
    b += rows * N * 2                 # frames scratch (bf16, reused for
                                      # the re-framed values)
    b += 2 * 2 * (2 * _FBT * N * 2)   # syn + ana tile buffers, 2 slots
                                      # each (double-buffered DMA)
    b += rows * 2 * _FBT * 4          # per-tile reim temp f32
    return b


def fused_gl_supported(fft_length: int, hop_length: int,
                       n_frames: int) -> bool:
    """Kernel-path eligibility for :func:`griffin_lim`'s pallas method."""
    if not (fft_length % 128 == 0 and hop_length % 128 == 0
            and 0 < hop_length <= fft_length
            and fft_length % hop_length == 0):
        return False
    F = fft_length // 2 + 1
    ft = _cdiv(F, _FBT)
    rows = _round_up(n_frames, 8)
    return _gl_vmem_est(rows, fft_length, hop_length, ft) <= _VMEM_BUDGET


@functools.lru_cache(maxsize=16)
def _gl_bases_tiled(fft_length: int, win_key):
    """(syn (FT·2FBT, fft), ana (FT·fft, 2FBT)) bf16 in tile-slab
    layouts (both DMA-contiguous): syn tile t = rows ``[t·2FBT,
    (t+1)·2FBT)`` holding ``[icr_t·w; ici_t·w]``; ana tile t = rows
    ``[t·fft, (t+1)·fft)`` holding ``[w·cos_t | w·(−sin)_t]``.  Padded
    bins zero; irDFT conjugate weights and 1/N folded into ``syn``."""
    N = fft_length
    F = N // 2 + 1
    ft = _cdiv(F, _FBT)
    FP = ft * _FBT
    w = _resolve_window(win_key if win_key is not None else "hann", N, N)
    icr, ici = _idft_matrices(N)                 # (F, N)
    icr_p = np.zeros((FP, N), np.float32)
    ici_p = np.zeros((FP, N), np.float32)
    icr_p[:F] = icr * w[None, :]
    ici_p[:F] = ici * w[None, :]
    cos_m, msin_m = _dft_matrices(N, True)       # (N, F)
    cos_p = np.zeros((N, FP), np.float32)
    sin_p = np.zeros((N, FP), np.float32)
    cos_p[:, :F] = w[:, None] * cos_m
    sin_p[:, :F] = w[:, None] * msin_m
    syn = np.concatenate(
        [np.concatenate([icr_p[t * _FBT:(t + 1) * _FBT],
                         ici_p[t * _FBT:(t + 1) * _FBT]], axis=0)
         for t in range(ft)], axis=0)            # (FT·2FBT, N)
    ana = np.concatenate(
        [np.concatenate([cos_p[:, t * _FBT:(t + 1) * _FBT],
                         sin_p[:, t * _FBT:(t + 1) * _FBT]], axis=1)
         for t in range(ft)], axis=0)            # (FT·N, 2FBT)
    import ml_dtypes
    return (syn.astype(ml_dtypes.bfloat16), ana.astype(ml_dtypes.bfloat16),
            w, ft, FP)


@functools.lru_cache(maxsize=16)
def _build_gl_call(N: int, HOP: int, bc: int, rows: int, ft: int,
                   n_iter: int, momentum: float, interpret: bool,
                   tile_major: bool = False):
    if tile_major:
        return _build_gl_call_tile_major(N, HOP, bc, rows, ft,
                                         n_iter, momentum, interpret)
    W2T = 2 * _FBT
    W2 = ft * W2T
    r = N // HOP
    lrows = rows - 1 + r

    def kernel(state0_ref, mag_ref, syn_hbm, ana_hbm, env_ref, o_ref,
               prev, fr, xv, sbuf, abuf, sem_s, sem_a):
        o_ref[0] = state0_ref[0]
        prev[:] = jnp.zeros((rows, W2), jnp.bfloat16)

        # double-buffered basis streaming: serial start→wait per tile
        # measured ~60 of the ~80 µs/iteration at fft=2048 — prefetching
        # tile t+1 while tile t's GEMM runs hides both transfer and
        # issue latency
        def syn_copy(t, slot):
            return pltpu.make_async_copy(
                syn_hbm.at[pl.ds(t * W2T, W2T), :], sbuf.at[slot],
                sem_s.at[slot])

        def ana_copy(t, slot):
            return pltpu.make_async_copy(
                ana_hbm.at[pl.ds(t * N, N), :], abuf.at[slot],
                sem_a.at[slot])

        def iteration(it, carry):
            # synthesis: fr = Σ_t spec_t · syn_t.  fr is bf16 (GL
            # convergence is insensitive to bf16 state — verified vs an
            # all-f32 replica) — halves the dominant frames scratch so
            # fft=2048 vocoder clips fit VMEM
            syn_copy(0, 0).start()

            def syn_t(t, c):
                slot = jax.lax.rem(t, 2)

                @pl.when(t + 1 < ft)
                def _prefetch():
                    syn_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

                syn_copy(t, slot).wait()
                spec_t = o_ref[0, :, pl.ds(t * W2T, W2T)]
                part = jnp.dot(spec_t, sbuf[slot],
                               preferred_element_type=jnp.float32)

                @pl.when(t == 0)
                def _init():
                    fr[:] = part.astype(jnp.bfloat16)

                @pl.when(t > 0)
                def _acc():
                    fr[:] = (fr[:].astype(jnp.float32)
                             + part).astype(jnp.bfloat16)
                return c

            jax.lax.fori_loop(0, ft, syn_t, 0)
            ana_copy(0, 0).start()     # hide tile 0 behind the OLA work

            # phase-decomposed OLA on the (L/hop, hop) 2-D view: frame j
            # spans rows j..j+r-1, so each k adds a contiguous block
            xv[:] = jnp.zeros((lrows, HOP), jnp.float32)
            for k in range(r):
                xv[k:k + rows, :] = (xv[k:k + rows, :]
                                     + fr[:, k * HOP:(k + 1) * HOP]
                                     .astype(jnp.float32))
            xv[:] = xv[:] * env_ref[:]           # least-squares clamp
            for k in range(r):                   # re-frame (reuse fr)
                fr[:, k * HOP:(k + 1) * HOP] = \
                    xv[k:k + rows, :].astype(jnp.bfloat16)

            # analysis + momentum + magnitude projection, per tile
            def ana_t(t, c):
                slot = jax.lax.rem(t, 2)

                @pl.when(t + 1 < ft)
                def _prefetch():
                    ana_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

                ana_copy(t, slot).wait()
                reim = jnp.dot(fr[:], abuf[slot],
                               preferred_element_type=jnp.float32)
                pv = prev[:, pl.ds(t * W2T, W2T)].astype(jnp.float32)
                prev[:, pl.ds(t * W2T, W2T)] = reim.astype(jnp.bfloat16)
                upd = reim + momentum * (reim - pv)
                re, im = upd[:, :_FBT], upd[:, _FBT:]
                nrm = jnp.sqrt(re * re + im * im)
                sc = (mag_ref[0, :, pl.ds(t * _FBT, _FBT)]
                      / jnp.maximum(nrm, 1e-16))
                o_ref[0, :, pl.ds(t * W2T, W2T)] = jnp.concatenate(
                    [re * sc, im * sc], axis=1).astype(jnp.bfloat16)
                return c

            jax.lax.fori_loop(0, ft, ana_t, 0)
            return carry

        jax.lax.fori_loop(0, n_iter, iteration, 0)

    return pl.pallas_call(
        kernel,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, rows, W2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),          # state0
            pl.BlockSpec((1, rows, ft * _FBT), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),          # |mag| tiles
            pl.BlockSpec(memory_space=pl.ANY),              # syn (HBM)
            pl.BlockSpec(memory_space=pl.ANY),              # ana (HBM)
            pl.BlockSpec((lrows, HOP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),          # inv envelope
        ],
        out_specs=pl.BlockSpec((1, rows, W2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, rows, W2), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, W2), jnp.bfloat16),   # prev
                        pltpu.VMEM((rows, N), jnp.bfloat16),    # fr
                        pltpu.VMEM((lrows, HOP), jnp.float32),  # xv
                        pltpu.VMEM((2, W2T, N), jnp.bfloat16),  # syn bufs
                        pltpu.VMEM((2, N, W2T), jnp.bfloat16),  # ana bufs
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _build_gl_call_tile_major(N: int, HOP: int, bc: int, rows: int,
                              ft: int, n_iter: int, momentum: float,
                              interpret: bool):
    """Round-4 probe of PERFORMANCE.md's 'FBT probe' named next lever:
    spectrum state/mag/prev in TILE-MAJOR layout ``(ft, rows, 2FBT)``
    so every per-tile access indexes a LEADING dim (whole-tile-aligned
    memory offsets) instead of a dynamic lane offset ``pl.ds(t·2FBT)``
    into one wide ``(rows, ft·2FBT)`` plane.  Same math bit-for-bit
    modulo layout."""
    W2T = 2 * _FBT
    r = N // HOP
    lrows = rows - 1 + r

    def kernel(state0_ref, mag_ref, syn_hbm, ana_hbm, env_ref, o_ref,
               prev, fr, xv, sbuf, abuf, sem_s, sem_a):
        o_ref[0] = state0_ref[0]
        prev[:] = jnp.zeros((ft, rows, W2T), jnp.bfloat16)

        def syn_copy(t, slot):
            return pltpu.make_async_copy(
                syn_hbm.at[pl.ds(t * W2T, W2T), :], sbuf.at[slot],
                sem_s.at[slot])

        def ana_copy(t, slot):
            return pltpu.make_async_copy(
                ana_hbm.at[pl.ds(t * N, N), :], abuf.at[slot],
                sem_a.at[slot])

        def iteration(it, carry):
            syn_copy(0, 0).start()

            def syn_t(t, c):
                slot = jax.lax.rem(t, 2)

                @pl.when(t + 1 < ft)
                def _prefetch():
                    syn_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

                syn_copy(t, slot).wait()
                spec_t = o_ref[0, t]                 # (rows, 2FBT)
                part = jnp.dot(spec_t, sbuf[slot],
                               preferred_element_type=jnp.float32)

                @pl.when(t == 0)
                def _init():
                    fr[:] = part.astype(jnp.bfloat16)

                @pl.when(t > 0)
                def _acc():
                    fr[:] = (fr[:].astype(jnp.float32)
                             + part).astype(jnp.bfloat16)
                return c

            jax.lax.fori_loop(0, ft, syn_t, 0)
            ana_copy(0, 0).start()

            xv[:] = jnp.zeros((lrows, HOP), jnp.float32)
            for k in range(r):
                xv[k:k + rows, :] = (xv[k:k + rows, :]
                                     + fr[:, k * HOP:(k + 1) * HOP]
                                     .astype(jnp.float32))
            xv[:] = xv[:] * env_ref[:]
            for k in range(r):
                fr[:, k * HOP:(k + 1) * HOP] = \
                    xv[k:k + rows, :].astype(jnp.bfloat16)

            def ana_t(t, c):
                slot = jax.lax.rem(t, 2)

                @pl.when(t + 1 < ft)
                def _prefetch():
                    ana_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

                ana_copy(t, slot).wait()
                reim = jnp.dot(fr[:], abuf[slot],
                               preferred_element_type=jnp.float32)
                pv = prev[t].astype(jnp.float32)
                prev[t] = reim.astype(jnp.bfloat16)
                upd = reim + momentum * (reim - pv)
                re, im = upd[:, :_FBT], upd[:, _FBT:]
                nrm = jnp.sqrt(re * re + im * im)
                sc = mag_ref[0, t] / jnp.maximum(nrm, 1e-16)
                o_ref[0, t] = jnp.concatenate(
                    [re * sc, im * sc], axis=1).astype(jnp.bfloat16)
                return c

            jax.lax.fori_loop(0, ft, ana_t, 0)
            return carry

        jax.lax.fori_loop(0, n_iter, iteration, 0)

    return pl.pallas_call(
        kernel,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, ft, rows, W2T), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # state0
            pl.BlockSpec((1, ft, rows, _FBT), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # |mag| tiles
            pl.BlockSpec(memory_space=pl.ANY),              # syn (HBM)
            pl.BlockSpec(memory_space=pl.ANY),              # ana (HBM)
            pl.BlockSpec((lrows, HOP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),          # inv envelope
        ],
        out_specs=pl.BlockSpec((1, ft, rows, W2T),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, ft, rows, W2T),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((ft, rows, W2T), jnp.bfloat16),
                        pltpu.VMEM((rows, N), jnp.bfloat16),
                        pltpu.VMEM((lrows, HOP), jnp.float32),
                        pltpu.VMEM((2, W2T, N), jnp.bfloat16),
                        pltpu.VMEM((2, N, W2T), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )


def _gl_pallas(mag_specgrams, fft_length, hop_length, window, n_iter,
               momentum, length, center, key=None, tile_major=False):
    """The kernel-path GL loop; caller guarantees eligibility."""
    N, HOP = fft_length, hop_length
    F = N // 2 + 1
    lead = mag_specgrams.shape[:-2]
    n_frames = mag_specgrams.shape[-1]
    mag = mag_specgrams.astype(jnp.float32).reshape((-1, F, n_frames))
    bc = mag.shape[0]
    rows = _round_up(n_frames, 8)
    r = N // HOP
    lrows = rows - 1 + r
    T_used = (n_frames - 1) * HOP + N

    win_key = _hashable_window(window)
    syn, ana, w, ft, FP = _gl_bases_tiled(N, win_key)
    env = cola_window_sum(w, HOP, n_frames, lrows * HOP)
    inv_env = jnp.asarray(
        np.where(env > 1e-3 * env.max(),
                 1.0 / np.maximum(env, 1e-8), 0.0).astype(np.float32))
    env2d = inv_env.reshape(lrows, HOP)
    syn_j, ana_j = jnp.asarray(syn), jnp.asarray(ana)

    # mag → (bc, rows, FT·FBT) tiled layout (zero-padded rows/bins)
    magL = jnp.swapaxes(mag, -1, -2)
    magL = jnp.pad(magL, ((0, 0), (0, rows - n_frames), (0, FP - F)))
    magT4 = magL.reshape(bc, rows, ft, _FBT)

    if tile_major:
        def merge_reim(re, im):
            # (bc, rows, ft, FBT) pair → (bc, ft, rows, 2FBT)
            return jnp.concatenate([jnp.transpose(re, (0, 2, 1, 3)),
                                    jnp.transpose(im, (0, 2, 1, 3))],
                                   axis=-1)
    else:
        def merge_reim(re, im):
            return jnp.stack([re, im], axis=-2).reshape(
                bc, rows, ft * 2 * _FBT)

    if key is not None:
        phase = jax.random.uniform(key, magT4.shape, jnp.float32,
                                   -jnp.pi, jnp.pi)
        state0 = merge_reim(magT4 * jnp.cos(phase),
                            magT4 * jnp.sin(phase))
    else:
        state0 = merge_reim(magT4, jnp.zeros_like(magT4))
    state0 = state0.astype(jnp.bfloat16)
    if tile_major:
        magT = jnp.transpose(magT4, (0, 2, 1, 3)).astype(jnp.bfloat16)
    else:
        magT = magT4.reshape(bc, rows, ft * _FBT).astype(jnp.bfloat16)

    solve = _build_gl_call(N, HOP, bc, rows, ft, int(n_iter),
                           float(momentum), _interpret(),
                           bool(tile_major))
    state = solve(state0, magT, syn_j, ana_j, env2d).astype(jnp.float32)

    # final clamped-envelope inverse (XLA side, exact irfft)
    if tile_major:
        # (bc, ft, rows, 2FBT) → per-half (bc, rows, FP)
        re2 = jnp.transpose(state[..., :_FBT], (0, 2, 1, 3)) \
            .reshape(bc, rows, FP)[:, :n_frames, :F]
        im2 = jnp.transpose(state[..., _FBT:], (0, 2, 1, 3)) \
            .reshape(bc, rows, FP)[:, :n_frames, :F]
    else:
        s4 = state.reshape(bc, rows, ft, 2, _FBT)
        re2 = s4[..., 0, :].reshape(bc, rows, FP)[:, :n_frames, :F]
        im2 = s4[..., 1, :].reshape(bc, rows, FP)[:, :n_frames, :F]
    spec_f = jax.lax.complex(re2, im2)
    fr_x = jnp.fft.irfft(spec_f, n=N, axis=-1) * jnp.asarray(w, jnp.float32)
    y = _overlap_add(fr_x, N, HOP, T_used) * inv_env[:T_used]

    pad = N // 2 if center else 0
    y = y[..., pad:]
    if length is not None:
        if y.shape[-1] >= length:
            y = y[..., :length]
        else:
            y = jnp.pad(y, ((0, 0), (0, length - y.shape[-1])))
    return y.reshape(lead + (y.shape[-1],))
