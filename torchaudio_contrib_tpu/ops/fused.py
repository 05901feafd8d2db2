"""Fused mel-spectrogram Pallas kernel — the whole pipeline in one pass.

Motivation (measured on TPU v5e, batch 32 × 30 s @ 22.05 kHz): the
XLA-composed chain costs ~32 ms/iter, dominated by HBM round-trips
between framing, FFT, power, and mel stages (the framing gather alone was
~40 % of the original 50 ms).  Fusing everything into one Pallas program
keeps each tile of frames resident in VMEM from raw samples to log-mel
output, so HBM traffic drops to "read the waveform once, write the mel
once" — the SURVEY §7 step-5 "Pallas if XLA leaves HBM round-trips on the
table" case, and it does.

Kernel structure — grid ``(batch·channel, frame_blocks, freq_tiles)``,
freq innermost (sequential on-core, enabling accumulation):

1. at ``ft == 0``: async-DMA the block's samples from HBM into VMEM and
   build the ``(TB, fft)`` frame matrix with ``TB`` static row slices
   (no gather; persists in scratch across freq tiles);
2. MXU GEMMs against this freq-tile's slice of the *windowed DFT basis*
   ``[W·cos | W·sin]`` → ``(TB, 2·FBT)`` re/im;
3. power ``re²+im²`` (VPU);
4. partial mel GEMM against the tile's filterbank rows, accumulated into
   the output block across freq tiles;
5. at the last tile: optional in-place dB (VPU).

Precision: the MXU is bf16; a single-pass product costs ~2e-3 relative
error — far past the parity budget.  ``precision="split3"`` (default)
splits each operand into bf16 hi+lo parts and sums three GEMMs
(``hi·hi + hi·lo + lo·hi``), recovering ~4e-6 relative error at 3× the
MXU work (Pallas exposes no bf16_3x dot; HIGHEST compiles pathologically
here, so the split is manual).  ``precision="fast"`` keeps the single
bf16 pass for throughput-over-parity workloads.  Mosaic constraints
honored throughout: values stay 2-D (3-D reshapes are unsupported shape
casts) and HBM DMA offsets/lengths are 1024-aligned.

Gradients: the op carries a ``custom_vjp`` whose backward re-runs the
mathematically-identical jnp chain under ``jax.vjp`` — forward pays the
fused-kernel price, backward the (already well-fused) XLA price, and
parity tests pin the two paths together.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stft import stft as _stft
from .windows import get_window
from .complexops import complex_norm
from .filters import apply_filterbank
from .db import amplitude_to_db

__all__ = ["fused_melspectrogram", "fused_mel_supported"]

_LN10_INV_10 = 10.0 / math.log(10.0)
_FREQ_TILE = 256          # onesided bins per grid step
_TB = 256                 # frames per block


def fused_mel_supported(fft_length: int, hop_length: int) -> bool:
    """The kernel needs hop | fft and 128-aligned sizes (VMEM lane tiling
    keeps every in-kernel slice aligned; other configs use the XLA chain)."""
    return (fft_length % hop_length == 0 and fft_length > hop_length
            and hop_length % 128 == 0 and fft_length % 128 == 0)


def _hashable_window(window):
    if window is None or isinstance(window, str):
        return window
    return tuple(np.asarray(window, dtype=np.float64).ravel().tolist())


def _split_bf16(a):
    """f32 array → (hi, lo) bf16 pair with hi + lo ≈ a to ~2^-17.
    Works on NumPy constants and traced jnp arrays alike."""
    a32 = jnp.asarray(a, jnp.float32)
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=16)
def _basis_and_sizes(fft_length: int, win_key, win_length=None):
    """Windowed onesided DFT basis, freq-padded and tiled: float32
    ``(fft, FT·2·FBT)`` with tile t columns ``[re_t | im_t]``.
    ``win_length < fft_length`` zero-pad-centers the window (torch
    semantics) — it simply folds into the basis."""
    n_freqs = fft_length // 2 + 1
    ft_count = -(-n_freqs // _FREQ_TILE)
    f_pad = ft_count * _FREQ_TILE

    if win_length is None:
        win_length = fft_length
    w = get_window(win_key if win_key is not None else "hann", win_length)
    if win_length < fft_length:
        left = (fft_length - win_length) // 2
        w = np.pad(w, (left, fft_length - win_length - left))
    n = np.arange(fft_length, dtype=np.float64)[:, None]
    f = np.arange(f_pad, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * f / fft_length
    wr = (w[:, None] * np.cos(ang))
    wi = (w[:, None] * -np.sin(ang))
    wr[:, n_freqs:] = 0.0  # padded bins contribute nothing
    wi[:, n_freqs:] = 0.0

    tiles = []
    for t in range(ft_count):
        s = slice(t * _FREQ_TILE, (t + 1) * _FREQ_TILE)
        tiles.append(np.concatenate([wr[:, s], wi[:, s]], axis=1))
    basis = np.concatenate(tiles, axis=1).astype(np.float32)
    return basis, n_freqs, ft_count, f_pad


def _stream_stride(fft_length: int, hop_length: int, n_blocks: int,
                   tb: int = None) -> int:
    """Per-stream length in the flattened waveform: fits every block's
    (1024-rounded) DMA window, itself a 1024-multiple."""
    if tb is None:
        tb = _TB
    blk = -(-((tb - 1) * hop_length + fft_length) // 1024) * 1024
    last_start = (n_blocks - 1) * tb * hop_length
    return -(-(last_start + blk) // 1024) * 1024


@functools.lru_cache(maxsize=16)
def _build_fused_call(fft_length: int, hop_length: int, num_mels: int,
                      n_blocks: int, bc: int, ft_count: int, to_db: bool,
                      db_ref: float, amin: float, split: bool,
                      tb: int = None, fbt: int = None):
    # tile sizes participate in the cache key (they are module-level
    # tunables; a mutated global must not serve stale compiled calls)
    TB = tb if tb is not None else _TB
    FBT_ = fbt if fbt is not None else _FREQ_TILE
    N, HOP = fft_length, hop_length
    BLK = -(-((TB - 1) * HOP + N) // 1024) * 1024
    FBT = FBT_
    stride = _stream_stride(N, HOP, n_blocks, TB)

    def dot3(xhi, xlo, bhi_ref, blo_ref):
        """Split-precision product: hi·hi + hi·lo + lo·hi on the MXU."""
        out = jnp.dot(xhi, bhi_ref[:], preferred_element_type=jnp.float32)
        if split:
            out = out + jnp.dot(xhi, blo_ref[:],
                                preferred_element_type=jnp.float32)
            out = out + jnp.dot(xlo, bhi_ref[:],
                                preferred_element_type=jnp.float32)
        return out

    def kernel(x_hbm, bhi_ref, blo_ref, fbhi_ref, fblo_ref, o_ref,
               xbuf, frames, sem):
        # x_hbm is the flattened (bc·stride,) waveform — 1-D so slices
        # never fight (sublane, lane) HBM tiling; offsets/lengths are
        # 1024-aligned by construction.
        ib = pl.program_id(1)
        ft = pl.program_id(2)

        @pl.when(ft == 0)
        def _load():
            i_bc = pl.program_id(0)
            start = i_bc * stride + ib * (TB * HOP)
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, BLK)], xbuf, sem)
            dma.start()
            dma.wait()
            for j in range(TB):  # static row slices — no gather
                frames[j, :] = xbuf[j * HOP: j * HOP + N]

        fr = frames[:]
        fhi = fr.astype(jnp.bfloat16)
        flo = (fr - fhi.astype(jnp.float32)).astype(jnp.bfloat16)
        reim = dot3(fhi, flo, bhi_ref, blo_ref)          # (TB, 2·FBT)
        p = (reim[:, :FBT] * reim[:, :FBT]
             + reim[:, FBT:] * reim[:, FBT:])
        phi = p.astype(jnp.bfloat16)
        plo = (p - phi.astype(jnp.float32)).astype(jnp.bfloat16)
        partial = dot3(phi, plo, fbhi_ref, fblo_ref)     # (TB, M)

        @pl.when(ft == 0)
        def _init():
            o_ref[0] = partial

        @pl.when(ft > 0)
        def _acc():
            o_ref[0] = o_ref[0] + partial

        if to_db:
            @pl.when(ft == ft_count - 1)
            def _db():
                o_ref[0] = (_LN10_INV_10 * jnp.log(jnp.maximum(o_ref[0],
                                                               amin))
                            - _LN10_INV_10 * math.log(max(amin, db_ref)))

    const = pl.BlockSpec  # brevity below
    return pl.pallas_call(
        kernel,
        grid=(bc, n_blocks, ft_count),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # waveform (HBM)
            const((N, 2 * FBT), lambda b, i, t: (0, t),
                  memory_space=pltpu.VMEM),               # basis hi
            const((N, 2 * FBT), lambda b, i, t: (0, t),
                  memory_space=pltpu.VMEM),               # basis lo
            const((FBT, num_mels), lambda b, i, t: (t, 0),
                  memory_space=pltpu.VMEM),               # filterbank hi
            const((FBT, num_mels), lambda b, i, t: (t, 0),
                  memory_space=pltpu.VMEM),               # filterbank lo
        ],
        out_specs=pl.BlockSpec((1, TB, num_mels), lambda b, i, t: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, n_blocks * TB, num_mels),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLK,), jnp.float32),
            pltpu.VMEM((TB, N), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def fused_melspectrogram(waveform: jnp.ndarray,
                         filterbank: jnp.ndarray,
                         fft_length: int = 2048,
                         hop_length: int = 512,
                         window="hann",
                         power: float = 2.0,
                         to_db: bool = True,
                         db_ref: float = 1.0,
                         amin: float = 1e-7,
                         precision: str = "split3",
                         win_length=None) -> jnp.ndarray:
    """Mel (or log-mel) spectrogram of ``waveform (..., T)`` with
    ``center=False`` frame semantics, as one fused TPU kernel.

    ``filterbank`` is ``(fft_length//2+1, num_mels)`` (e.g. from
    :func:`~torchaudio_contrib_tpu.ops.create_mel_filter`).  Returns
    ``(..., num_mels, n_frames)``.  ``precision``: ``"split3"`` (~4e-6
    relative, default) or ``"fast"`` (single bf16 pass, ~2e-3 relative).
    Falls back to the jnp chain off-TPU, for unsupported configs, and for
    ``power != 2``.  Differentiable: backward runs the XLA chain's VJP.
    """
    return _fused_fwd_impl(waveform, filterbank, fft_length, hop_length,
                           window, power, to_db, db_ref, amin, precision,
                           win_length)


def _jnp_reference(x, fft_length, hop_length, window, fb, power, to_db,
                   db_ref, amin, method="fft", precision=None,
                   win_length=None):
    """The mathematically-identical XLA chain (backward pass + fallback)."""
    spec = _stft(x, fft_length, hop_length, win_length=win_length,
                 window=window, center=False,
                 method=method, precision=precision)
    p = complex_norm(spec, power)
    mel = apply_filterbank(p, fb)
    if to_db:
        mel = amplitude_to_db(mel, ref=db_ref, amin=amin, power=power)
    return mel


def _fused_fwd_impl(waveform, filterbank, fft_length, hop_length, window,
                    power, to_db, db_ref, amin, precision,
                    win_length=None):
    on_tpu = jax.default_backend() == "tpu"
    if (not on_tpu or power != 2.0
            or not fused_mel_supported(fft_length, hop_length)):
        return _jnp_reference(waveform, fft_length, hop_length, window,
                              filterbank, power, to_db, db_ref, amin,
                              win_length=win_length)
    if precision not in ("split3", "fast"):
        raise ValueError(f"unknown precision {precision!r}")

    N, HOP, TB = fft_length, hop_length, _TB
    num_mels = filterbank.shape[-1]
    basis, n_freqs, ft_count, f_pad = _basis_and_sizes(
        N, _hashable_window(window), win_length)
    if filterbank.shape[0] != n_freqs:
        raise ValueError(
            f"filterbank must have {n_freqs} rows, got "
            f"{filterbank.shape[0]}")

    lead = waveform.shape[:-1]
    T = waveform.shape[-1]
    if T < N:
        raise ValueError(f"input too short: {T} < fft_length={N}")
    n_frames = 1 + (T - N) // HOP
    n_blocks = -(-n_frames // TB)
    stride = _stream_stride(N, HOP, n_blocks)
    x = waveform.reshape((-1, T)).astype(jnp.float32)
    if stride > T:
        x = jnp.pad(x, ((0, 0), (0, stride - T)))
    elif stride < T:
        # trailing samples beyond the last block's (1024-rounded) DMA
        # window belong to no full frame — drop them so the flatten below
        # lands exactly on (bc·stride,)
        x = x[:, :stride]
    bc = x.shape[0]
    x = x.reshape((bc * stride,))  # 1-D: kernel DMAs 1024-aligned slices

    bhi, blo = _split_bf16(basis)
    fbp = jnp.zeros((f_pad, num_mels), jnp.float32)
    fbp = fbp.at[:n_freqs].set(jnp.asarray(filterbank, jnp.float32))
    fbhi, fblo = _split_bf16(fbp)

    call = _build_fused_call(N, HOP, num_mels, n_blocks, bc, ft_count,
                             to_db, float(db_ref), float(amin),
                             precision == "split3", _TB, _FREQ_TILE)
    out = call(x, bhi, blo, fbhi, fblo)         # (bc, n_blocks·TB, M)
    out = out[:, :n_frames, :]
    out = jnp.swapaxes(out, -1, -2)             # (bc, M, n_frames)
    return out.reshape(lead + out.shape[1:])


def _fused_vjp_fwd(waveform, filterbank, fft_length, hop_length, window,
                   power, to_db, db_ref, amin, precision, win_length):
    out = _fused_fwd_impl(waveform, filterbank, fft_length, hop_length,
                          window, power, to_db, db_ref, amin, precision,
                          win_length)
    return out, (waveform, filterbank)


def _fused_vjp_bwd(fft_length, hop_length, window, power, to_db, db_ref,
                   amin, precision, win_length, residuals, g):
    waveform, filterbank = residuals
    # the matmul-STFT chain has the cheapest VJP on TPU (GEMM adjoints
    # are GEMMs; measured 32 ms vs 52 ms for the fft chain at batch
    # 32×30 s) at HIGH precision (~2e-5 gradient error); off-TPU the fft
    # chain is both exact and fastest
    if jax.default_backend() == "tpu":
        method, prec = "matmul", jax.lax.Precision.HIGH
    else:
        method, prec = "fft", None
    _, vjp = jax.vjp(
        lambda x, fb: _jnp_reference(x, fft_length, hop_length, window,
                                     fb, power, to_db, db_ref, amin,
                                     method=method, precision=prec,
                                     win_length=win_length),
        waveform, filterbank)
    return vjp(g)


fused_melspectrogram.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
