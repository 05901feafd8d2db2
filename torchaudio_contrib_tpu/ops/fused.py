"""Fused mel-spectrogram Pallas kernels — forward AND backward in one pass.

Motivation (measured on TPU v5e, batch 32 × 30 s @ 22.05 kHz): the
XLA-composed chain costs ~32 ms/iter, dominated by HBM round-trips
between framing, FFT, power, and mel stages.  Fusing everything into one
Pallas program keeps each tile of frames resident in VMEM from raw
samples to log-mel output, so HBM traffic drops to "read the waveform
once, write the mel once" — the SURVEY §7 step-5 "Pallas if XLA leaves
HBM round-trips on the table" case, and it does.

Forward kernel — grid ``(batch·channel, frame_blocks, freq_tiles)``,
freq innermost (sequential on-core, enabling accumulation):

1. at ``ft == 0``: async-DMA the block's samples from HBM into VMEM and
   build the ``(TB, fft)`` frame matrix with ``TB`` static row slices
   (no gather; persists in scratch across freq tiles).  For hops that
   are not 128-aligned (e.g. the 10 ms ASR hop=160), framing instead
   happens XLA-side (dense phase-decomposed copies) and the kernel
   reads pre-split frame blocks — same GEMM pipeline, ~1 extra HBM
   round-trip of the frames buffer.  Non-128-multiple ``fft_length``
   (e.g. Whisper's 400) zero-pads the frame axis to the next 128
   multiple with matching zero basis rows;
2. MXU GEMMs against this freq-tile's slice of the *windowed DFT basis*
   ``[W·cos | W·sin]`` → ``(TB, 2·FBT)`` re/im;
3. power ``re²+im²`` (VPU);
4. partial mel GEMM against the tile's filterbank rows, accumulated into
   the output block across freq tiles;
5. at the last tile: optional in-place dB (VPU).

Precision: the MXU is bf16; a single-pass product costs ~2e-3 relative
error — far past the parity budget.  ``precision="split3"`` (default)
splits each operand into bf16 hi+lo parts and sums the hi·hi + hi·lo +
lo·hi products (~4e-6 relative error at 3× the MXU work).  The three
products are issued as TWO GEMMs via operand concatenation:
``[hi|lo]·[lo;hi] + hi·hi`` — same FLOPs, better MXU scheduling than
three separate passes.  (Pallas exposes no bf16_3x dot; HIGHEST compiles
pathologically here, so the split is manual.)  ``precision="fast"``
keeps the single bf16 pass for throughput-over-parity workloads.

Backward (training — the reference's trainable-frontend use case): the
forward saves the re/im spectrum tiles as a residual (one extra HBM
write, ~0.5 ms — far cheaper than recomputing the DFT GEMMs), and ONE
merged Pallas kernel (grid ``(row_blocks, freq_tiles)``) produces both
gradients:

* frames grad: ``dp = dmel·FBᵀ`` (MXU), ``dre/dim = 2·re/im·dp`` (VPU),
  ``dF += [dre|dim]·Bᵀ`` (MXU, accumulated over freq tiles directly in
  the output block).  The dB gate → ``dmel`` recompute (from the saved
  output) and its hi/lo operand split happen XLA-side, keeping the
  kernel a pure GEMM pipeline; the overlap-add of ``dF`` back to the
  waveform is the hand-written adjoint of the phase-decomposed framing
  (``stft._overlap_add`` — r dense shifted adds, any hop).
* filterbank grad, fused into the same kernel (its operands — dmel and
  the reim tile — are already resident): ``dFB_t += p_tᵀ·dmel``
  accumulates into a ``(freq_tiles, FBT, mels)`` output whose constant
  index map keeps it in VMEM across the whole grid.  Fusing removes a
  second full pass over the dmel/reim residuals (~0.5 GB at config 2)
  and a second grid of program overheads.

Backward precision mirrors the forward: ``split3`` gradients hold
≤1e-4 parity vs the XLA chain's VJP; ``precision="fast"`` also runs the
backward single-pass (bf16-grade gradients at ~3× less backward MXU
work — the SGD-throughput mode).  Off-TPU and for unsupported configs
the op transparently runs the jnp chain and its AD-derived VJP.

Mosaic constraints honored throughout: values stay 2-D (3-D reshapes are
unsupported shape casts) and HBM DMA offsets/lengths are 1024-aligned.
Set ``TAC_FUSED_INTERPRET=1`` to run the kernels through the Pallas
interpreter (CPU tests of the real kernel paths).
"""
from __future__ import annotations

import functools
import math
import os

import ml_dtypes
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stft import stft as _stft, frame_signal as _frame_signal
from .windows import get_window
from .complexops import complex_norm
from .filters import apply_filterbank
from .db import amplitude_to_db

__all__ = ["fused_melspectrogram", "fused_mel_supported"]

_LN10_INV_10 = 10.0 / math.log(10.0)   # d(dB)/d(mel) = this / mel
_DB_TO_LIN = math.log(10.0) / 10.0     # mel = ref·exp(dB·this)

# Tile tunables (TPU v5e, measured — docs/PERFORMANCE.md).  These are
# UPPER BOUNDS: the VMEM estimators below shrink the frame-block sizes
# per config so every build fits the ~16 MB scoped-VMEM budget.
_FREQ_TILE = 128   # onesided bins per grid step (shared fwd/bwd: the
                   # residual spectrum layout is tiled by this)
_TB = 512          # frames per block, forward (split3)
_TB_FAST = 768     # forward, precision="fast": half the scratch (no lo
                   # columns) affords a bigger block -> fewer programs
                   # (measured 6.0 -> 5.75 ms at config 2)
_TB_BWD = 512      # frames per block, backward kernel
_VMEM_BUDGET_FWD = 13_000_000   # bytes; empirically, builds estimated
                                # (13M: fft=3072's TB=384 build estimated
                                # 13.5M and failed the real compile —
                                # the boundary needs ~1M of slack;
                                # config 2 estimates ~11M at TB=512 so
                                # the headline tiles are unaffected)
_VMEM_BUDGET_BWD = 15_000_000   # above these fail Mosaic's 16 MB limit.
                                # Calibrated against observed compile
                                # outcomes of the MERGED backward kernel:
                                # Mosaic's real scoped-vmem is grid-size
                                # dependent (config 2 at TB=384 compiled
                                # on a (128,9) grid but OOM'd at 18.57 MB
                                # on a (2,9) grid), so the budget is set
                                # to the conservative side: TB=256 for
                                # config 2 (costs ~0.3 ms vs TB=384 but
                                # compiles at every input size).


def _fwd_vmem_est(N, HOP, TB, FBT, m_pad, split, save_spec, frames_in):
    """Rough VMEM bytes for one forward program (blocks double-buffered
    by the Pallas pipeline + scratch + major value temporaries)."""
    CN = 2 * N if split else N
    b = CN * 2 * FBT * 2 * 2                     # basis blocks ×2
    b += (2 * FBT if split else FBT) * m_pad * 2 * 2
    b += TB * m_pad * 4 * 2                      # out blocks ×2
    if save_spec:
        b += TB * 2 * FBT * 4 * 2                # reim blocks ×2
    if frames_in:
        b += TB * CN * 2 * 2                     # fcat blocks ×2
    else:
        b += TB * CN * 2                         # fcat scratch
        b += _round_up((TB - 1) * HOP + N, 1024) * 4   # xbuf
    b += TB * 2 * FBT * 4 + TB * FBT * 4 + TB * 2 * FBT * 2  # temps
    return b


def _bwd_vmem_est(N, TB, FBT, m_pad, split=True, ft_count=0):
    mc = (2 if split else 1) * m_pad
    bt = (4 if split else 2) * FBT
    b = TB * mc * 2 * 2                          # dmel [hi|lo] blocks
    b += TB * 2 * FBT * 4 * 2                    # reim blocks
    b += mc * FBT * 2 * 2                        # FBᵀ blocks
    b += bt * N * 2 * 3                          # Bᵀ blocks (deep-buffered)
    b += TB * N * 4 * 2                          # out blocks
    b += TB * FBT * 4 + TB * 2 * FBT * 4        # temps: dp, dreim
    if split:
        b += TB * 4 * FBT * 2                    # dcat temp
    # fused-dFB extras: the (ft, FBT, M) accumulator block (constant
    # index map — single-buffered for the whole grid) + p/phi/plo temps
    b += ft_count * FBT * m_pad * 4
    b += TB * FBT * (4 + 2 + (2 if split else 0))
    return b


def _interpret() -> bool:
    return os.environ.get("TAC_FUSED_INTERPRET", "0") == "1"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def fused_mel_supported(fft_length: int, hop_length: int) -> bool:
    """True when the Pallas kernel covers this config — any ``fft_length
    >= 2`` and any positive hop.  128-aligned fft/hop pairs use in-kernel
    framing (fastest); any other config (e.g. the Whisper-style fft=400 /
    hop=160) uses XLA-side framing feeding the same kernel, with the
    frame axis zero-padded to the next 128 multiple (the padded basis
    rows are zero, so padded lanes contribute nothing)."""
    return fft_length >= 2 and hop_length > 0


def _hop_aligned(fft_length: int, hop_length: int) -> bool:
    """In-kernel DMA framing needs lane/DMA-aligned row slices."""
    return (fft_length % hop_length == 0 and hop_length % 128 == 0
            and fused_mel_supported(fft_length, hop_length))


def _hashable_window(window):
    if window is None or isinstance(window, str):
        return window
    return tuple(np.asarray(window, dtype=np.float64).ravel().tolist())


# ---------------------------------------------------------------------------
# constants: windowed DFT basis (static → float64 NumPy, cached)
# ---------------------------------------------------------------------------

def _np_split_bf16(a):
    a32 = np.asarray(a, np.float32)
    hi = a32.astype(ml_dtypes.bfloat16)
    lo = (a32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=16)
def _basis_f32(fft_length: int, win_key, win_length, fbt: int):
    """Windowed onesided DFT basis, freq-padded and tiled: float32
    ``(fft, FT·2·FBT)`` with tile t columns ``[re_t | im_t]``.
    ``win_length < fft_length`` zero-pad-centers the window (torch
    semantics) — it simply folds into the basis."""
    n_freqs = fft_length // 2 + 1
    ft_count = _cdiv(n_freqs, fbt)
    f_pad = ft_count * fbt

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
    n_pad = _round_up(fft_length, 128)
    if n_pad > fft_length:
        # sublane-pad the frame axis so any fft_length (e.g. Whisper's
        # 400) maps onto 128-tiled MXU GEMMs; zero rows match the zero
        # padding of the frame matrix columns
        wr = np.pad(wr, ((0, n_pad - fft_length), (0, 0)))
        wi = np.pad(wi, ((0, n_pad - fft_length), (0, 0)))

    tiles = []
    for t in range(ft_count):
        s = slice(t * fbt, (t + 1) * fbt)
        tiles.append(np.concatenate([wr[:, s], wi[:, s]], axis=1))
    basis = np.concatenate(tiles, axis=1).astype(np.float32)
    return basis, n_freqs, ft_count, f_pad


@functools.lru_cache(maxsize=16)
def _fwd_basis_stack(fft_length: int, win_key, win_length, fbt: int,
                     split: bool) -> np.ndarray:
    """bf16 basis for the forward kernel.  split: ``(2·fft, FT·2FBT)``
    rows ``[lo; hi]`` so ``[fhi|flo]·this + fhi·this[fft:]`` is the
    3-product split GEMM; fast: just ``hi`` ``(fft, FT·2FBT)``."""
    basis, *_ = _basis_f32(fft_length, win_key, win_length, fbt)
    hi, lo = _np_split_bf16(basis)
    if split:
        return np.concatenate([lo, hi], axis=0)
    return hi


@functools.lru_cache(maxsize=16)
def _bwd_basis_stack(fft_length: int, win_key, win_length, fbt: int,
                     split: bool) -> np.ndarray:
    """bf16 transposed basis for the dframes kernel.  split:
    ``(FT·4FBT, fft)`` with tile-t rows ``[Bᵀ_lo_t (2FBT); Bᵀ_hi_t
    (2FBT)]``; fast: ``(FT·2FBT, fft)`` of hi only."""
    basis, n_freqs, ft_count, f_pad = _basis_f32(fft_length, win_key,
                                                 win_length, fbt)
    hi, lo = _np_split_bf16(basis)
    rows = []
    for t in range(ft_count):
        s = slice(t * 2 * fbt, (t + 1) * 2 * fbt)
        hiT = np.ascontiguousarray(hi[:, s].T)
        if split:
            rows.append(np.concatenate(
                [np.ascontiguousarray(lo[:, s].T), hiT], axis=0))
        else:
            rows.append(hiT)
    return np.concatenate(rows, axis=0)


def _split_hi_lo_xla(a):
    """f32 → (hi, lo) bf16 pair for TRACED (XLA-side) operands.

    The naive ``hi = a.astype(bf16); lo = (a - hi.astype(f32)).astype(bf16)``
    is silently destroyed under jit on TPU: with
    ``--xla_allow_excess_precision`` XLA simplifies
    ``convert_f32(convert_bf16(a)) → a`` and the lo part folds to exactly
    zero, degrading every split-precision GEMM to a single bf16 pass
    (verified on v5e: jit'd ``sum(|lo|) == 0``).  Masking the low mantissa
    bits makes ``hi`` exactly representable in bf16, so any such
    simplification is value-preserving.  The rounding (round-half-to-even,
    matching the hardware bf16 convert) is done in integer bits so
    |lo| ≤ 2⁻⁹|a| as with a native convert.  In-kernel splits are
    unaffected (Mosaic does not apply this rewrite).
    """
    a32 = a.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(a32, jnp.uint32)
    rounded = bits + np.uint32(0x7FFF) + ((bits >> 16) & np.uint32(1))
    hi32 = jax.lax.bitcast_convert_type(
        rounded & np.uint32(0xFFFF0000), jnp.float32)
    hi = hi32.astype(jnp.bfloat16)          # exact conversion
    lo = (a32 - hi32).astype(jnp.bfloat16)
    return hi, lo


# traced filterbank staging (the filterbank may be a trainable param) ------

def _fb_padded(filterbank, n_freqs: int, f_pad: int, m_pad: int):
    fb = jnp.asarray(filterbank, jnp.float32)
    fbp = jnp.zeros((f_pad, m_pad), jnp.float32)
    return fbp.at[:n_freqs, :fb.shape[1]].set(fb)


def _fb_fwd_stack(fbp, ft: int, fbt: int, m_pad: int, split: bool):
    """(FT·2FBT, M) with tile-t rows [lo_t; hi_t] (split) or hi (FT·FBT, M)."""
    if not split:
        return fbp.astype(jnp.bfloat16)
    hi, lo = _split_hi_lo_xla(fbp)
    lo3 = lo.reshape(ft, fbt, m_pad)
    hi3 = hi.reshape(ft, fbt, m_pad)
    return jnp.concatenate([lo3, hi3], axis=1).reshape(ft * 2 * fbt, m_pad)


def _fb_bwd_stack(fbp, ft: int, fbt: int, m_pad: int, split: bool):
    """split: (FT·2M, FBT) with tile-t rows [FBᵀ_lo_t (M); FBᵀ_hi_t (M)];
    fast: (FT·M, FBT) of hi only."""
    hi, lo = _split_hi_lo_xla(fbp)
    hiT = hi.reshape(ft, fbt, m_pad).transpose(0, 2, 1)   # (ft, M, FBT)
    if not split:
        return hiT.reshape(ft * m_pad, fbt)
    loT = lo.reshape(ft, fbt, m_pad).transpose(0, 2, 1)
    return jnp.concatenate([loT, hiT], axis=1).reshape(ft * 2 * m_pad, fbt)


def _split_cat_cols(a):
    """f32 (R, C) → bf16 (R, 2C) ``[hi | lo]`` (XLA-side operand split)."""
    hi, lo = _split_hi_lo_xla(a)
    return jnp.concatenate([hi, lo], axis=1)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _stream_stride(fft_length: int, hop_length: int, n_blocks: int,
                   tb: int) -> int:
    """Per-stream length in the flattened waveform: fits every block's
    (1024-rounded) DMA window, itself a 1024-multiple."""
    blk = _round_up((tb - 1) * hop_length + fft_length, 1024)
    last_start = (n_blocks - 1) * tb * hop_length
    return _round_up(last_start + blk, 1024)


@functools.lru_cache(maxsize=32)
def _build_fwd_call(N: int, HOP: int, m_pad: int, n_blocks: int, bc: int,
                    ft_count: int, to_db: bool, db_ref: float, amin: float,
                    split: bool, tb: int, fbt: int, frames_in: bool,
                    save_spec: bool, interpret: bool):
    TB, FBT = tb, fbt
    G = bc * n_blocks
    if not frames_in:
        BLK = _round_up((TB - 1) * HOP + N, 1024)
        stride = _stream_stride(N, HOP, n_blocks, TB)
        assert (TB * HOP) % 1024 == 0, (TB, HOP)
    CN = 2 * N if split else N          # frame-cat width
    db_off = _LN10_INV_10 * math.log(max(amin, db_ref)) if to_db else 0.0

    def dft_mel(fcat, bstack_ref, fbstack_ref):
        """(TB, CN) bf16 frames → (reim (TB,2FBT) f32, mel partial)."""
        if split:
            reim = jnp.dot(fcat, bstack_ref[:],
                           preferred_element_type=jnp.float32)
            reim = reim + jnp.dot(fcat[:, :N], bstack_ref[N:, :],
                                  preferred_element_type=jnp.float32)
        else:
            reim = jnp.dot(fcat, bstack_ref[:],
                           preferred_element_type=jnp.float32)
        p = (reim[:, :FBT] * reim[:, :FBT]
             + reim[:, FBT:] * reim[:, FBT:])
        if split:
            phi = p.astype(jnp.bfloat16)
            plo = (p - phi.astype(jnp.float32)).astype(jnp.bfloat16)
            pcat = jnp.concatenate([phi, plo], axis=1)
            part = jnp.dot(pcat, fbstack_ref[:],
                           preferred_element_type=jnp.float32)
            part = part + jnp.dot(phi, fbstack_ref[FBT:, :],
                                  preferred_element_type=jnp.float32)
        else:
            part = jnp.dot(p.astype(jnp.bfloat16), fbstack_ref[:],
                           preferred_element_type=jnp.float32)
        return reim, part

    def epilogue(ft, o_ref, part, reim, reim_ref):
        if save_spec:
            reim_ref[0] = reim

        @pl.when(ft == 0)
        def _init():
            o_ref[0] = part

        @pl.when(ft > 0)
        def _acc():
            o_ref[0] = o_ref[0] + part

        if to_db:
            @pl.when(ft == ft_count - 1)
            def _db():
                o_ref[0] = (_LN10_INV_10
                            * jnp.log(jnp.maximum(o_ref[0], amin)) - db_off)

    if frames_in:
        def kernel(fcat_ref, bstack_ref, fbstack_ref, *outs):
            o_ref = outs[0]
            reim_ref = outs[1] if save_spec else None
            ft = pl.program_id(2)
            reim, part = dft_mel(fcat_ref[:], bstack_ref, fbstack_ref)
            epilogue(ft, o_ref, part, reim, reim_ref)

        in_specs = [
            pl.BlockSpec((TB, CN), lambda b, i, t: (b * n_blocks + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CN, 2 * FBT), lambda b, i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * FBT if split else FBT, m_pad),
                         lambda b, i, t: (t, 0), memory_space=pltpu.VMEM),
        ]
        scratch_shapes = []
    else:
        def kernel(x_hbm, bstack_ref, fbstack_ref, *rest):
            if save_spec:
                o_ref, reim_ref = rest[0], rest[1]
                scr = rest[2:]
            else:
                o_ref, reim_ref = rest[0], None
                scr = rest[1:]
            xbuf, fcat_s, sem = scr
            b = pl.program_id(0)
            ib = pl.program_id(1)
            ft = pl.program_id(2)

            @pl.when(ft == 0)
            def _load():
                start = b * stride + ib * (TB * HOP)
                dma = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(start, BLK)], xbuf, sem)
                dma.start()
                dma.wait()

                for j in range(TB):  # static row slices — no gather
                    row = xbuf[j * HOP: j * HOP + N]
                    hi = row.astype(jnp.bfloat16)
                    fcat_s[j, 0:N] = hi
                    if split:
                        fcat_s[j, N:] = (
                            row - hi.astype(jnp.float32)
                        ).astype(jnp.bfloat16)

            reim, part = dft_mel(fcat_s[:], bstack_ref, fbstack_ref)
            epilogue(ft, o_ref, part, reim, reim_ref)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),        # waveform (HBM)
            pl.BlockSpec((CN, 2 * FBT), lambda b, i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * FBT if split else FBT, m_pad),
                         lambda b, i, t: (t, 0), memory_space=pltpu.VMEM),
        ]
        scratch_shapes = [
            pltpu.VMEM((BLK,), jnp.float32),
            pltpu.VMEM((TB, CN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ]

    out_shape = [jax.ShapeDtypeStruct((bc, n_blocks * TB, m_pad),
                                      jnp.float32)]
    out_specs = [pl.BlockSpec((1, TB, m_pad), lambda b, i, t: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    if save_spec:
        out_shape.append(jax.ShapeDtypeStruct(
            (bc, n_blocks * TB, ft_count * 2 * FBT), jnp.float32))
        out_specs.append(pl.BlockSpec((1, TB, 2 * FBT),
                                      lambda b, i, t: (b, i, t),
                                      memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(bc, n_blocks, ft_count),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _dmel_from(g, y, to_db: bool, db_ref: float, amin: float):
    """d(loss)/d(mel) from the output cotangent, recomputing the dB gate
    from the saved output: mel_clamped = max(ref,amin)·10^(y/10).

    The gate carries a 1e-4 relative tolerance: entries clamped to
    ``amin`` in the forward (silence, zero-weight mel bins) reconstruct
    through the f32 exp∘log round trip as ``amin·(1 ± ~4e-6)`` — a
    strict ``> amin`` test then leaks ``g/amin ≈ 1e7``-scale garbage
    gradients into clamped entries (the chain's VJP gives exactly 0
    there).  Values genuinely within 1e-4 of the clamp are zeroed too;
    their true gradient is the knife-edge of the clamp and zero is the
    conservative side."""
    if not to_db:
        return g
    mel_c = max(db_ref, amin) * jnp.exp(y * _DB_TO_LIN)
    return jnp.where(mel_c > amin * (1.0 + 1e-4),
                     g * (_LN10_INV_10 / mel_c), 0.0)


@functools.lru_cache(maxsize=32)
def _build_bwd_call(N: int, m_pad: int, g_rows: int, ft_count: int,
                    tb: int, fbt: int, split: bool, interpret: bool):
    """Merged backward kernel: grid (row_blocks, freq_tiles), freq
    innermost so the (TB, N) dframes output block accumulates the
    per-tile dF partials.  ``dmel`` arrives pre-split (XLA-side): blocks
    (TB, 2M) bf16 ``[hi | lo]`` (just hi for ``split=False``) — keeps
    the kernel pure-GEMM and its VMEM small.

    The filterbank gradient is fused in (it needs exactly the operands
    already resident: dmel and the reim tile): a second output
    ``(ft, FBT, M)`` with a CONSTANT index map stays in VMEM across the
    whole grid, each step accumulating ``p_tᵀ·dmel`` into its tile-t
    slab — one kernel instead of two, saving a full second pass over
    the mcat/reim residuals (~0.5 GB at config 2) plus a grid of
    program overheads."""
    TB, FBT = tb, fbt
    n_rb = g_rows // TB
    MC = 2 * m_pad if split else m_pad

    def kernel(mcat_ref, reim_ref, fbT_ref, bT_ref, o_ref, o2_ref):
        gi = pl.program_id(0)
        t = pl.program_id(1)
        mcat = mcat_ref[:]
        dp = jnp.dot(mcat, fbT_ref[:], preferred_element_type=jnp.float32)
        if split:
            dp = dp + jnp.dot(mcat[:, :m_pad], fbT_ref[m_pad:, :],
                              preferred_element_type=jnp.float32)
        reim = reim_ref[:]                       # (TB, 2FBT) f32
        dreim = jnp.concatenate(
            [2.0 * reim[:, :FBT] * dp, 2.0 * reim[:, FBT:] * dp], axis=1)
        dhi = dreim.astype(jnp.bfloat16)
        if split:
            dlo = (dreim - dhi.astype(jnp.float32)).astype(jnp.bfloat16)
            dcat = jnp.concatenate([dhi, dlo], axis=1)   # (TB, 4FBT)
            part = jnp.dot(dcat, bT_ref[:],
                           preferred_element_type=jnp.float32)
            part = part + jnp.dot(dhi, bT_ref[2 * FBT:, :],
                                  preferred_element_type=jnp.float32)
        else:
            part = jnp.dot(dhi, bT_ref[:],
                           preferred_element_type=jnp.float32)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = part

        @pl.when(t > 0)
        def _acc():
            o_ref[:] = o_ref[:] + part

        # fused dFB: p_tᵀ·dmel accumulated into the tile-t slab
        p = (reim[:, :FBT] * reim[:, :FBT]
             + reim[:, FBT:] * reim[:, FBT:])
        phi = p.astype(jnp.bfloat16)

        def dotT(a, b):  # contract the TB axis: (TB,FBT)ᵀ·(TB,M)
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        part2 = dotT(phi, mcat[:, :m_pad])
        if split:
            plo = (p - phi.astype(jnp.float32)).astype(jnp.bfloat16)
            part2 = part2 + dotT(phi, mcat[:, m_pad:]) \
                + dotT(plo, mcat[:, :m_pad])

        @pl.when(gi == 0)
        def _init2():
            o2_ref[t] = part2

        @pl.when(gi > 0)
        def _acc2():
            o2_ref[t] = o2_ref[t] + part2

    return pl.pallas_call(
        kernel,
        grid=(n_rb, ft_count),
        in_specs=[
            pl.BlockSpec((TB, MC), lambda gi, t: (gi, 0),
                         memory_space=pltpu.VMEM),        # dmel [hi|lo]
            pl.BlockSpec((TB, 2 * FBT), lambda gi, t: (gi, t),
                         memory_space=pltpu.VMEM),        # reim residual
            pl.BlockSpec((MC, FBT), lambda gi, t: (t, 0),
                         memory_space=pltpu.VMEM),        # FBᵀ stack
            pl.BlockSpec(((4 if split else 2) * FBT, N),
                         lambda gi, t: (t, 0),
                         memory_space=pltpu.VMEM),        # Bᵀ stack
        ],
        out_specs=[
            pl.BlockSpec((TB, N), lambda gi, t: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft_count, FBT, m_pad), lambda gi, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_rows, N), jnp.float32),
            jax.ShapeDtypeStruct((ft_count, FBT, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# dispatch / public op
# ---------------------------------------------------------------------------

def _kernel_eligible(fft_length, hop_length, power) -> bool:
    if not (power == 2.0 and fused_mel_supported(fft_length, hop_length)):
        return False
    return jax.default_backend() == "tpu" or _interpret()


def _jnp_reference(x, fft_length, hop_length, window, fb, power, to_db,
                   db_ref, amin, method="fft", precision=None,
                   win_length=None):
    """The mathematically-identical XLA chain (fallback + fallback VJP)."""
    spec = _stft(x, fft_length, hop_length, win_length=win_length,
                 window=window, center=False,
                 method=method, precision=precision)
    p = complex_norm(spec, power)
    mel = apply_filterbank(p, fb)
    if to_db:
        mel = amplitude_to_db(mel, ref=db_ref, amin=amin, power=power)
    return mel


def _kernel_forward(waveform, filterbank, fft_length, hop_length, window,
                    to_db, db_ref, amin, precision, win_length,
                    save_spec: bool):
    """Run the forward Pallas kernel.  Assumes :func:`_kernel_eligible`.

    Returns ``(out, aux)``: ``out`` is the public ``(..., mels, frames)``
    result; ``aux`` is ``(y_raw, reim_raw)`` in the kernel's raw
    ``(bc, rows, ·)`` layout when ``save_spec`` else ``None``.
    """
    if precision not in ("split3", "fast"):
        raise ValueError(f"unknown precision {precision!r}")
    split = precision == "split3"
    N, HOP = fft_length, hop_length
    num_mels = filterbank.shape[-1]
    m_pad = _round_up(num_mels, 128)
    win_key = _hashable_window(window)
    basis, n_freqs, ft_count, f_pad = _basis_f32(N, win_key, win_length,
                                                 _FREQ_TILE)
    if filterbank.shape[0] != n_freqs:
        raise ValueError(f"filterbank must have {n_freqs} rows, got "
                         f"{filterbank.shape[0]}")

    lead = waveform.shape[:-1]
    T = waveform.shape[-1]
    if T < N:
        raise ValueError(f"input too short: {T} < fft_length={N}")
    n_frames = 1 + (T - N) // HOP
    aligned = _hop_aligned(N, HOP)
    N_pad = N if aligned else _round_up(N, 128)  # kernel frame width
    TB = _TB if split else _TB_FAST
    while TB > 128 and _fwd_vmem_est(N_pad, HOP, TB, _FREQ_TILE, m_pad,
                                     split, save_spec,
                                     not aligned) > _VMEM_BUDGET_FWD:
        TB -= 128
    n_blocks = _cdiv(n_frames, TB)
    x2 = waveform.reshape((-1, T)).astype(jnp.float32)
    bc = x2.shape[0]

    fbp = _fb_padded(filterbank, n_freqs, f_pad, m_pad)
    fbstack = _fb_fwd_stack(fbp, ft_count, _FREQ_TILE, m_pad, split)

    if aligned:
        stride = _stream_stride(N, HOP, n_blocks, TB)
        if stride > T:
            x = jnp.pad(x2, ((0, 0), (0, stride - T)))
        elif stride < T:
            # trailing samples beyond the last block's DMA window belong
            # to no full frame
            x = x2[:, :stride]
        else:
            x = x2
        x = x.reshape((bc * stride,))  # 1-D: 1024-aligned DMA slices
        bstack = jnp.asarray(_fwd_basis_stack(N, win_key, win_length,
                                              _FREQ_TILE, split))
        call = _build_fwd_call(N, HOP, m_pad, n_blocks, bc, ft_count,
                               to_db, float(db_ref), float(amin), split,
                               TB, _FREQ_TILE, False, save_spec,
                               _interpret())
        res = call(x, bstack, fbstack)
    else:
        frames = _frame_signal(x2, N, HOP)           # (bc, n_frames, N)
        rows = n_blocks * TB
        frames = jnp.pad(frames, ((0, 0), (0, rows - n_frames),
                                  (0, N_pad - N)))
        frames = frames.reshape(bc * rows, N_pad)
        fcat = _split_cat_cols(frames) if split \
            else frames.astype(jnp.bfloat16)
        bstack = jnp.asarray(_fwd_basis_stack(N, win_key, win_length,
                                              _FREQ_TILE, split))
        call = _build_fwd_call(N_pad, HOP, m_pad, n_blocks, bc, ft_count,
                               to_db, float(db_ref), float(amin), split,
                               TB, _FREQ_TILE, True, save_spec,
                               _interpret())
        res = call(fcat, bstack, fbstack)

    y_raw, reim_raw = (res if save_spec else (res, None))
    out = y_raw[:, :n_frames, :num_mels]
    out = jnp.swapaxes(out, -1, -2)                  # (bc, M, n_frames)
    out = out.reshape(lead + out.shape[1:])
    return out, ((y_raw, reim_raw) if save_spec else None)


def _kernel_backward(g, waveform, filterbank, y_raw, reim_raw,
                     fft_length, hop_length, window, to_db, db_ref, amin,
                     precision, win_length):
    """Cotangents (dwaveform, dfilterbank) via the backward kernels.

    ``precision`` mirrors the forward: "split3" (default; grad parity
    ≤1e-4 vs the XLA chain's VJP) or "fast" (single bf16 pass per GEMM,
    ~2e-3 — fine for SGD-style training at ~3× less backward MXU work).
    """
    split = precision == "split3"
    N, HOP = fft_length, hop_length
    num_mels = filterbank.shape[-1]
    win_key = _hashable_window(window)
    _, n_freqs, ft_count, f_pad = _basis_f32(N, win_key, win_length,
                                             _FREQ_TILE)
    m_pad = y_raw.shape[-1]
    bc, rows = y_raw.shape[0], y_raw.shape[1]
    lead = waveform.shape[:-1]
    T = waveform.shape[-1]
    n_frames = 1 + (T - N) // HOP
    N_pad = _round_up(N, 128)           # kernel frame width (basis rows)
    TB = _TB_BWD
    while TB > 128 and _bwd_vmem_est(N_pad, TB, _FREQ_TILE, m_pad, split,
                                     ft_count) > _VMEM_BUDGET_BWD:
        TB -= 128  # 128-step search (finer than halving)
    # pad total rows to the kernel tile (padded rows carry dmel = 0 and
    # contribute nothing)
    g_rows = _round_up(bc * rows, TB)
    row_pad = g_rows - bc * rows

    # cotangent → kernel layout: (..., M, frames) → (rows, m_pad), zero
    # padding in both frame and mel directions (padded lanes contribute
    # 0); the dB gate + hi/lo operand split happen here, XLA-side, so
    # the kernels are pure GEMM pipelines
    g2 = g.reshape((bc, num_mels, n_frames))
    g2 = jnp.swapaxes(g2, -1, -2).astype(jnp.float32)
    g2 = jnp.pad(g2, ((0, 0), (0, rows - n_frames),
                      (0, m_pad - num_mels)))
    g2 = g2.reshape(bc * rows, m_pad)
    y2 = y_raw.reshape(bc * rows, m_pad)
    dmel = _dmel_from(g2, y2, to_db, db_ref, amin)
    mhi, mlo = _split_hi_lo_xla(dmel)
    mcat = (jnp.concatenate([mhi, mlo], axis=1)      # (rows, 2M) bf16
            if split else mhi)
    reim2 = reim_raw.reshape(bc * rows, ft_count * 2 * _FREQ_TILE)
    if row_pad:
        mcat = jnp.pad(mcat, ((0, row_pad), (0, 0)))
        reim2 = jnp.pad(reim2, ((0, row_pad), (0, 0)))

    fbp = _fb_padded(filterbank, n_freqs, f_pad, m_pad)
    fbT = _fb_bwd_stack(fbp, ft_count, _FREQ_TILE, m_pad, split)
    bT = jnp.asarray(_bwd_basis_stack(N, win_key, win_length, _FREQ_TILE,
                                      split))

    bwd_call = _build_bwd_call(N_pad, m_pad, g_rows, ft_count, TB,
                               _FREQ_TILE, split, _interpret())
    dframes, dfb3 = bwd_call(mcat, reim2, fbT, bT)   # (g_rows, N_pad)
    dframes = (dframes[:bc * rows]
               .reshape(bc, rows, N_pad)[:, :n_frames, :N])

    # overlap-add = exact adjoint of the phase-decomposed framing: x[t]
    # accumulates dF over every frame containing t; samples past the
    # last full frame get zero gradient
    from .stft import _overlap_add
    full = (n_frames - 1) * HOP + N
    dx2 = _overlap_add(dframes, N, HOP, full)
    if T > full:
        dx2 = jnp.pad(dx2, ((0, 0), (0, T - full)))
    dx = dx2.reshape(lead + (T,)).astype(waveform.dtype)

    dfb = dfb3.reshape(ft_count * _FREQ_TILE, m_pad)  # (f_pad, m_pad)
    dfb = dfb[:n_freqs, :num_mels].astype(filterbank.dtype)
    return dx, dfb


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
                         win_length=None,
                         center: bool = False,
                         pad_mode: str = "reflect") -> jnp.ndarray:
    """Mel (or log-mel) spectrogram of ``waveform (..., T)`` as one
    fused TPU kernel.

    ``filterbank`` is ``(fft_length//2+1, num_mels)`` (e.g. from
    :func:`~torchaudio_contrib_tpu.ops.create_mel_filter`).  Returns
    ``(..., num_mels, n_frames)``.  ``precision``: ``"split3"`` (~4e-6
    relative, default) or ``"fast"`` (single bf16 pass, ~2e-3 relative).
    Any ``fft_length >= 2`` / ``hop_length > 0`` runs the kernel on TPU;
    falls back to the jnp chain off-TPU and for ``power != 2``.
    Differentiable: training runs dedicated backward Pallas kernels fed
    by a saved-spectrum residual (see module docs).

    ``center=True`` applies the torch-style ``fft_length//2`` symmetric
    ``pad_mode`` padding XLA-side (one fused elementwise copy, its
    adjoint handled by JAX AD) so the output matches
    ``Melspectrogram()(x)`` frame-for-frame; ``center=False`` (default)
    keeps streaming-compatible semantics.
    """
    if center:
        from .stft import _pad_center
        waveform = _pad_center(waveform, fft_length // 2, pad_mode)
    return _fused_core(waveform, filterbank, fft_length, hop_length,
                       window, power, to_db, db_ref, amin, precision,
                       win_length)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def _fused_core(waveform, filterbank, fft_length, hop_length, window,
                power, to_db, db_ref, amin, precision, win_length):
    """center=False kernel core (custom_vjp boundary)."""
    return _fused_fwd_impl(waveform, filterbank, fft_length, hop_length,
                           window, power, to_db, db_ref, amin, precision,
                           win_length)


def _fused_fwd_impl(waveform, filterbank, fft_length, hop_length, window,
                    power, to_db, db_ref, amin, precision,
                    win_length=None):
    if not _kernel_eligible(fft_length, hop_length, power):
        return _jnp_reference(waveform, fft_length, hop_length, window,
                              filterbank, power, to_db, db_ref, amin,
                              win_length=win_length)
    out, _ = _kernel_forward(waveform, filterbank, fft_length, hop_length,
                             window, to_db, db_ref, amin, precision,
                             win_length, save_spec=False)
    return out


def _fused_vjp_fwd(waveform, filterbank, fft_length, hop_length, window,
                   power, to_db, db_ref, amin, precision, win_length):
    if not _kernel_eligible(fft_length, hop_length, power):
        out = _jnp_reference(waveform, fft_length, hop_length, window,
                             filterbank, power, to_db, db_ref, amin,
                             win_length=win_length)
        return out, (waveform, filterbank, None, None)
    out, aux = _kernel_forward(waveform, filterbank, fft_length,
                               hop_length, window, to_db, db_ref, amin,
                               precision, win_length, save_spec=True)
    y_raw, reim_raw = aux
    return out, (waveform, filterbank, y_raw, reim_raw)


def _fused_vjp_bwd(fft_length, hop_length, window, power, to_db, db_ref,
                   amin, precision, win_length, residuals, g):
    waveform, filterbank, y_raw, reim_raw = residuals
    if reim_raw is not None:
        return _kernel_backward(g, waveform, filterbank, y_raw, reim_raw,
                                fft_length, hop_length, window, to_db,
                                db_ref, amin, precision, win_length)
    # fallback: the matmul-STFT chain has the cheapest VJP on TPU (GEMM
    # adjoints are GEMMs) at HIGH precision; off-TPU the fft chain is
    # both exact and fastest
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


_fused_core.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
