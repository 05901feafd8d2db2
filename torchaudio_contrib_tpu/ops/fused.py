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
error — far past the parity budget.  The split tiers decompose each f32
operand into ``ns`` bf16 parts (hi, [mid,] lo) and keep every cross
product whose weight is ≥ 2^(-8·ns):

* ``ns=1`` (``"fast"``): single bf16 pass, ~2e-3 relative.
* ``ns=2`` (``"split3"``): hi·hi + hi·lo + lo·hi, ~2⁻¹⁶ operand error
  (~4e-6 typical) at 3× the MXU work.
* ``ns=3`` (``"split6"``): the six products with weight ≥ 2⁻¹⁶
  (bf16x6, XLA-HIGHEST-equivalent) — ~2⁻²⁴ operand error, f32-chain
  parity even where re/im nearly cancel, at 6× the MXU work.

All tiers issue as ``ns`` GEMMs via nested operand concatenation:
with frames ``[p₀|…|p_{ns−1}]`` and the basis stacked ``[q_{ns−1};…;q₀]``,
GEMM ``j`` multiplies the first ``ns−j`` frame parts against the last
``ns−j`` basis slabs, producing exactly the products with part-index sum
``ns−1−j`` — same FLOPs as separate passes, better MXU scheduling.
(Pallas exposes no bf16_3x/6x dot; HIGHEST compiles pathologically here,
so the split is manual.)  ``precision="auto"`` (default) picks
``split3`` when the config has ≥8 linear bins per mel band and
``split6`` below — small-fft/dense-mel configs (e.g. Whisper's fft=400,
2.5 bins/band) are exactly where split3's dropped 2⁻¹⁶-scale terms
surface as dB-domain tails (measured: 7.9e-4 worst-case vs split6's
~1e-5; a single extra lo·lo product was measured to NOT close this —
the lo-quantization noise is the same order as the dropped product).

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

Backward precision mirrors the forward tier (``split6`` gradients hold
≤1e-4 parity even at small ffts; ``split3`` at ≥8-bins/mel configs;
``precision="fast"`` runs the backward single-pass — bf16-grade
gradients at ~3× less backward MXU work, the SGD-throughput mode).
Off-TPU and for unsupported configs the op transparently runs the jnp
chain and its AD-derived VJP.

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

__all__ = ["fused_melspectrogram", "fused_mel_supported",
           "resolve_precision"]

# precision tier -> number of bf16 parts per operand (ns GEMM issues,
# ns·(ns+1)/2 products, ~2^(-8·ns) operand error)
_PREC_NS = {"fast": 1, "split3": 2, "split6": 3}


def resolve_precision(precision: str, fft_length: int,
                      num_mels: int) -> str:
    """Resolve ``"auto"`` to a concrete tier for this config.

    ``split3`` holds ≤1e-4 worst-case dB parity only when mel bands
    average ≥~8 linear bins (the dropped 2⁻¹⁶-scale products average
    out); below that (small ffts / dense mel, e.g. Whisper's fft=400 at
    2.5 bins/band) ``split6`` is required for the parity budget
    (docs/PERFORMANCE.md, round-3 tier experiment)."""
    if precision == "auto":
        return ("split6" if (fft_length // 2 + 1) < 8 * num_mels
                else "split3")
    if precision not in _PREC_NS:
        raise ValueError(
            f"unknown precision {precision!r}: expected 'auto', "
            f"'split6', 'split3', or 'fast'")
    return precision

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


def _fwd_vmem_est(N, HOP, TB, FBT, m_pad, ns, save_spec, frames_in):
    """Rough VMEM bytes for one forward program (blocks double-buffered
    by the Pallas pipeline + scratch + major value temporaries)."""
    CN = ns * N
    b = CN * 2 * FBT * 2 * 2                     # basis blocks ×2
    b += ns * FBT * m_pad * 2 * 2                # fb stack blocks ×2
    b += TB * m_pad * 4 * 2                      # out blocks ×2
    if save_spec:
        b += TB * 2 * FBT * 4 * 2                # reim blocks ×2
    if frames_in:
        b += TB * CN * 2 * 2                     # fcat blocks ×2
    else:
        b += TB * CN * 2                         # fcat scratch
        b += _round_up((TB - 1) * HOP + N, 1024) * 4   # xbuf
    # temps: reim f32, p f32, pcat bf16
    b += TB * 2 * FBT * 4 + TB * FBT * 4 + TB * ns * FBT * 2
    return b


def _bwd_vmem_est(N, TB, FBT, m_pad, ns=2, ft_count=0, n_nt=1):
    mc = ns * m_pad
    bt = 2 * ns * FBT
    nt = N // n_nt
    b = TB * mc * 2 * 2                          # dmel [hi|..] blocks
    b += TB * 2 * FBT * 4 * 2                    # reim blocks
    b += mc * FBT * 2 * 2                        # FBᵀ blocks
    b += bt * nt * 2 * 3                         # Bᵀ blocks (deep-buffered)
    b += TB * nt * 4 * 2                         # out blocks
    b += TB * FBT * 4 + TB * 2 * FBT * 4        # temps: dp, dreim
    if ns > 1:
        b += TB * 2 * ns * FBT * 2               # dcat temp
    # fused-dFB extras: the (ft, FBT, M) accumulator block (constant
    # index map — single-buffered for the whole grid) + p/part temps
    b += ft_count * FBT * m_pad * 4
    b += TB * FBT * (4 + 2 * ns)
    return b


def _bwd_tiles(N_pad, m_pad, ns, ft_count):
    """Pick (TB, n_nt) for the backward kernel: the largest frame block
    that fits the VMEM budget, preferring N-axis tiling over shrinking
    TB (same program count, smaller Bᵀ/out blocks, half the Bᵀ refetch
    traffic — measured rationale in docs/PERFORMANCE.md)."""
    best = (128, 1)
    for n_nt in (1, 2, 4):
        if N_pad % (n_nt * 128):
            continue
        TB = _TB_BWD
        while TB > 128 and _bwd_vmem_est(N_pad, TB, _FREQ_TILE, m_pad,
                                         ns, ft_count,
                                         n_nt) > _VMEM_BUDGET_BWD:
            TB -= 128
        if TB > best[0]:
            best = (TB, n_nt)
        if TB == _TB_BWD:
            break                                # prefer fewer tiles
    return best


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

def _np_split_k(a, k):
    """f32 → k bf16 parts ``[p₀ (hi), …, p_{k−1} (lo)]`` with
    ``sum(pᵢ) ≈ a`` to ~2^(-8k) relative."""
    r = np.asarray(a, np.float32)
    parts = []
    for _ in range(k - 1):
        p = r.astype(ml_dtypes.bfloat16)
        parts.append(p)
        r = r - p.astype(np.float32)
    parts.append(r.astype(ml_dtypes.bfloat16))
    return parts


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
                     ns: int) -> np.ndarray:
    """bf16 basis for the forward kernel: ``(ns·fft, FT·2FBT)`` rows
    ``[q_{ns−1}; …; q₀]`` (lo slabs first) so GEMM ``j`` of the nested
    scheme is ``fcat[:, :(ns−j)·fft] · this[j·fft:]``.  ns=1: just hi."""
    basis, *_ = _basis_f32(fft_length, win_key, win_length, fbt)
    parts = _np_split_k(basis, ns)
    return np.concatenate(parts[::-1], axis=0)


@functools.lru_cache(maxsize=16)
def _bwd_basis_stack(fft_length: int, win_key, win_length, fbt: int,
                     ns: int) -> np.ndarray:
    """bf16 transposed basis for the dframes kernel: ``(FT·2ns·FBT,
    fft)`` with tile-t rows ``[Bᵀ_lo_t; …; Bᵀ_hi_t]`` (2FBT each)."""
    basis, n_freqs, ft_count, f_pad = _basis_f32(fft_length, win_key,
                                                 win_length, fbt)
    parts = _np_split_k(basis, ns)
    rows = []
    for t in range(ft_count):
        s = slice(t * 2 * fbt, (t + 1) * 2 * fbt)
        rows.append(np.concatenate(
            [np.ascontiguousarray(p[:, s].T) for p in parts[::-1]],
            axis=0))
    return np.concatenate(rows, axis=0)


def _bf16_round_f32(a32):
    """Round f32 to the nearest bf16 value, IN f32 (bit-exact with the
    hardware round-half-to-even convert) — XLA cannot simplify it away."""
    bits = jax.lax.bitcast_convert_type(a32, jnp.uint32)
    rounded = bits + np.uint32(0x7FFF) + ((bits >> 16) & np.uint32(1))
    return jax.lax.bitcast_convert_type(
        rounded & np.uint32(0xFFFF0000), jnp.float32)


def _split_xla_k(a, k):
    """f32 → list of k bf16 parts for TRACED (XLA-side) operands.

    The naive ``hi = a.astype(bf16); lo = (a - hi.astype(f32)).astype(bf16)``
    is silently destroyed under jit on TPU: with
    ``--xla_allow_excess_precision`` XLA simplifies
    ``convert_f32(convert_bf16(a)) → a`` and the lo part folds to exactly
    zero, degrading every split-precision GEMM to a single bf16 pass
    (verified on v5e: jit'd ``sum(|lo|) == 0``).  Rounding in integer
    bits (``_bf16_round_f32``) makes each level's hi exactly
    representable in bf16, so any such simplification is
    value-preserving.  In-kernel splits are unaffected (Mosaic does not
    apply this rewrite).
    """
    r = a.astype(jnp.float32)
    parts = []
    for _ in range(k - 1):
        hi32 = _bf16_round_f32(r)
        parts.append(hi32.astype(jnp.bfloat16))   # exact conversion
        r = r - hi32
    parts.append(r.astype(jnp.bfloat16))
    return parts


def _split_hi_lo_xla(a):
    """f32 → (hi, lo) bf16 pair (the k=2 case of :func:`_split_xla_k`)."""
    hi, lo = _split_xla_k(a, 2)
    return hi, lo


# traced filterbank staging (the filterbank may be a trainable param) ------

def _fb_padded(filterbank, n_freqs: int, f_pad: int, m_pad: int):
    fb = jnp.asarray(filterbank, jnp.float32)
    fbp = jnp.zeros((f_pad, m_pad), jnp.float32)
    return fbp.at[:n_freqs, :fb.shape[1]].set(fb)


def _fb_fwd_stack(fbp, ft: int, fbt: int, m_pad: int, ns: int):
    """(FT·ns·FBT, M) with tile-t rows [lo_t; …; hi_t]; ns=1: just hi."""
    if ns == 1:
        return fbp.astype(jnp.bfloat16)
    parts = _split_xla_k(fbp, ns)
    p3 = [p.reshape(ft, fbt, m_pad) for p in parts[::-1]]
    return jnp.concatenate(p3, axis=1).reshape(ft * ns * fbt, m_pad)


def _fb_bwd_stack(fbp, ft: int, fbt: int, m_pad: int, ns: int):
    """(FT·ns·M, FBT) with tile-t rows [FBᵀ_lo_t; …; FBᵀ_hi_t] (M each);
    ns=1: (FT·M, FBT) of hi only."""
    parts = _split_xla_k(fbp, ns)
    Ts = [p.reshape(ft, fbt, m_pad).transpose(0, 2, 1)   # (ft, M, FBT)
          for p in parts[::-1]]
    if ns == 1:
        return Ts[0].reshape(ft * m_pad, fbt)
    return jnp.concatenate(Ts, axis=1).reshape(ft * ns * m_pad, fbt)


def _split_cat_cols(a, ns: int):
    """f32 (R, C) → bf16 (R, ns·C) ``[p₀ | … | p_{ns−1}]`` (XLA-side)."""
    return jnp.concatenate(_split_xla_k(a, ns), axis=1)


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


def _split_val_k(v, k):
    """In-kernel f32 value → k bf16 parts (naive split; Mosaic does not
    apply the excess-precision rewrite that breaks this XLA-side)."""
    parts = []
    r = v
    for _ in range(k - 1):
        h = r.astype(jnp.bfloat16)
        parts.append(h)
        r = r - h.astype(jnp.float32)
    parts.append(r.astype(jnp.bfloat16))
    return parts


@functools.lru_cache(maxsize=32)
def _build_fwd_call(N: int, HOP: int, m_pad: int, n_blocks: int, bc: int,
                    ft_count: int, to_db: bool, db_ref: float, amin: float,
                    ns: int, tb: int, fbt: int, frames_in: bool,
                    save_spec: bool, interpret: bool):
    TB, FBT = tb, fbt
    G = bc * n_blocks
    if not frames_in:
        BLK = _round_up((TB - 1) * HOP + N, 1024)
        stride = _stream_stride(N, HOP, n_blocks, TB)
        assert (TB * HOP) % 1024 == 0, (TB, HOP)
    CN = ns * N                          # frame-cat width
    db_off = _LN10_INV_10 * math.log(max(amin, db_ref)) if to_db else 0.0

    def dft_mel(fcat, bstack_ref, fbstack_ref):
        """(TB, CN) bf16 frames → (reim (TB,2FBT) f32, mel partial).

        Nested-concat split GEMMs: issue ``j`` multiplies the first
        ``ns−j`` frame parts against the last ``ns−j`` basis slabs,
        yielding the products with part-index sum ``ns−1−j``; over all
        issues this is every product with weight ≥ 2^(−8·ns)."""
        reim = jnp.dot(fcat, bstack_ref[:],
                       preferred_element_type=jnp.float32)
        for j in range(1, ns):
            reim = reim + jnp.dot(fcat[:, :(ns - j) * N],
                                  bstack_ref[j * N:, :],
                                  preferred_element_type=jnp.float32)
        p = (reim[:, :FBT] * reim[:, :FBT]
             + reim[:, FBT:] * reim[:, FBT:])
        if ns == 1:
            part = jnp.dot(p.astype(jnp.bfloat16), fbstack_ref[:],
                           preferred_element_type=jnp.float32)
        else:
            pcat = jnp.concatenate(_split_val_k(p, ns), axis=1)
            part = jnp.dot(pcat, fbstack_ref[:],
                           preferred_element_type=jnp.float32)
            for j in range(1, ns):
                part = part + jnp.dot(pcat[:, :(ns - j) * FBT],
                                      fbstack_ref[j * FBT:, :],
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
            pl.BlockSpec((ns * FBT, m_pad),
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
                    for si, prt in enumerate(_split_val_k(row, ns)):
                        fcat_s[j, si * N:(si + 1) * N] = prt

            reim, part = dft_mel(fcat_s[:], bstack_ref, fbstack_ref)
            epilogue(ft, o_ref, part, reim, reim_ref)

        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),           # waveform (HBM)
            pl.BlockSpec((CN, 2 * FBT), lambda b, i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns * FBT, m_pad),
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
                    tb: int, fbt: int, ns: int, n_nt: int,
                    interpret: bool):
    """Merged backward kernel: grid (row_blocks, n_tiles, freq_tiles),
    freq innermost so the (TB, NT) dframes output block accumulates the
    per-tile dF partials.  ``dmel`` arrives pre-split (XLA-side): blocks
    (TB, ns·M) bf16 ``[hi | …]`` — keeps the kernel pure-GEMM and its
    VMEM small.

    ``n_nt`` tiles the dF output's frame-sample axis (``NT = N/n_nt``):
    the (TB, N) f32 output block and the Bᵀ slab are the two VMEM
    dominants, and halving them buys back TB=512 at config 2 (round-2
    shipped TB=256, 25.9 ms) at the SAME total program count and HALF
    the Bᵀ HBM refetch traffic.  The dp GEMM recomputed per N-tile is
    ~0.1% of the dF GEMM's MACs.

    The filterbank gradient is fused in (it needs exactly the operands
    already resident: dmel and the reim tile): a second output
    ``(ft, FBT, M)`` with a CONSTANT index map stays in VMEM across the
    whole grid, each nt==0 step accumulating ``p_tᵀ·dmel`` into its
    tile-t slab — one kernel instead of two, saving a full second pass
    over the mcat/reim residuals (~0.5 GB at config 2) plus a grid of
    program overheads."""
    TB, FBT = tb, fbt
    n_rb = g_rows // TB
    MC = ns * m_pad
    NT = N // n_nt

    def kernel(mcat_ref, reim_ref, fbT_ref, bT_ref, o_ref, o2_ref):
        gi = pl.program_id(0)
        nt = pl.program_id(1)
        t = pl.program_id(2)
        mcat = mcat_ref[:]
        dp = jnp.dot(mcat, fbT_ref[:], preferred_element_type=jnp.float32)
        for j in range(1, ns):
            dp = dp + jnp.dot(mcat[:, :(ns - j) * m_pad],
                              fbT_ref[j * m_pad:, :],
                              preferred_element_type=jnp.float32)
        reim = reim_ref[:]                       # (TB, 2FBT) f32
        dreim = jnp.concatenate(
            [2.0 * reim[:, :FBT] * dp, 2.0 * reim[:, FBT:] * dp], axis=1)
        dparts = _split_val_k(dreim, ns)         # (TB, 2FBT) bf16 each
        dcat = (jnp.concatenate(dparts, axis=1) if ns > 1 else dparts[0])
        part = jnp.dot(dcat, bT_ref[:],
                       preferred_element_type=jnp.float32)
        for j in range(1, ns):
            part = part + jnp.dot(dcat[:, :(ns - j) * 2 * FBT],
                                  bT_ref[j * 2 * FBT:, :],
                                  preferred_element_type=jnp.float32)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = part

        @pl.when(t > 0)
        def _acc():
            o_ref[:] = o_ref[:] + part

        # fused dFB: p_tᵀ·dmel accumulated into the tile-t slab (every
        # part-pair with index sum ≤ ns−1, ns(ns+1)/2 small GEMMs — the
        # TB-axis contraction does not admit the concat trick); nt-
        # independent, so computed on the nt==0 pass only
        @pl.when(nt == 0)
        def _dfb():
            p = (reim[:, :FBT] * reim[:, :FBT]
                 + reim[:, FBT:] * reim[:, FBT:])
            pparts = _split_val_k(p, ns)

            def dotT(a, b):  # contract the TB axis: (TB,FBT)ᵀ·(TB,M)
                return jax.lax.dot_general(
                    a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            part2 = dotT(pparts[0], mcat[:, :m_pad])
            for a in range(ns):
                for b in range(ns - a):
                    if a == 0 and b == 0:
                        continue
                    part2 = part2 + dotT(
                        pparts[a], mcat[:, b * m_pad:(b + 1) * m_pad])

            @pl.when(gi == 0)
            def _init2():
                o2_ref[t] = part2

            @pl.when(gi > 0)
            def _acc2():
                o2_ref[t] = o2_ref[t] + part2

    return pl.pallas_call(
        kernel,
        grid=(n_rb, n_nt, ft_count),
        in_specs=[
            pl.BlockSpec((TB, MC), lambda gi, nt, t: (gi, 0),
                         memory_space=pltpu.VMEM),        # dmel [hi|..]
            pl.BlockSpec((TB, 2 * FBT), lambda gi, nt, t: (gi, t),
                         memory_space=pltpu.VMEM),        # reim residual
            pl.BlockSpec((MC, FBT), lambda gi, nt, t: (t, 0),
                         memory_space=pltpu.VMEM),        # FBᵀ stack
            pl.BlockSpec((2 * ns * FBT, NT),
                         lambda gi, nt, t: (t, nt),
                         memory_space=pltpu.VMEM),        # Bᵀ slab tile
        ],
        out_specs=[
            pl.BlockSpec((TB, NT), lambda gi, nt, t: (gi, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft_count, FBT, m_pad),
                         lambda gi, nt, t: (0, 0, 0),
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
    ns = _PREC_NS[precision]        # resolved upstream; KeyError = bug
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
    TB = _TB_FAST if ns == 1 else _TB
    while TB > 128 and _fwd_vmem_est(N_pad, HOP, TB, _FREQ_TILE, m_pad,
                                     ns, save_spec,
                                     not aligned) > _VMEM_BUDGET_FWD:
        TB -= 128
    n_blocks = _cdiv(n_frames, TB)
    x2 = waveform.reshape((-1, T)).astype(jnp.float32)
    bc = x2.shape[0]

    fbp = _fb_padded(filterbank, n_freqs, f_pad, m_pad)
    fbstack = _fb_fwd_stack(fbp, ft_count, _FREQ_TILE, m_pad, ns)

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
                                              _FREQ_TILE, ns))
        call = _build_fwd_call(N, HOP, m_pad, n_blocks, bc, ft_count,
                               to_db, float(db_ref), float(amin), ns,
                               TB, _FREQ_TILE, False, save_spec,
                               _interpret())
        res = call(x, bstack, fbstack)
    else:
        frames = _frame_signal(x2, N, HOP)           # (bc, n_frames, N)
        rows = n_blocks * TB
        frames = jnp.pad(frames, ((0, 0), (0, rows - n_frames),
                                  (0, N_pad - N)))
        frames = frames.reshape(bc * rows, N_pad)
        fcat = (_split_cat_cols(frames, ns) if ns > 1
                else frames.astype(jnp.bfloat16))
        bstack = jnp.asarray(_fwd_basis_stack(N, win_key, win_length,
                                              _FREQ_TILE, ns))
        call = _build_fwd_call(N_pad, HOP, m_pad, n_blocks, bc, ft_count,
                               to_db, float(db_ref), float(amin), ns,
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

    ``precision`` mirrors the forward: "split6" (f32-grade gradients,
    required for ≤1e-4 parity at small ffts), "split3" (≤1e-4 at ≥8
    bins/mel configs) or "fast" (single bf16 pass per GEMM, ~2e-3 —
    fine for SGD-style training at ~3× less backward MXU work).
    """
    ns = _PREC_NS[precision]
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
    TB, n_nt = _bwd_tiles(N_pad, m_pad, ns, ft_count)
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
    mcat = _split_cat_cols(dmel, ns)                 # (rows, ns·M) bf16
    reim2 = reim_raw.reshape(bc * rows, ft_count * 2 * _FREQ_TILE)
    if row_pad:
        mcat = jnp.pad(mcat, ((0, row_pad), (0, 0)))
        reim2 = jnp.pad(reim2, ((0, row_pad), (0, 0)))

    fbp = _fb_padded(filterbank, n_freqs, f_pad, m_pad)
    fbT = _fb_bwd_stack(fbp, ft_count, _FREQ_TILE, m_pad, ns)
    bT = jnp.asarray(_bwd_basis_stack(N, win_key, win_length, _FREQ_TILE,
                                      ns))

    bwd_call = _build_bwd_call(N_pad, m_pad, g_rows, ft_count, TB,
                               _FREQ_TILE, ns, n_nt, _interpret())
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
                         precision: str = "auto",
                         win_length=None,
                         center: bool = False,
                         pad_mode: str = "reflect") -> jnp.ndarray:
    """Mel (or log-mel) spectrogram of ``waveform (..., T)`` as one
    fused TPU kernel.

    ``filterbank`` is ``(fft_length//2+1, num_mels)`` (e.g. from
    :func:`~torchaudio_contrib_tpu.ops.create_mel_filter`).  Returns
    ``(..., num_mels, n_frames)``.  ``precision``: ``"auto"`` (default)
    resolves per config via :func:`resolve_precision` — ``"split3"``
    (~4e-6 typical) where mel bands average ≥8 linear bins, ``"split6"``
    (f32-chain parity, 2× the GEMM work) below that, where split3's
    dropped 2⁻¹⁶-scale products surface as dB tails; ``"fast"`` is the
    single-bf16-pass throughput mode (~2e-3 relative).  An explicit
    tier is always honored as requested.
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
    precision = resolve_precision(precision, fft_length,
                                  filterbank.shape[-1])
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
