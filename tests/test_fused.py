"""Fused mel op: fallback-path equivalence, gradients, layer API.

On the CPU test backend the op runs its jnp fallback — these tests pin
the *semantics* (center=False chain equivalence, custom_vjp gradients,
layer contract).  TPU-kernel numerics are exercised by bench.py on real
hardware (measured: ≤4e-6 relative vs the XLA chain at split3).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu import ops


def test_matches_chain(rng):
    x = jnp.asarray(rng.standard_normal((2, 1, 16384)).astype(np.float32))
    fb = ops.create_mel_filter(64, 16000, 0.0, None, 257)
    out = ops.fused_melspectrogram(x, fb, 512, 128)
    spec = ops.stft(x, 512, 128, center=False)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_no_db_and_shapes(rng):
    x = jnp.asarray(rng.standard_normal((3, 2, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 129)
    out = ops.fused_melspectrogram(x, fb, 256, 128, to_db=False)
    n_frames = 1 + (8192 - 256) // 128
    assert out.shape == (3, 2, 32, n_frames)
    assert float(jnp.min(out)) >= 0.0


def test_gradient_matches_chain(rng):
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)

    g_fused = jax.grad(
        lambda v: jnp.sum(ops.fused_melspectrogram(v, fb, 512, 256)))(x)

    def chain(v):
        spec = ops.stft(v, 512, 256, center=False)
        p = ops.complex_norm(spec, 2.0)
        return jnp.sum(ops.amplitude_to_db(ops.apply_filterbank(p, fb),
                                           power=2.0))

    g_ref = jax.grad(chain)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_filterbank_gradient(rng):
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    fb = ops.create_mel_filter(16, 16000, 0.0, None, 129)
    g = jax.grad(lambda f: jnp.sum(
        ops.fused_melspectrogram(x, f, 256, 128)))(fb)
    assert g.shape == fb.shape and float(jnp.max(jnp.abs(g))) > 0


def test_supported_matrix():
    assert ops.fused_mel_supported(2048, 512)
    assert ops.fused_mel_supported(1024, 256)
    assert ops.fused_mel_supported(512, 160)      # ASR 10 ms hop
    assert ops.fused_mel_supported(2048, 500)     # any hop
    assert ops.fused_mel_supported(2048, 2048)    # no overlap
    assert ops.fused_mel_supported(400, 160)      # Whisper fft (pads->512)
    assert ops.fused_mel_supported(250, 125)      # odd-ball fft
    assert not ops.fused_mel_supported(512, 0)    # degenerate hop
    assert not ops.fused_mel_supported(1, 1)      # degenerate fft


def test_layer(rng):
    layer = tac.FusedMelspectrogram(num_mels=32, sample_rate=16000,
                                    fft_length=512, hop_length=128)
    x = jnp.asarray(rng.standard_normal((2, 1, 8192)).astype(np.float32))
    out = layer(x)
    assert out.shape[:3] == (2, 1, 32)
    assert layer.state_dict() == {}
    # trainable variant exposes the filterbank
    t = tac.FusedMelspectrogram(num_mels=32, sample_rate=16000,
                                fft_length=512, hop_length=128,
                                trainable=True)
    params = t.init_params()
    assert params.shape == (257, 32)
    g = jax.grad(lambda p: jnp.sum(t(x, params=p)))(params)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_bad_filterbank_rows(rng, monkeypatch):
    """Wrong filterbank row count raises on the kernel path — exercised
    on CPU through interpret mode (round-2 verdict: the tpu-only guard
    made this a no-op on the CPU suite)."""
    monkeypatch.setenv("TAC_FUSED_INTERPRET", "1")
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    fb_bad = jnp.zeros((100, 16), jnp.float32)
    with pytest.raises(ValueError, match="rows"):
        ops.fused_melspectrogram(x, fb_bad, 256, 128)


def test_resolve_precision():
    """'auto' picks split3 at ≥8 linear bins per mel band, split6 below
    (where split3's dropped 2^-16-scale products surface as dB tails);
    explicit tiers pass through; junk raises."""
    from torchaudio_contrib_tpu.ops.fused import resolve_precision
    assert resolve_precision("auto", 2048, 128) == "split3"  # 8 bins/mel
    assert resolve_precision("auto", 400, 80) == "split6"    # Whisper
    assert resolve_precision("auto", 1024, 128) == "split6"  # 4 bins/mel
    assert resolve_precision("auto", 2048, 64) == "split3"
    for p in ("fast", "split3", "split6"):
        assert resolve_precision(p, 400, 80) == p
    with pytest.raises(ValueError, match="precision"):
        resolve_precision("split4", 2048, 128)


def test_win_length_matches_chain(rng):
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)
    out = ops.fused_melspectrogram(x, fb, 512, 128, win_length=400)
    spec = ops.stft(x, 512, 128, win_length=400, center=False)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Interpret-mode tests: run the REAL Pallas kernel paths (forward and the
# backward dframes/dFB kernels) through the Pallas interpreter on CPU.
# ---------------------------------------------------------------------------

def _chain(x, fft, hop, fb, to_db=True, win_length=None):
    spec = ops.stft(x, fft, hop, center=False, win_length=win_length)
    p = ops.complex_norm(spec, 2.0)
    mel = ops.apply_filterbank(p, fb)
    return ops.amplitude_to_db(mel, power=2.0) if to_db else mel


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setenv("TAC_FUSED_INTERPRET", "1")


@pytest.mark.parametrize("fft,hop", [(512, 128), (512, 160), (256, 100),
                                     (400, 160), (250, 125), (512, 512)])
def test_kernel_fwd_interpret(interpret_kernels, rng, fft, hop):
    """Forward kernel (in-kernel DMA framing for aligned hops, XLA-side
    framing otherwise) vs the XLA chain, via the Pallas interpreter."""
    x = jnp.asarray(rng.standard_normal((2, 9000)).astype(np.float32))
    fb = ops.create_mel_filter(64, 16000, 0.0, None, fft // 2 + 1)
    out = ops.fused_melspectrogram(x, fb, fft, hop)
    ref = _chain(x, fft, hop, fb)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err <= 5e-5, err


@pytest.mark.parametrize("fft,hop", [(512, 128), (512, 160), (400, 160)])
def test_kernel_bwd_interpret(interpret_kernels, rng, fft, hop):
    """Backward kernels (dframes + dFB) vs the XLA chain's VJP, with a
    fixed primal-independent cotangent."""
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(64, 16000, 0.0, None, fft // 2 + 1)
    n_frames = 1 + (8192 - fft) // hop
    w = jnp.asarray(rng.standard_normal((1, 64, n_frames))
                    .astype(np.float32))

    gx, gf = jax.grad(lambda v, f: jnp.sum(
        ops.fused_melspectrogram(v, f, fft, hop) * w), argnums=(0, 1))(x, fb)
    rx, rf = jax.grad(lambda v, f: jnp.sum(
        _chain(v, fft, hop, f) * w), argnums=(0, 1))(x, fb)
    ex = float(jnp.max(jnp.abs(gx - rx)) / jnp.max(jnp.abs(rx)))
    ef = float(jnp.max(jnp.abs(gf - rf)) / jnp.max(jnp.abs(rf)))
    assert ex <= 1e-4, ex
    assert ef <= 1e-4, ef


@pytest.mark.parametrize("fft,hop", [(400, 160), (512, 128)])
def test_kernel_fwd_split6_interpret(interpret_kernels, rng, fft, hop):
    """precision='split6' (3-way operand split, 6 products) holds
    f32-chain-grade parity through the REAL kernel path — including the
    small-fft configs where split3 has measured dB tails."""
    x = jnp.asarray(rng.standard_normal((2, 9000)).astype(np.float32)
                    * 10.0)
    fb = ops.create_mel_filter(80, 16000, 0.0, None, fft // 2 + 1)
    out = ops.fused_melspectrogram(x, fb, fft, hop, precision="split6")
    ref = _chain(x, fft, hop, fb)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err <= 1e-5, err


def test_kernel_bwd_split6_interpret(interpret_kernels, rng):
    """split6 backward kernels (Whisper config) vs the XLA chain's VJP —
    the tolerance split3 misses at this fft (measured ~1.6e-3 dx)."""
    fft, hop = 400, 160
    x = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    fb = ops.create_mel_filter(80, 16000, 0.0, None, fft // 2 + 1)
    n_frames = 1 + (8000 - fft) // hop
    w = jnp.asarray(rng.standard_normal((1, 80, n_frames))
                    .astype(np.float32))
    gx, gf = jax.grad(lambda v, f: jnp.sum(
        ops.fused_melspectrogram(v, f, fft, hop, precision="split6") * w),
        argnums=(0, 1))(x, fb)
    rx, rf = jax.grad(lambda v, f: jnp.sum(
        _chain(v, fft, hop, f) * w), argnums=(0, 1))(x, fb)
    ex = float(jnp.max(jnp.abs(gx - rx)) / jnp.max(jnp.abs(rx)))
    ef = float(jnp.max(jnp.abs(gf - rf)) / jnp.max(jnp.abs(rf)))
    assert ex <= 2e-5, ex
    assert ef <= 2e-5, ef


def test_kernel_bwd_ntiled_interpret(interpret_kernels, rng, monkeypatch):
    """The backward kernel's N-axis output tiling (n_nt > 1 — the config
    that buys TB=512 back at config 2) produces identical gradients.
    Forced here by pinching the VMEM budget so fft=512 tiles too."""
    from torchaudio_contrib_tpu.ops import fused

    monkeypatch.setattr(fused, "_VMEM_BUDGET_BWD", 6_000_000)
    assert fused._bwd_tiles(512, 128, 2, 2)[1] > 1, \
        "budget pinch failed to force N-tiling"
    fft, hop = 512, 128
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(64, 16000, 0.0, None, fft // 2 + 1)
    n_frames = 1 + (8192 - fft) // hop
    w = jnp.asarray(rng.standard_normal((1, 64, n_frames))
                    .astype(np.float32))
    gx, gf = jax.grad(lambda v, f: jnp.sum(
        ops.fused_melspectrogram(v, f, fft, hop, precision="split3") * w),
        argnums=(0, 1))(x, fb)
    rx, rf = jax.grad(lambda v, f: jnp.sum(
        _chain(v, fft, hop, f) * w), argnums=(0, 1))(x, fb)
    ex = float(jnp.max(jnp.abs(gx - rx)) / jnp.max(jnp.abs(rx)))
    ef = float(jnp.max(jnp.abs(gf - rf)) / jnp.max(jnp.abs(rf)))
    assert ex <= 1e-4, ex
    assert ef <= 1e-4, ef


def test_kernel_fwd_interpret_no_db_fast_win(interpret_kernels, rng):
    """Kernel-path coverage for to_db=False, precision='fast', and
    win_length < fft_length."""
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)
    out = ops.fused_melspectrogram(x, fb, 512, 128, to_db=False,
                                   win_length=400)
    ref = _chain(x, 512, 128, fb, to_db=False, win_length=400)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err <= 5e-5, err
    out_fast = ops.fused_melspectrogram(x, fb, 512, 128, to_db=False,
                                        win_length=400, precision="fast")
    err_fast = float(jnp.max(jnp.abs(out_fast - ref))
                     / jnp.max(jnp.abs(ref)))
    assert err_fast <= 2e-2, err_fast


def test_kernel_interpret_mel_padding(interpret_kernels, rng):
    """num_mels not a multiple of 128 pads internally and slices back."""
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    fb = ops.create_mel_filter(40, 16000, 0.0, None, 129)
    out = ops.fused_melspectrogram(x, fb, 256, 128)
    ref = _chain(x, 256, 128, fb)
    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err <= 5e-5, err


def test_split_hi_lo_survives_jit():
    """Regression: XLA's allow-excess-precision rewrite folded the naive
    ``(a - bf16(a).astype(f32))`` lo term to exactly zero under jit on
    TPU, silently degrading every traced-side split3 GEMM to a single
    bf16 pass (grad parity 3e-5 -> 1.7e-3).  The bit-rounded split must
    produce identical, nonzero lo parts under jit and eager, and match
    the hardware's round-half-to-even bf16 conversion."""
    import ml_dtypes
    from torchaudio_contrib_tpu.ops.fused import _split_hi_lo_xla

    a = jnp.asarray(np.random.default_rng(3).standard_normal((64, 64)),
                    jnp.float32)
    hi_e, lo_e = _split_hi_lo_xla(a)
    hi_j, lo_j = jax.jit(_split_hi_lo_xla)(a)
    assert float(jnp.sum(jnp.abs(lo_j.astype(jnp.float32)))) > 0
    np.testing.assert_array_equal(np.asarray(hi_e), np.asarray(hi_j))
    np.testing.assert_array_equal(np.asarray(lo_e), np.asarray(lo_j))
    # hi matches the native bf16 rounding exactly
    np.testing.assert_array_equal(
        np.asarray(hi_e).view(np.uint16),
        np.asarray(a).astype(ml_dtypes.bfloat16).view(np.uint16))
    rec = hi_e.astype(jnp.float32) + lo_e.astype(jnp.float32)
    assert float(jnp.max(jnp.abs(rec - a))) <= \
        float(jnp.max(jnp.abs(a))) * 2 ** -16


def test_kernel_bwd_fast_interpret(interpret_kernels, rng):
    """precision='fast' runs the backward kernels single-pass (bf16-grade,
    the SGD-throughput mode).  Compared against the split3 backward ON THE
    SAME forward residuals — comparing against the exact chain instead
    mixes in dB-gate flips near the amin clamp caused by the fast
    FORWARD's primal error, which is heavy-tailed and not a property of
    the backward kernels."""
    from torchaudio_contrib_tpu.ops import fused

    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(64, 16000, 0.0, None, 257)
    n_frames = 1 + (8192 - 512) // 128
    w = jnp.asarray(rng.standard_normal((1, 64, n_frames))
                    .astype(np.float32))
    _, (y_raw, reim_raw) = fused._kernel_forward(
        x, fb, 512, 128, "hann", True, 1.0, 1e-7, "fast", None,
        save_spec=True)
    args = (w, x, fb, y_raw, reim_raw, 512, 128, "hann", True, 1.0, 1e-7)
    gx_f, gf_f = fused._kernel_backward(*args, "fast", None)
    gx_s, gf_s = fused._kernel_backward(*args, "split3", None)
    ex = float(jnp.max(jnp.abs(gx_f - gx_s)) / jnp.max(jnp.abs(gx_s)))
    ef = float(jnp.max(jnp.abs(gf_f - gf_s)) / jnp.max(jnp.abs(gf_s)))
    assert ex <= 2e-2, ex
    assert ef <= 2e-2, ef


def test_kernel_bwd_interpret_win_length_no_db(interpret_kernels, rng):
    """Backward kernels with win_length < fft (window folded into the
    basis and its transpose) and to_db=False (identity dmel gate)."""
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)
    n_frames = 1 + (8192 - 512) // 128
    w = jnp.asarray(rng.standard_normal((1, 32, n_frames))
                    .astype(np.float32))

    gx, gf = jax.grad(lambda v, f: jnp.sum(
        ops.fused_melspectrogram(v, f, 512, 128, to_db=False,
                                 win_length=400) * w),
        argnums=(0, 1))(x, fb)
    rx, rf = jax.grad(lambda v, f: jnp.sum(
        _chain(v, 512, 128, f, to_db=False, win_length=400) * w),
        argnums=(0, 1))(x, fb)
    ex = float(jnp.max(jnp.abs(gx - rx)) / jnp.max(jnp.abs(rx)))
    ef = float(jnp.max(jnp.abs(gf - rf)) / jnp.max(jnp.abs(rf)))
    assert ex <= 1e-4, ex
    assert ef <= 1e-4, ef


def test_kernel_bwd_interpret_multi_lead_dims(interpret_kernels, rng):
    """(B, C, T) leading dims flatten/restore correctly through the
    kernel forward AND the backward glue."""
    x = jnp.asarray(rng.standard_normal((2, 2, 4096)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 129)
    n_frames = 1 + (4096 - 256) // 128
    w = jnp.asarray(rng.standard_normal((2, 2, 32, n_frames))
                    .astype(np.float32))
    gx, gf = jax.grad(lambda v, f: jnp.sum(
        ops.fused_melspectrogram(v, f, 256, 128) * w), argnums=(0, 1))(x, fb)
    rx, rf = jax.grad(lambda v, f: jnp.sum(
        _chain(v, 256, 128, f) * w), argnums=(0, 1))(x, fb)
    assert gx.shape == x.shape
    # a layout/flattening bug would be O(1); 2e-4 is split3 precision at
    # this small fft (short contractions average less rounding out)
    ex = float(jnp.max(jnp.abs(gx - rx)) / jnp.max(jnp.abs(rx)))
    ef = float(jnp.max(jnp.abs(gf - rf)) / jnp.max(jnp.abs(rf)))
    assert ex <= 2e-4, ex
    assert ef <= 2e-4, ef


def test_kernel_bwd_silence_clamp_gate(interpret_kernels):
    """Regression: entries clamped to ``amin`` in the forward must get
    exactly zero gradient.  The backward reconstructs the dB gate from
    the saved output via exp∘log; f32 round-trip error made clamped
    entries reconstruct as slightly above ``amin``, leaking
    ``g/amin ~ 1e7``-scale gradients (silent audio exploded).  The gate
    now carries a 1e-4 relative tolerance."""
    xz = jnp.zeros((1, 4096), jnp.float32)
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)
    gx, gf = jax.grad(lambda v, f: jnp.sum(
        ops.fused_melspectrogram(v, f, 512, 128)), argnums=(0, 1))(xz, fb)
    assert float(jnp.max(jnp.abs(gx))) == 0.0
    assert float(jnp.max(jnp.abs(gf))) == 0.0


def test_center_true_matches_pipeline(rng):
    """fused(center=True) is frame-for-frame the Melspectrogram()+dB
    pipeline (torch-style reflect padding), including gradients."""
    x = jnp.asarray(rng.standard_normal((2, 1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)
    out = ops.fused_melspectrogram(x, fb, 512, 128, center=True)
    spec = ops.stft(x, 512, 128, center=True, pad_mode="reflect")
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    layer = tac.FusedMelspectrogram(num_mels=32, sample_rate=16000,
                                    fft_length=512, hop_length=128,
                                    center=True)
    np.testing.assert_allclose(np.asarray(layer(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    gx = jax.grad(lambda v: jnp.sum(
        ops.fused_melspectrogram(v, fb, 512, 128, center=True)))(x)
    rx = jax.grad(lambda v: jnp.sum(ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(
            ops.stft(v, 512, 128, center=True), 2.0), fb),
        power=2.0)))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)


def test_kernel_center_true_interpret(interpret_kernels, rng):
    """center=True through the REAL kernel path (padding composed with
    the in-kernel pipeline)."""
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)
    out = ops.fused_melspectrogram(x, fb, 512, 128, center=True)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(
            ops.stft(x, 512, 128, center=True), 2.0), fb), power=2.0)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err <= 5e-5, err


def test_mfcc_fused_center(rng):
    """use_fused MFCC now honors center=True (matches the chain)."""
    from torchaudio_contrib_tpu.ops import mfcc
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    a = mfcc(x, n_mfcc=13, sample_rate=16000, num_mels=32,
             fft_length=512, hop_length=128, center=True, use_fused=True)
    b = mfcc(x, n_mfcc=13, sample_rate=16000, num_mels=32,
             fft_length=512, hop_length=128, center=True, use_fused=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_melspectrogram_factory_fused(rng):
    """Melspectrogram(fused=True) is a drop-in for the 3-stage pipeline:
    same output (center=True semantics), trainable params thread through
    the single-stage Pipeline, invalid configs raise."""
    x = jnp.asarray(rng.standard_normal((2, 1, 8192)).astype(np.float32))
    ref = tac.Melspectrogram(num_mels=32, sample_rate=16000,
                             fft_length=512, hop_length=128)(x)
    fused_pipe = tac.Melspectrogram(num_mels=32, sample_rate=16000,
                                    fft_length=512, hop_length=128,
                                    fused=True)
    np.testing.assert_allclose(np.asarray(fused_pipe(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert len(fused_pipe) == 1

    t = tac.Melspectrogram(num_mels=32, sample_rate=16000,
                           fft_length=512, hop_length=128, fused=True,
                           trainable=True)
    params = t.init_params()
    assert params is not None
    g = jax.grad(lambda p: jnp.sum(t(x, params=p)))(params)
    assert float(jnp.max(jnp.abs(jnp.asarray(g[0])))) > 0

    with pytest.raises(ValueError):
        tac.Melspectrogram(power=1.0, fused=True)
    with pytest.raises(ValueError):
        tac.Melspectrogram(fused=True,
                           filterbank=tac.MelFilterbank(num_bins=1025))
    with pytest.raises(ValueError):
        tac.Melspectrogram(fused=True, normalized=True)
