"""ISTFT: round-trip reconstruction, torch.istft parity, NOLA guard."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


@pytest.mark.parametrize("fft_length,hop,win", [
    (512, 128, None),      # COLA hann, 75% overlap
    (512, 256, None),      # 50% overlap
    (1024, 256, 1024),
    (256, 64, 200),        # win < n_fft
])
def test_roundtrip_stereo_batch(rng, fft_length, hop, win):
    """BASELINE config 4: STFT→ISTFT, COLA windows, multi-channel stereo."""
    x = rng.standard_normal((3, 2, 8192)).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), fft_length, hop, win_length=win)
    y = ops.istft(spec, hop, win_length=win, length=x.shape[-1],
                  fft_length=fft_length)
    assert y.shape == x.shape
    err = np.max(np.abs(np.asarray(y) - x))
    assert err <= 1e-4, f"round-trip max abs err {err}"


def test_parity_torch_istft(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    fft_length, hop = 512, 128
    spec = ops.stft(jnp.asarray(x), fft_length, hop)
    y = ops.istft(spec, hop, length=x.shape[-1])

    xt = torch.as_tensor(x, dtype=torch.float64)
    w = torch.hann_window(fft_length, dtype=torch.float64)
    st = torch.stft(xt, fft_length, hop, window=w, center=True,
                    pad_mode="reflect", return_complex=True)
    yt = torch.istft(st, fft_length, hop, window=w, center=True,
                     length=x.shape[-1]).numpy()

    err = np.max(np.abs(np.asarray(y) - yt))
    assert err <= 1e-4, f"istft parity max abs err {err}"


def test_normalized_roundtrip(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 512, 128, normalized=True)
    y = ops.istft(spec, 128, normalized=True, length=4096)
    assert np.max(np.abs(np.asarray(y) - x)) <= 1e-4


def test_nola_violation_raises(rng):
    x = rng.standard_normal((4096,)).astype(np.float32)
    # hann with hop == n_fft: windows don't overlap; zeros between frames
    spec = ops.stft(jnp.asarray(x), 512, 512)
    with pytest.raises(ValueError, match="NOLA"):
        ops.istft(spec, 512)


def test_istft_gradient_flows(rng):
    x = jnp.asarray(rng.standard_normal((2048,)).astype(np.float32))

    def f(xi):
        return jnp.sum(ops.istft(ops.stft(xi, 256, 64), 64,
                                 length=2048) ** 2)

    g = jax.grad(f)(x)
    # round-trip is identity on the interior, so grad ≈ 2x there
    interior = slice(256, -256)
    np.testing.assert_allclose(np.asarray(g)[interior],
                               2 * np.asarray(x)[interior], atol=1e-3)


def test_length_beyond_reconstructable_zero_pads(rng):
    """torch.istft parity: length beyond the reconstructable range
    zero-pads the output rather than raising."""
    x = rng.standard_normal((2048,)).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 256, 64)
    out = np.asarray(ops.istft(spec, 64, length=3000))
    assert out.shape == (3000,)
    np.testing.assert_allclose(out[:2048], x, atol=1e-4)
    ref = torch.istft(torch.stft(torch.from_numpy(x), 256, 64,
                                 window=torch.hann_window(256),
                                 return_complex=True),
                      256, 64, window=torch.hann_window(256),
                      length=3000).numpy()
    # tail frames divide by a decaying window envelope — float noise is
    # amplified there, so the whole-range bound is looser
    np.testing.assert_allclose(out, ref, atol=5e-4)
    np.testing.assert_array_equal(out[2500:], 0.0)


def test_istft_matmul_method_matches_fft(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 512, 128)
    a = ops.istft(spec, 128, length=4096)
    b = ops.istft(spec, 128, length=4096, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=0)
    # odd fft length exercises the Nyquist-weight branch
    spec2 = ops.stft(jnp.asarray(x[:, :4000]), 250, 125, center=True)
    c = ops.istft(spec2, 125, length=4000, fft_length=250)
    d = ops.istft(spec2, 125, length=4000, fft_length=250,
                  method="matmul")
    np.testing.assert_allclose(np.asarray(c), np.asarray(d),
                               atol=2e-5, rtol=0)
