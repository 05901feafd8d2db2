"""Edge cases: irregular hops (gather/scatter fallbacks), odd lengths,
win>fft errors, full-chain gradient parity vs torch autograd."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def test_stft_irregular_hop_parity(rng):
    """hop ∤ fft exercises the gather framing fallback."""
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    ours = ops.stft(jnp.asarray(x), 512, 160)
    w = torch.hann_window(512, dtype=torch.float64)
    ref = torch.stft(torch.as_tensor(x, dtype=torch.float64), 512, 160,
                     window=w, center=True, pad_mode="reflect",
                     return_complex=True).numpy()
    assert np.max(np.abs(np.asarray(ours) - ref)) <= 1e-4


def test_istft_irregular_hop_roundtrip(rng):
    """hop ∤ fft exercises the scatter OLA fallback."""
    x = rng.standard_normal((2, 4800)).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 480, 160)  # COLA hann, hop=win/3
    y = ops.istft(spec, 160, length=4800, fft_length=480)
    assert np.max(np.abs(np.asarray(y) - x)) <= 1e-4


def test_odd_length_input(rng):
    x = rng.standard_normal((3, 12345)).astype(np.float32)
    ours = ops.stft(jnp.asarray(x), 256, 64)
    w = torch.hann_window(256, dtype=torch.float64)
    ref = torch.stft(torch.as_tensor(x, dtype=torch.float64), 256, 64,
                     window=w, center=True, pad_mode="reflect",
                     return_complex=True).numpy()
    assert ours.shape == ref.shape
    assert np.max(np.abs(np.asarray(ours) - ref)) <= 1e-4


def test_win_longer_than_fft_raises(rng):
    with pytest.raises(ValueError, match="win_length"):
        ops.stft(jnp.zeros(4000), 256, 64, win_length=512)


def test_hop_equals_fft(rng):
    """Non-overlapping frames (rectangular window round-trips)."""
    x = rng.standard_normal((4096,)).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 256, 256, window="ones", center=False)
    y = ops.istft(spec, 256, window="ones", center=False)
    assert np.max(np.abs(np.asarray(y) - x[:y.shape[-1]])) <= 1e-4


def test_full_chain_gradient_parity_vs_torch(rng):
    """SURVEY §4(b): jax.grad vs torch.autograd through STFT→mel→dB."""
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    fft_length, hop, mels, sr = 512, 128, 40, 16000
    fb64 = np.asarray(ops.create_mel_filter(mels, sr, 0.0, None,
                                            fft_length // 2 + 1),
                      dtype=np.float64)

    def loss_jax(xj):
        spec = ops.stft(xj, fft_length, hop)
        p = ops.complex_norm(spec, 2.0)
        mel = ops.apply_filterbank(p, jnp.asarray(fb64, jnp.float32))
        return jnp.sum(ops.amplitude_to_db(mel, power=2.0))

    g_jax = np.asarray(jax.grad(loss_jax)(jnp.asarray(x)))

    xt = torch.as_tensor(x, dtype=torch.float64).requires_grad_(True)
    w = torch.hann_window(fft_length, dtype=torch.float64)
    s = torch.stft(xt, fft_length, hop, window=w, center=True,
                   pad_mode="reflect", return_complex=True)
    p = s.real ** 2 + s.imag ** 2
    mel = torch.matmul(p.transpose(-2, -1),
                       torch.as_tensor(fb64)).transpose(-2, -1)
    db = 10.0 * torch.log10(torch.clamp(mel, min=1e-7)) \
        - 10.0 * np.log10(1e-7) * 0  # ref=1 => no offset beyond clamp
    torch.sum(10.0 * torch.log10(torch.clamp(mel, min=1e-7))).backward()
    g_ref = xt.grad.numpy()

    scale = np.max(np.abs(g_ref)) + 1e-12
    assert np.max(np.abs(g_jax - g_ref)) / scale <= 1e-4


def test_mu_law_companding_gradient():
    # the companding curve (pre-quantization) is differentiable
    x = jnp.asarray([0.3, -0.5])
    genc = jax.grad(lambda v: jnp.sum(
        jnp.sign(v) * jnp.log1p(255 * jnp.abs(v)) / np.log1p(255)))(x)
    assert np.all(np.isfinite(np.asarray(genc)))


def test_db_to_amplitude_layer_power(rng):
    x = jnp.asarray((rng.random((5,)) + 0.1).astype(np.float32))
    db = ops.amplitude_to_db(x, power=2.0)
    back = ops.db_to_amplitude(db, power=2.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4)
