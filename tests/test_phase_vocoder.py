"""Phase vocoder: shape, identity rate, parity vs independent float64 NumPy."""
import numpy as np
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def _pv_numpy(spec, rate, phase_advance):
    """Independent float64 phase-vocoder (torchaudio-style algorithm)."""
    t_steps = np.arange(0, spec.shape[-1], rate, dtype=np.float64)
    alphas = t_steps % 1.0
    phase_0 = np.angle(spec[..., :1])
    padded = np.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, 2)])
    idx = t_steps.astype(np.int64)
    s0 = padded[..., idx]
    s1 = padded[..., idx + 1]
    angle_0, angle_1 = np.angle(s0), np.angle(s1)
    norm_0, norm_1 = np.abs(s0), np.abs(s1)
    phase = angle_1 - angle_0 - phase_advance
    phase = phase - 2 * np.pi * np.round(phase / (2 * np.pi))
    phase = phase + phase_advance
    phase = np.concatenate([phase_0, phase[..., :-1]], axis=-1)
    phase_acc = np.cumsum(phase, axis=-1)
    mag = alphas * norm_1 + (1 - alphas) * norm_0
    return mag * np.exp(1j * phase_acc)


def test_identity_rate(rng):
    spec = (rng.standard_normal((2, 33, 40))
            + 1j * rng.standard_normal((2, 33, 40))).astype(np.complex64)
    adv = ops.compute_phase_advance(33, 16)
    out = ops.phase_vocoder(jnp.asarray(spec), 1.0, adv)
    np.testing.assert_array_equal(np.asarray(out), spec)


def test_output_length(rng):
    spec = jnp.asarray((rng.standard_normal((5, 65, 100))
                        + 1j * rng.standard_normal((5, 65, 100)))
                       .astype(np.complex64))
    adv = ops.compute_phase_advance(65, 32)
    for rate in (0.5, 0.8, 1.25, 2.0):
        out = ops.phase_vocoder(spec, rate, adv)
        assert out.shape == spec.shape[:-1] + (
            int(np.ceil(100 / rate)),), rate


def test_parity_vs_numpy(rng):
    n_freq, hop = 33, 16
    spec = (rng.standard_normal((2, n_freq, 60))
            + 1j * rng.standard_normal((2, n_freq, 60))).astype(np.complex64)
    adv_np = np.linspace(0, np.pi * hop, n_freq)[:, None]
    for rate in (0.7, 1.3, 2.0):
        ours = np.asarray(ops.phase_vocoder(
            jnp.asarray(spec), rate, ops.compute_phase_advance(n_freq, hop)))
        ref = _pv_numpy(spec.astype(np.complex128), rate, adv_np)
        np.testing.assert_allclose(ours, ref.astype(np.complex64), atol=2e-3)


def test_stretch_preserves_energy_scale(rng):
    """Stretching white noise roughly preserves per-frame magnitudes."""
    x = rng.standard_normal((1, 8192)).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 256, 64)
    adv = ops.compute_phase_advance(129, 64)
    out = ops.phase_vocoder(spec, 2.0, adv)
    m_in = float(jnp.mean(ops.complex_norm(spec)))
    m_out = float(jnp.mean(ops.complex_norm(out)))
    assert 0.5 < m_out / m_in < 2.0


def test_phase_advance_uses_fft_length():
    """Regression: fft_length was accepted but ignored — the advance is
    2π·hop·f/N per bin f, which differs from the onesided default
    whenever fft_length != 2·(n_freqs-1) (e.g. two-sided specs)."""
    n_freqs, hop = 64, 32
    # two-sided: n_freqs == fft_length
    adv = np.asarray(ops.compute_phase_advance(n_freqs, hop, n_freqs))
    want = 2 * np.pi * hop * np.arange(n_freqs) / n_freqs
    np.testing.assert_allclose(adv[:, 0], want, rtol=1e-6)
    # onesided default unchanged: linspace(0, π·hop, n_freqs)
    adv1 = np.asarray(ops.compute_phase_advance(129, hop))
    np.testing.assert_allclose(
        adv1[:, 0], np.linspace(0, np.pi * hop, 129), rtol=1e-6)
    # and it equals the explicit onesided fft_length
    adv2 = np.asarray(ops.compute_phase_advance(129, hop, 256))
    np.testing.assert_allclose(adv1, adv2, rtol=1e-6)
