"""Layer API: layer≡functional, pipeline composition, checkpoint contract,
trainable filterbank gradients — mirroring the reference's test_layers.py
coverage [SURVEY.md §4] plus the JAX-specific static-arg contract."""
import numpy as np
import jax
import jax.numpy as jnp

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu import ops


def test_stft_layer_equals_functional(rng):
    x = jnp.asarray(rng.standard_normal((2, 2, 4096)).astype(np.float32))
    layer = tac.STFT(512, 128)
    np.testing.assert_array_equal(np.asarray(layer(x)),
                                  np.asarray(ops.stft(x, 512, 128)))


def test_complex_norm_layer(rng):
    c = jnp.asarray((rng.standard_normal((2, 5, 7))
                     + 1j * rng.standard_normal((2, 5, 7)))
                    .astype(np.complex64))
    np.testing.assert_array_equal(np.asarray(tac.ComplexNorm(2.0)(c)),
                                  np.asarray(ops.complex_norm(c, 2.0)))


def test_scalar_layers(rng):
    x = jnp.asarray((rng.random((3, 50)) + 1e-3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(tac.AmplitudeToDb()(x)),
                                  np.asarray(ops.amplitude_to_db(x)))
    db = tac.AmplitudeToDb()(x)
    np.testing.assert_allclose(np.asarray(tac.DbToAmplitude()(db)),
                               np.asarray(x), rtol=1e-4)
    w = jnp.asarray((rng.random(100) * 2 - 1).astype(np.float32))
    enc = tac.MuLawEncoding(256)(w)
    np.testing.assert_array_equal(np.asarray(enc),
                                  np.asarray(ops.mu_law_encoding(w, 256)))
    np.testing.assert_array_equal(
        np.asarray(tac.MuLawDecoding(256)(enc)),
        np.asarray(ops.mu_law_decoding(enc, 256)))


def test_spectrogram_factory_structure(rng):
    spec = tac.Spectrogram(power=2.0, fft_length=512, hop_length=128)
    assert isinstance(spec, tac.Pipeline) and len(spec) == 2
    assert isinstance(spec[0], tac.STFT)
    assert isinstance(spec[1], tac.ComplexNorm)
    x = jnp.asarray(rng.standard_normal((2, 1, 4096)).astype(np.float32))
    out = spec(x)
    n_frames = ops.num_frames(4096, 512, 128)
    assert out.shape == (2, 1, 257, n_frames)
    assert not jnp.iscomplexobj(out)


def test_melspectrogram_factory(rng):
    mel = tac.Melspectrogram(num_mels=128, sample_rate=22050,
                             fft_length=2048, hop_length=512)
    assert len(mel) == 3
    x = jnp.asarray(rng.standard_normal((2, 2, 22050)).astype(np.float32))
    out = mel(x)
    assert out.shape[:3] == (2, 2, 128)
    # equals functional chain
    s = ops.stft(x, 2048, 512)
    p = ops.complex_norm(s, 2.0)
    fb = ops.create_mel_filter(128, 22050, 0.0, None, 1025)
    ref = ops.apply_filterbank(p, fb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_melspectrogram_custom_filterbank_splice(rng):
    """The reference's key composition feature: splice a custom filterbank."""
    class Identity(tac.Filterbank):
        def __init__(self, n):
            self.n = n
            self._config = (n,)

        def get_filterbank(self):
            return jnp.eye(self.n, dtype=jnp.float32)

    mel = tac.Melspectrogram(fft_length=512, hop_length=128,
                             filterbank=Identity(257))
    x = jnp.asarray(rng.standard_normal((1, 1, 2048)).astype(np.float32))
    out = mel(x)
    ref = ops.complex_norm(ops.stft(x, 512, 128), 2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_state_dict_excludes_derived_buffers():
    """The _ModuleNoStateBuffers contract: no derived arrays in checkpoints."""
    mel = tac.Melspectrogram(num_mels=64, fft_length=512)
    assert mel.state_dict() == {}
    assert tac.STFT(512).state_dict() == {}
    assert mel.init_params() is None


def test_trainable_filterbank_params_and_grads(rng):
    mel = tac.Melspectrogram(num_mels=32, fft_length=256, hop_length=64,
                             sample_rate=16000, trainable=True)
    params = mel.init_params()
    assert params is not None
    fb = params[-1]
    assert fb.shape == (129, 32)
    x = jnp.asarray(rng.standard_normal((2, 1, 2048)).astype(np.float32))

    def loss(p):
        return jnp.sum(mel(x, params=p))

    grads = jax.grad(loss)(params)
    g_fb = grads[-1]
    assert g_fb.shape == fb.shape
    assert float(jnp.max(jnp.abs(g_fb))) > 0


def test_transforms_hashable_jit_static(rng):
    """Transforms are hashable and usable as jit static args."""
    assert tac.STFT(512, 128) == tac.STFT(512, 128)
    assert tac.STFT(512, 128) != tac.STFT(512, 256)
    assert hash(tac.ComplexNorm(2.0)) == hash(tac.ComplexNorm(2.0))

    @jax.jit
    def run(pipe, x):
        return pipe(x)

    # Pipeline contains only hashable configs → works as a pytree-free arg
    run_static = jax.jit(lambda x, pipe: pipe(x), static_argnums=1)
    x = jnp.asarray(rng.standard_normal((1, 1, 2048)).astype(np.float32))
    out = run_static(x, tac.Melspectrogram(num_mels=32, fft_length=256))
    assert out.shape[-2] == 32


def test_stretch_spec_time(rng):
    spec = ops.stft(jnp.asarray(rng.standard_normal((1, 4096))
                                .astype(np.float32)), 512, 128)
    layer = tac.StretchSpecTime(rate=2.0, hop_length=128, num_freqs=257)
    out = layer(spec)
    assert out.shape[-1] == int(np.ceil(spec.shape[-1] / 2.0))
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(ops.phase_vocoder(
            spec, 2.0, ops.compute_phase_advance(257, 128))))


def test_istft_layer_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 2, 4096)).astype(np.float32))
    spec = tac.STFT(512, 128)(x)
    y = tac.ISTFT(fft_length=512, hop_length=128, length=4096)(spec)
    assert np.max(np.abs(np.asarray(y) - np.asarray(x))) <= 1e-4


def test_pipeline_slicing():
    mel = tac.Melspectrogram(fft_length=512)
    spec_part = mel[:2]
    assert isinstance(spec_part, tac.Pipeline) and len(spec_part) == 2
    assert list(iter(mel))[0] is mel[0]


def test_resample_layer(rng):
    layer = tac.Resample(16000, 8000)
    x = jnp.asarray(rng.standard_normal((2, 1, 1600)).astype(np.float32))
    y = layer(x)
    assert y.shape == (2, 1, 800)
    assert layer.state_dict() == {}


def test_griffinlim_layer(rng):
    mag = jnp.abs(ops.stft(jnp.asarray(
        rng.standard_normal(4096).astype(np.float32)), 256, 64))
    layer = tac.GriffinLim(fft_length=256, hop_length=64, n_iter=4,
                           length=4096)
    y = layer(mag, key=jax.random.PRNGKey(0))
    assert y.shape == (4096,)
    assert layer.state_dict() == {}


def test_apply_filterbank_config_distinguishes_arrays(rng):
    """Regression: raw-array filterbanks were keyed by shape + first 8
    raveled values (~0 for every mel matrix), so two different banks
    hashed equal — unsafe for jit static args / dict keys."""
    fb1 = tac.ops.create_mel_filter(16, 16000, 0.0, 8000.0, 257)
    fb2 = tac.ops.create_mel_filter(16, 16000, 300.0, 6000.0, 257)
    l1 = tac.ApplyFilterbank(np.asarray(fb1))
    l2 = tac.ApplyFilterbank(np.asarray(fb2))
    assert l1 != l2 and hash(l1) != hash(l2)
    # equal content still compares/hashes equal
    l3 = tac.ApplyFilterbank(np.asarray(fb1))
    assert l1 == l3 and hash(l1) == hash(l3)


def test_barkspectrogram_and_chromagram_factories():
    import numpy as np
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops
    from torchaudio_contrib_tpu.models.layers import (
        Barkspectrogram, Chromagram, BarkFilterbank)
    x = jnp.asarray(np.random.default_rng(11)
                    .standard_normal((2, 1, 2000)), jnp.float32)
    bark = Barkspectrogram(n_barks=24, sample_rate=16000,
                           fft_length=512, hop_length=128)
    out = bark(x)
    assert out.shape[:3] == (2, 1, 24)
    # pipeline == manual chain with the same bank
    fb = BarkFilterbank(24, 16000, num_bins=257).get_filterbank()
    spec = ops.complex_norm(ops.stft(x, 512, 128), 2.0)
    ref = ops.apply_filterbank(spec, fb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    chroma = Chromagram(sample_rate=16000, fft_length=512,
                        hop_length=128)
    cg = chroma(x)
    assert cg.shape[:3] == (2, 1, 12)
    assert bool(jnp.all(jnp.isfinite(cg)))
