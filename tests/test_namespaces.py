"""The torchaudio-shaped namespace aliases: reference code written as
``import torchaudio.functional as F`` / ``torchaudio.transforms as T`` /
``torchaudio.prototype.*`` must port by changing only the package name
[ref-recon: torchaudio package layout — UNVERIFIED, mount empty].
Each alias re-exports the SAME object as the flat package surface."""

import importlib

import torchaudio_contrib_tpu as tac


ADAPTED = {"spectrogram", "griffinlim", "pitch_shift",
           "spectral_centroid", "lfilter"}


def test_functional_namespace_identity():
    F = importlib.import_module("torchaudio_contrib_tpu.functional")
    for name in F.__all__:
        if name in ADAPTED:     # torchaudio-signature adapters
            assert getattr(F, name) is not getattr(tac.ops, name), name
        else:
            assert getattr(F, name) is getattr(tac.ops, name), name


def test_functional_spectrogram_adapter():
    import numpy as np
    import jax.numpy as jnp
    F = tac.functional
    x = np.random.default_rng(0).standard_normal((2, 2000)) \
        .astype(np.float32)
    mag = F.spectrogram(x, pad=0, window=None, n_fft=256,
                        hop_length=128, win_length=256, power=2.0,
                        normalized=False)
    ref = tac.ops.spectrogram(x, 256, 128, 256, power=2.0)
    assert float(jnp.max(jnp.abs(mag - ref))) < 1e-5
    cplx = F.spectrogram(x, pad=0, window=None, n_fft=256,
                         hop_length=128, win_length=256, power=None,
                         normalized=False)
    assert jnp.iscomplexobj(cplx)
    padded = F.spectrogram(x, pad=64, window=None, n_fft=256,
                           hop_length=128, win_length=256, power=1.0,
                           normalized=False)
    assert padded.shape[-1] > mag.shape[-1]


def test_functional_griffinlim_and_centroid_adapters():
    import numpy as np
    F = tac.functional
    x = np.random.default_rng(1).standard_normal((1, 4000)) \
        .astype(np.float32)
    spec = F.spectrogram(x, pad=0, window=None, n_fft=256,
                         hop_length=64, win_length=256, power=2.0,
                         normalized=False)
    wav = F.griffinlim(spec, window=None, n_fft=256, hop_length=64,
                       win_length=256, power=2.0, n_iter=4,
                       momentum=0.9, length=4000, rand_init=False)
    assert wav.shape == (1, 4000)
    c = F.spectral_centroid(x, 16000, pad=0, window=None, n_fft=256,
                            hop_length=64, win_length=256)
    assert c.shape[-1] == spec.shape[-1]


def test_functional_has_core_names():
    F = tac.functional
    for name in ("spectrogram", "melscale_fbanks", "resample",
                 "amplitude_to_DB", "rnnt_loss", "forced_align",
                 "lfilter", "mvdr_weights_souden"):
        assert callable(getattr(F, name)), name


def test_transforms_namespace_identity():
    T = importlib.import_module("torchaudio_contrib_tpu.transforms")
    for name in T.__all__:
        assert getattr(T, name) is getattr(tac.models, name), name


def test_transforms_construct_and_run():
    import numpy as np
    T = tac.transforms
    mel = T.MelSpectrogram(sample_rate=16000, n_fft=400, n_mels=23)
    out = mel(np.zeros((1, 1600), np.float32))
    assert out.shape[-2] == 23


def test_prototype_namespaces():
    P = tac.prototype
    for sub in ("functional", "transforms", "models", "pipelines"):
        mod = getattr(P, sub)
        for name in mod.__all__:
            assert hasattr(mod, name), f"{sub}.{name}"
    assert P.functional.ray_tracing is tac.ops.ray_tracing
    assert P.transforms.BarkSpectrogram is tac.models.BarkSpectrogram
    assert P.models.ConvEmformer is tac.models.ConvEmformer
    assert (P.pipelines.HIFIGAN_VOCODER_V3_LJSPEECH
            is tac.pipelines.HIFIGAN_VOCODER_V3_LJSPEECH)


def test_top_level_exposes_aliases():
    for name in ("functional", "transforms", "prototype"):
        assert name in tac.__all__
        assert importlib.import_module(f"torchaudio_contrib_tpu.{name}")
