"""Extended layer wrappers (models/transforms.py): layer ≡ functional,
immutability contract (hashable config, empty state_dict), argument
validation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac


def _wav(shape=(2, 4096), seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return jnp.asarray((scale * rng.standard_normal(shape))
                       .astype(np.float32))


def test_simple_wrappers_equal_functional():
    x = _wav()
    sr = 16000
    cases = [
        (tac.MFCC(sample_rate=sr, n_mfcc=13, fft_length=512,
                  hop_length=128),
         lambda w: tac.mfcc(w, sample_rate=sr, n_mfcc=13,
                            fft_length=512, hop_length=128)),
        (tac.Loudness(sr), lambda w: tac.loudness(w, sr)),
        (tac.Fade(100, 200, "logarithmic"),
         lambda w: tac.fade(w, 100, 200, "logarithmic")),
        (tac.Preemphasis(0.95), lambda w: tac.preemphasis(w, 0.95)),
        (tac.Deemphasis(0.95), lambda w: tac.deemphasis(w, 0.95)),
        (tac.Overdrive(15.0, 10.0),
         lambda w: tac.overdrive(w, 15.0, 10.0)),
        (tac.Contrast(50.0), lambda w: tac.contrast(w, 50.0)),
        (tac.Phaser(sr), lambda w: tac.phaser(w, sr)),
        (tac.Flanger(sr, depth=1.0),
         lambda w: tac.flanger(w, sr, depth=1.0)),
        (tac.Lowpass(sr, 2000.0),
         lambda w: tac.lowpass_biquad(w, sr, 2000.0)),
        (tac.Highpass(sr, 400.0),
         lambda w: tac.highpass_biquad(w, sr, 400.0)),
        (tac.Equalizer(sr, 1000.0, 6.0),
         lambda w: tac.equalizer_biquad(w, sr, 1000.0, 6.0)),
        (tac.Speed(sr, 1.5), lambda w: tac.speed(w, sr, 1.5)),
        (tac.PitchShift(sr, 2.0, fft_length=512, hop_length=128),
         lambda w: tac.pitch_shift(w, sample_rate=sr, n_steps=2.0,
                                   fft_length=512, hop_length=128)),
    ]
    xl = _wav((2, 16384), seed=9)     # ≥ one 400 ms gating block @16k
    for layer, fn in cases:
        arg = xl[:, None, :] if isinstance(layer, tac.Loudness) else x
        got, want = layer(arg), fn(arg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6,
                                   err_msg=type(layer).__name__)
        assert layer.state_dict() == {}
        assert layer == layer and isinstance(hash(layer), int)


def test_spec_wrappers_equal_functional():
    x = _wav((1, 8192), seed=1)
    sr = 16000
    mag = tac.complex_norm(tac.stft(x, 512, 128))

    sc = tac.SpectralCentroid(sr, 512, 128)
    np.testing.assert_allclose(
        np.asarray(sc(x)),
        np.asarray(tac.spectral_centroid(mag, sr)), atol=1e-5)

    fb = tac.create_mel_filter(64, sr, 0.0, None, mag.shape[-2])
    mel = tac.apply_filterbank(mag ** 2, fb)
    inv = tac.InverseMelScale(num_bins=mag.shape[-2], num_mels=64,
                              sample_rate=sr)
    inv_fb = tac.create_inverse_mel_filter(
        num_mels=64, sample_rate=sr, num_bins=mag.shape[-2])
    np.testing.assert_allclose(
        np.asarray(inv(mel)),
        np.asarray(tac.mel_to_linear(mel, inv_fb)), atol=1e-6)

    dl = tac.ComputeDeltas(7)
    np.testing.assert_allclose(np.asarray(dl(mel)),
                               np.asarray(tac.compute_deltas(mel, 7)),
                               atol=1e-6)
    cm = tac.SlidingWindowCmn(cmn_window=50, center=True)
    np.testing.assert_allclose(
        np.asarray(cm(mel)),
        np.asarray(tac.sliding_window_cmn(mel, cmn_window=50,
                                          center=True)), atol=1e-6)


def test_keyed_and_multi_input_wrappers():
    x = _wav((1, 4096), seed=2)
    spec = jnp.abs(tac.stft(x, 256, 64))
    key = jax.random.PRNGKey(0)

    fm = tac.FrequencyMasking(20)
    np.testing.assert_allclose(
        np.asarray(fm(spec, key=key)),
        np.asarray(tac.freq_mask(key, spec, 20, mask_value=0.0)),
        atol=1e-6)
    tm = tac.TimeMasking(15)
    np.testing.assert_allclose(
        np.asarray(tm(spec, key=key)),
        np.asarray(tac.time_mask(key, spec, 15, mask_value=0.0)),
        atol=1e-6)
    with pytest.raises(TypeError):
        fm(spec)

    noise = _wav((1, 4096), seed=3)
    an = tac.AddNoise()
    np.testing.assert_allclose(
        np.asarray(an(x, noise=noise, snr=10.0)),
        np.asarray(tac.add_noise(x, noise, 10.0)), atol=1e-6)
    with pytest.raises(TypeError):
        an(x)


def test_beamforming_wrappers():
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.standard_normal((4, 4096)).astype(np.float32))
    spec = tac.stft(wav, 256, 64)
    p = tac.PSD()
    psd_s, psd_n = p(spec), p(spec * 0.3)
    np.testing.assert_allclose(np.asarray(jnp.abs(psd_s)),
                               np.asarray(jnp.abs(tac.psd(spec))),
                               atol=1e-6)

    sm = tac.SoudenMVDR()
    got = sm(spec, psd_s=psd_s, psd_n=psd_n)
    w = tac.mvdr_weights_souden(psd_s, psd_n)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(got)),
        np.asarray(jnp.abs(tac.apply_beamforming(w, spec))), atol=1e-5)

    rtf = tac.rtf_power(psd_s, psd_n)
    rm = tac.RTFMVDR()
    got2 = rm(spec, rtf=rtf, psd_n=psd_n)
    w2 = tac.mvdr_weights_rtf(rtf, psd_n)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(got2)),
        np.asarray(jnp.abs(tac.apply_beamforming(w2, spec))),
        atol=1e-5)
    with pytest.raises(TypeError):
        sm(spec)
    with pytest.raises(TypeError):
        rm(spec)


def test_vol_semantics():
    x = _wav((1, 100), scale=0.1)
    np.testing.assert_allclose(np.asarray(tac.Vol(2.0, "amplitude")(x)),
                               np.asarray(2.0 * x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tac.Vol(4.0, "power")(x)),
                               np.asarray(2.0 * x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tac.Vol(6.0206, "db")(x)),
                               np.asarray(2.0 * x), atol=1e-4)
    # clipping at full scale
    big = tac.Vol(100.0, "amplitude")(x)
    assert float(jnp.max(jnp.abs(big))) <= 1.0
    with pytest.raises(ValueError):
        tac.Vol(-1.0, "amplitude")
    with pytest.raises(ValueError):
        tac.Vol(1.0, "loud")


def test_wrappers_are_hashable_configs():
    a = tac.MFCC(sample_rate=16000, n_mfcc=13)
    b = tac.MFCC(sample_rate=16000, n_mfcc=13)
    c = tac.MFCC(sample_rate=16000, n_mfcc=20)
    assert a == b and hash(a) == hash(b) and a != c
    d = {a: 1, c: 2}
    assert d[b] == 1


def test_rnnt_loss_transform_matches_functional():
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.standard_normal((2, 6, 4, 5)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 5, (2, 3)), jnp.int32)
    t = tac.RNNTLoss(blank=0)
    np.testing.assert_allclose(
        float(t(z, tgt)), float(tac.rnnt_loss(z, tgt, blank=0)))
    assert t == tac.RNNTLoss(blank=0)
    assert t != tac.RNNTLoss(blank=0, reduction="sum")


def test_convolve_lfcc_speedperturb_wrappers():
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal(500), jnp.float32)
    k = jnp.ones(7) / 7
    np.testing.assert_allclose(
        np.asarray(tac.Convolve("same")(x, k)),
        np.asarray(tac.ops.convolve(x, k, mode="same")), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tac.FFTConvolve("full")(x, k)),
        np.asarray(tac.ops.fftconvolve(x, k, mode="full")), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tac.LFCC(sample_rate=8000, fft_length=256,
                            hop_length=128)(x)),
        np.asarray(tac.ops.lfcc(x, sample_rate=8000, fft_length=256,
                                hop_length=128)), atol=1e-6)
    sp = tac.SpeedPerturbation(16000, [0.9, 1.1])
    key = jax.random.PRNGKey(0)
    out1 = sp(x, key)
    out2 = sp(x, key)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape[-1] != x.shape[-1]  # 0.9 or 1.1 both change length
    with pytest.raises(ValueError):
        tac.SpeedPerturbation(16000, [])


def test_melscale_and_inverse_spectrogram():
    """MelScale ≡ apply_filterbank(create_mel_filter); the
    InverseSpectrogram alias ≡ the ISTFT layer ≡ functional istft."""
    x = _wav((1, 4096))
    spec = tac.stft(x, 512, 128)
    mag = tac.complex_norm(spec, power=1.0)
    t = tac.MelScale(num_mels=32, sample_rate=16000, num_bins=257)
    fb = tac.create_mel_filter(num_mels=32, sample_rate=16000,
                               num_bins=257)
    np.testing.assert_allclose(
        np.asarray(t(mag)),
        np.asarray(tac.apply_filterbank(mag, fb)), atol=0)
    assert t(mag).shape == (1, 32, mag.shape[-1])
    # slaney variant forwards through
    ts = tac.MelScale(num_mels=32, sample_rate=16000, num_bins=257,
                      mel_scale="slaney", norm="slaney")
    fbs = tac.create_mel_filter(num_mels=32, sample_rate=16000,
                                num_bins=257, mel_scale="slaney",
                                norm="slaney")
    np.testing.assert_allclose(np.asarray(ts(mag)),
                               np.asarray(tac.apply_filterbank(mag, fbs)),
                               atol=0)
    inv = tac.InverseSpectrogram(fft_length=512, hop_length=128,
                                 length=4096)
    assert isinstance(inv, tac.ISTFT)
    np.testing.assert_allclose(
        np.asarray(inv(spec)),
        np.asarray(tac.istft(spec, 128, fft_length=512, length=4096)),
        atol=0)
    assert hash(inv._config) is not None
