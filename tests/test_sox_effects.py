"""SoX-style effect chains (`sox_effects/`): dispatch to the
library's ops (equality vs the direct calls), arg parsing (k suffix,
width specs, flags), chain composition, layout round-trips, loud
failures on unsupported forms."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu import sox_effects as SE


@pytest.fixture()
def tone():
    t = np.arange(4000) / 16000.0
    return jnp.asarray(0.4 * np.sin(2 * np.pi * 440 * t),
                       jnp.float32)[None]  # (1, T)


def test_effect_names_sorted():
    names = SE.effect_names()
    assert names == sorted(names)
    assert {"rate", "gain", "lowpass", "tempo"} <= set(names)


def test_single_effects_match_direct_ops(tone):
    sr = 16000
    out, new_sr = SE.apply_effects_tensor(tone, sr, [["gain", "-3"]])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(tac.gain(tone, -3.0)),
                               atol=1e-6)
    assert new_sr == sr
    out, _ = SE.apply_effects_tensor(tone, sr,
                                     [["lowpass", "-2", "1k"]])
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(tac.lowpass_biquad(tone, sr, 1000.0)), atol=1e-6)
    out, _ = SE.apply_effects_tensor(
        tone, sr, [["equalizer", "440", "2q", "6"]])
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(tac.equalizer_biquad(tone, sr, 440.0,
                                        gain_db=6.0, Q=2.0)),
        atol=1e-6)
    # width in Hz converts to Q = center/width
    out_h, _ = SE.apply_effects_tensor(
        tone, sr, [["bandpass", "440", "220h"]])
    np.testing.assert_allclose(
        np.asarray(out_h),
        np.asarray(tac.bandpass_biquad(tone, sr, 440.0, Q=2.0)),
        atol=1e-6)


def test_rate_speed_trim_pad_reverse(tone):
    sr = 16000
    out, new_sr = SE.apply_effects_tensor(tone, sr, [["rate", "8k"]])
    assert new_sr == 8000 and out.shape[-1] == tone.shape[-1] // 2
    out, _ = SE.apply_effects_tensor(tone, sr, [["speed", "2.0"]])
    assert abs(out.shape[-1] - tone.shape[-1] // 2) <= 2
    out, _ = SE.apply_effects_tensor(
        tone, sr, [["trim", "0.05", "0.1"]])
    assert out.shape[-1] == int(0.1 * sr)
    out, _ = SE.apply_effects_tensor(tone, sr,
                                     [["pad", "0.01", "0.02"]])
    assert out.shape[-1] == tone.shape[-1] + int(0.03 * sr)
    assert float(jnp.max(jnp.abs(out[:, :160]))) == 0.0
    out, _ = SE.apply_effects_tensor(tone, sr, [["reverse"]])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(tone[..., ::-1]), atol=0)


def test_tempo_changes_duration_not_pitch(tone):
    sr = 16000
    out, _ = SE.apply_effects_tensor(tone, sr, [["tempo", "2.0"]])
    # half duration (within a frame of hop rounding)
    assert abs(out.shape[-1] - tone.shape[-1] / 2) < 1024
    # dominant frequency unchanged (vs `speed`, which doubles it)
    spec = np.abs(np.fft.rfft(np.asarray(out[0])))
    f = np.fft.rfftfreq(out.shape[-1], 1 / sr)
    assert abs(f[spec.argmax()] - 440.0) < 30.0


def test_gain_normalize_and_norm(tone):
    sr = 16000
    half = tone * 0.5
    out, _ = SE.apply_effects_tensor(half, sr, [["gain", "-n"]])
    np.testing.assert_allclose(float(jnp.max(jnp.abs(out))), 1.0,
                               atol=1e-5)
    out, _ = SE.apply_effects_tensor(half, sr, [["norm", "-6"]])
    np.testing.assert_allclose(float(jnp.max(jnp.abs(out))),
                               10 ** (-6 / 20), atol=1e-5)
    with pytest.raises(ValueError, match="not supported"):
        SE.apply_effects_tensor(tone, sr, [["gain", "-l", "3"]])
    with pytest.raises(ValueError, match="dB amount"):
        SE.apply_effects_tensor(tone, sr, [["gain"]])


def test_chain_composes_in_order(tone):
    sr = 16000
    chained, new_sr = SE.apply_effects_tensor(
        tone, sr, [["vol", "0.5"], ["rate", "8000"],
                   ["dcshift", "0.1"]])
    step = tone * 0.5
    step = tac.ops.resample(step, sr, 8000)
    step = tac.dcshift(step, 0.1)
    assert new_sr == 8000
    np.testing.assert_allclose(np.asarray(chained), np.asarray(step),
                               atol=1e-6)


def test_channels_and_layouts(tone):
    sr = 16000
    stereo = jnp.concatenate([tone, tone * 0.5], 0)
    mono, _ = SE.apply_effects_tensor(stereo, sr,
                                      [["channels", "1"]])
    assert mono.shape[0] == 1
    np.testing.assert_allclose(np.asarray(mono),
                               np.asarray(stereo.mean(0))[None],
                               atol=1e-6)
    up, _ = SE.apply_effects_tensor(tone, sr, [["channels", "2"]])
    assert up.shape[0] == 2
    with pytest.raises(ValueError, match="remix"):
        SE.apply_effects_tensor(stereo, sr, [["channels", "3"]])
    # 1-D in → 1-D out; time-major round-trips
    flat, _ = SE.apply_effects_tensor(tone[0], sr, [["gain", "0"]])
    assert flat.ndim == 1
    tm, _ = SE.apply_effects_tensor(stereo.T, sr, [["gain", "0"]],
                                    channels_first=False)
    assert tm.shape == stereo.T.shape


def test_keyed_and_invalid_effects(tone):
    sr = 16000
    with pytest.raises(ValueError, match="dither needs"):
        SE.apply_effects_tensor(tone, sr, [["dither"]])
    out, _ = SE.apply_effects_tensor(tone, sr, [["dither"]],
                                     key=jax.random.PRNGKey(0))
    assert out.shape == tone.shape
    with pytest.raises(ValueError, match="unsupported sox effect"):
        SE.apply_effects_tensor(tone, sr, [["reverb"]])
    with pytest.raises(ValueError, match="empty effect"):
        SE.apply_effects_tensor(tone, sr, [[]])
    with pytest.raises(ValueError, match="width suffix"):
        SE.apply_effects_tensor(tone, sr, [["lowpass", "1k", "2o"]])
    with pytest.raises(ValueError, match="cannot parse"):
        SE.apply_effects_tensor(tone, sr, [["rate", "fast"]])


def test_fade_and_modfx_dispatch(tone):
    sr = 16000
    out, _ = SE.apply_effects_tensor(
        tone, sr, [["fade", "q", "0.05", "0.2", "0.05"]])
    assert out.shape[-1] == int(0.2 * sr)          # cut at stop
    assert abs(float(out[0, 0])) < 1e-6            # faded in
    assert abs(float(out[0, -1])) < 1e-6           # faded out
    for eff in (["overdrive", "15"], ["contrast", "50"],
                ["phaser"], ["flanger"], ["vad"]):
        out, _ = SE.apply_effects_tensor(tone, sr, [eff])
        assert out.ndim == 2


def test_apply_effects_file(tmp_path, tone):
    from torchaudio_contrib_tpu.io import write_wav
    p = str(tmp_path / "x.wav")
    write_wav(p, np.asarray(tone), 16000)
    out, sr = SE.apply_effects_file(p, [["gain", "-6"],
                                        ["rate", "8k"]])
    assert sr == 8000 and out.shape[0] == 1
    tm, _ = SE.apply_effects_file(p, [["gain", "-6"]],
                                  channels_first=False)
    assert tm.shape[0] == tone.shape[-1]


def test_review_fixes_channels_vol_fade(tone):
    sr = 16000
    # 1-D input + channel-expanding chain keeps the channel axis
    out, _ = SE.apply_effects_tensor(tone[0], sr, [["channels", "2"]])
    assert out.shape == (2, tone.shape[-1])
    # negative power-type vol raises instead of amplifying
    with pytest.raises(ValueError, match="non-negative"):
        SE.apply_effects_tensor(tone, sr, [["vol", "-4", "power"]])
    # fade 'p' is sox's inverted parabola: gain r(2-r)
    n = int(0.1 * sr)
    out, _ = SE.apply_effects_tensor(tone, sr, [["fade", "p", "0.1"]])
    r = np.arange(n) / (n - 1)
    np.testing.assert_allclose(
        np.asarray(out[0, :n]),
        np.asarray(tone[0, :n]) * r * (2 - r), atol=1e-5)


def test_one_d_channels_last_is_time_axis(tone):
    """A 1-D waveform is mono regardless of channels_first — the old
    path transposed it to (time, 1) and ran every effect on the wrong
    axis (reverse was a silent identity)."""
    sr = 16000
    x = jnp.arange(16.0)
    rev, _ = SE.apply_effects_tensor(x, sr, [["reverse"]],
                                     channels_first=False)
    np.testing.assert_allclose(np.asarray(rev), np.asarray(x[::-1]))
    tr, _ = SE.apply_effects_tensor(x, sr, [["trim", "0", str(8 / sr)]],
                                    channels_first=False)
    assert tr.shape == (8,)
    # 2-D (time, channels) still round-trips the layout
    x2 = jnp.stack([jnp.arange(16.0), -jnp.arange(16.0)], axis=1)
    rev2, _ = SE.apply_effects_tensor(x2, sr, [["reverse"]],
                                      channels_first=False)
    np.testing.assert_allclose(np.asarray(rev2),
                               np.asarray(x2[::-1, :]))


def test_vol_db_case_insensitive_and_loud_arg_errors(tone):
    sr = 16000
    # sox spells the type 'dB'
    a, _ = SE.apply_effects_tensor(tone, sr, [["vol", "3", "dB"]])
    b, _ = SE.apply_effects_tensor(tone, sr, [["vol", "3", "db"]])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # unsupported extra args raise instead of silently dropping
    with pytest.raises(ValueError, match="width/slope"):
        SE.apply_effects_tensor(tone, sr, [["bass", "6", "100", "0.5q"]])
    with pytest.raises(ValueError, match="WSOLA"):
        SE.apply_effects_tensor(tone, sr, [["tempo", "1.1", "30"]])
    with pytest.raises(ValueError, match="at most 5"):
        SE.apply_effects_tensor(
            tone, sr, [["phaser", ".8", ".7", "3", ".4", ".5", ".6"]])
    # the full sox flanger arg order is accepted...
    out, _ = SE.apply_effects_tensor(
        tone, sr, [["flanger", "0", "2", "0", "71", "0.5", "sine",
                    "25", "linear"]])
    assert out.shape == tone.shape
    # ...but a bad shape word raises
    with pytest.raises(ValueError, match="flanger shape"):
        SE.apply_effects_tensor(
            tone, sr, [["flanger", "0", "2", "0", "71", "0.5", "saw"]])


def test_band_deemph_riaa_dispatch(tone):
    sr = 16000
    out, _ = SE.apply_effects_tensor(tone, sr, [["band", "440", "2q"]])
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(tac.band_biquad(tone, sr, 440.0, Q=2.0)), atol=1e-6)
    out_n, _ = SE.apply_effects_tensor(tone, sr,
                                       [["band", "-n", "440"]])
    np.testing.assert_allclose(
        np.asarray(out_n),
        np.asarray(tac.band_biquad(tone, sr, 440.0, noise=True)),
        atol=1e-6)
    out, _ = SE.apply_effects_tensor(tone, 44100, [["deemph"]])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(tac.deemph_biquad(tone, 44100)),
        atol=1e-6)
    out, _ = SE.apply_effects_tensor(tone, 44100, [["riaa"]])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(tac.riaa_biquad(tone, 44100)),
        atol=1e-6)
    with pytest.raises(ValueError):
        SE.apply_effects_tensor(tone, 44100, [["deemph", "1"]])
    with pytest.raises(ValueError):
        SE.apply_effects_tensor(tone, 44100, [["riaa", "x"]])
