"""VAD (`ops/vad.py`): behavioral pinning on synthetic speech/noise.

No torchaudio oracle exists in this environment; semantics are pinned
behaviorally: onset accuracy on speech-after-silence, scale-invariant
noise-floor adaptation, no-speech rejection, batch/jit consistency,
and the loud lifter-parameter deviation (module docstring).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac

SR = 16000


def _speechy(dur, amp=0.3, f0=120.0, seed=None):
    t = np.arange(int(dur * SR)) / SR
    sig = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 9))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    return (amp * env * sig).astype(np.float32)


def _noise(dur, amp=0.01, seed=0):
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal(int(dur * SR))).astype(np.float32)


def test_onset_after_silence():
    x = jnp.asarray(np.concatenate([np.zeros(SR, np.float32),
                                    _speechy(1.5)]))
    on = int(tac.vad_onset(x, SR))
    assert 0.9 * SR <= on <= 1.45 * SR, on / SR


@pytest.mark.parametrize("noise_amp", [0.005, 0.05, 0.1])
def test_onset_after_noise_any_level(noise_amp):
    """The measure is scale-invariant: the adapted floor never triggers,
    speech above it always does."""
    amp = max(5 * noise_amp, 0.3)
    x = jnp.asarray(np.concatenate([_noise(1.0, noise_amp),
                                    _speechy(1.5, amp)]))
    on = int(tac.vad_onset(x, SR))
    assert 0.9 * SR <= on <= 1.45 * SR, (noise_amp, on / SR)


def test_sustained_speech_not_absorbed_into_floor():
    """Speech-gated noise adaptation: a constant-amplitude voice after
    silence/noise must stay above the floor (without the gate,
    noise_up_time=0.1 s outruns the 0.4 s spectrum smoother and
    sustained speech vanished into the floor — round-3 regression)."""
    t = np.arange(int(1.5 * SR)) / SR
    sustained = (0.3 * sum(np.sin(2 * np.pi * 120.0 * k * t) / k
                           for k in range(1, 9))).astype(np.float32)
    for lead in (np.zeros(SR, np.float32), _noise(1.0)):
        x = jnp.asarray(np.concatenate([lead, sustained]))
        on = int(tac.vad_onset(x, SR))
        assert 0.8 * SR <= on <= 1.45 * SR, on / SR


def test_loud_noise_only_rejected():
    rng = np.random.default_rng(5)
    x = jnp.asarray((0.2 * rng.standard_normal(int(2.5 * SR)))
                    .astype(np.float32))
    assert int(tac.vad_onset(x, SR)) == x.shape[-1]


def test_no_speech_returns_clip_length():
    x = jnp.asarray(_noise(2.5, 0.02))
    assert int(tac.vad_onset(x, SR)) == x.shape[-1]
    z = jnp.zeros(2 * SR)
    assert int(tac.vad_onset(z, SR)) == z.shape[-1]


def test_speech_from_start_triggers_early():
    x = jnp.asarray(_speechy(2.0))
    on = int(tac.vad_onset(x, SR))
    assert on <= 0.7 * SR, on / SR     # boot period bounds how early


def test_batch_matches_single_and_jit():
    a = np.concatenate([np.zeros(SR, np.float32), _speechy(1.5)])
    b = np.concatenate([_noise(1.0), _speechy(1.5)])
    xb = jnp.asarray(np.stack([a, b]))
    got = np.asarray(tac.vad_onset(xb, SR))
    single = np.array([int(tac.vad_onset(jnp.asarray(a), SR)),
                       int(tac.vad_onset(jnp.asarray(b), SR))])
    np.testing.assert_array_equal(got, single)
    jitted = np.asarray(jax.jit(
        lambda w: tac.vad_onset(w, SR))(xb))
    np.testing.assert_array_equal(jitted, single)


def test_vad_trims_and_validates():
    x = jnp.asarray(np.concatenate([np.zeros(SR, np.float32),
                                    _speechy(1.5)]))
    y = tac.vad(x, SR)
    assert y.shape[-1] < x.shape[-1]
    assert y.shape[-1] >= 1.05 * SR    # kept ≥ the speech segment
    # 2-channel: shared (min) onset keeps channels aligned
    x2 = jnp.stack([x, jnp.asarray(np.concatenate(
        [np.zeros(SR // 2, np.float32), _speechy(2.0)]))])
    y2 = tac.vad(x2, SR)
    assert y2.shape[0] == 2 and y2.shape[-1] <= x.shape[-1]
    with pytest.raises(ValueError):
        tac.vad(jnp.zeros((2, 2, SR)), SR)
    with pytest.raises(ValueError):
        tac.vad_onset(jnp.zeros(10), SR)     # shorter than one window


def test_lifter_params_raise_loudly():
    x = jnp.zeros(SR)
    with pytest.raises(NotImplementedError):
        tac.vad_onset(x, SR, hp_lifter_freq=100.0)
    with pytest.raises(NotImplementedError):
        tac.vad_onset(x, SR, lp_lifter_freq=1000.0)


def test_pre_trigger_rewinds():
    x = jnp.asarray(np.concatenate([np.zeros(SR, np.float32),
                                    _speechy(1.5)]))
    on = int(tac.vad_onset(x, SR))
    on_pre = int(tac.vad_onset(x, SR, pre_trigger_time=0.3))
    assert on_pre <= on - int(0.25 * SR)


def test_vad_layer_wrapper():
    x = jnp.asarray(np.concatenate([np.zeros(SR, np.float32),
                                    _speechy(1.5)]))[None]
    layer = tac.Vad(SR)
    np.testing.assert_array_equal(np.asarray(layer(x)),
                                  np.asarray(tac.vad_onset(x, SR)))
    assert layer.state_dict() == {}


def test_vad_trim_matches_eager_vad_under_jit():
    """vad_trim (fixed shapes) == eager vad trim + zero tail, inside
    jit, single clip and batch; valid_length is T - onset."""
    x = jnp.asarray(np.concatenate([np.zeros(SR, np.float32),
                                    _speechy(1.5)]))
    trimmed, valid = jax.jit(
        lambda v: tac.vad_trim(v, SR))(x)
    assert trimmed.shape == x.shape
    onset = int(tac.vad_onset(x, SR))
    assert int(valid) == x.shape[-1] - onset
    eager = np.asarray(tac.vad(x, SR))
    np.testing.assert_array_equal(
        np.asarray(trimmed)[:int(valid)], eager)
    assert not np.any(np.asarray(trimmed)[int(valid):])

    batch = jnp.stack([x, jnp.roll(x, SR // 2)])
    bt, bv = jax.jit(lambda v: tac.vad_trim(v, SR))(batch)
    assert bt.shape == batch.shape and bv.shape == (2,)


def test_vad_trim_channels_share_min_onset():
    x = jnp.asarray(np.concatenate([np.zeros(SR, np.float32),
                                    _speechy(1.5)]))
    two = jnp.stack([x, jnp.concatenate(
        [jnp.zeros(SR // 2), x[:-SR // 2]])])   # ch 1 speech later
    trimmed, valid = tac.vad_trim(two, SR)
    v = np.asarray(valid)
    assert v[0] == v[1]                          # shared min onset
    np.testing.assert_array_equal(
        np.asarray(trimmed)[0, :v[0]], np.asarray(tac.vad(two, SR))[0])


def test_vad_layer_trim_mode_jits():
    x = jnp.asarray(np.concatenate([np.zeros(SR, np.float32),
                                    _speechy(1.5)]))[None]
    layer = tac.Vad(SR, mode="trim")
    trimmed, valid = jax.jit(layer)(x)
    assert trimmed.shape == x.shape
    t2, v2 = layer(x)
    np.testing.assert_array_equal(np.asarray(trimmed), np.asarray(t2))
    with pytest.raises(ValueError):
        tac.Vad(SR, mode="bogus")
