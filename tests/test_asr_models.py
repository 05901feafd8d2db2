"""Wav2Letter / DeepSpeech (`models/asr.py`): shapes, gradient flow,
CTC training loss decreases, jit, validation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models.asr import Wav2Letter, DeepSpeech


def test_wav2letter_waveform_shapes():
    m = Wav2Letter(num_classes=12, input_type="waveform")
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 16000)), jnp.float32)
    y = m.apply(p, x)
    assert y.shape[0] == 2 and y.shape[2] == 12
    assert y.shape[1] == 16000 // 160 // 2  # stride 160 then 2
    with pytest.raises(ValueError):
        m.apply(p, jnp.ones((2, 100, 3)))
    with pytest.raises(ValueError):
        Wav2Letter(input_type="bogus")
    with pytest.raises(ValueError):
        Wav2Letter(input_type="waveform", num_features=3)


def test_wav2letter_feature_input_and_grads():
    m = Wav2Letter(num_classes=8, input_type="mfcc", num_features=13)
    p = m.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 13, 40)), jnp.float32)
    y = m.apply(p, x)
    assert y.shape == (2, 20, 8)
    g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead


def test_deepspeech_shapes_and_grads():
    m = DeepSpeech(n_feature=20, n_hidden=32, n_class=10)
    p = m.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((3, 15, 20)), jnp.float32)
    y = jax.jit(m.apply)(p, x)
    assert y.shape == (3, 15, 10)
    g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead
    with pytest.raises(ValueError):
        m.apply(p, jnp.ones((3, 15, 4)))


def test_deepspeech_rnn_is_bidirectional():
    """Future frames must influence current output (backward scan)."""
    m = DeepSpeech(n_feature=6, n_hidden=16, n_class=4)
    p = m.init(jax.random.PRNGKey(3))
    x = np.zeros((1, 10, 6), np.float32)
    y1 = np.asarray(m.apply(p, jnp.asarray(x)))
    x2 = x.copy()
    x2[0, 9] = 1.0                      # change only the LAST frame
    y2 = np.asarray(m.apply(p, jnp.asarray(x2)))
    assert np.abs(y1[0, 0] - y2[0, 0]).max() > 1e-7


@pytest.mark.parametrize("model", ["w2l", "ds"])
def test_ctc_training_decreases(model):
    rng = np.random.default_rng(4)
    if model == "w2l":
        m = Wav2Letter(num_classes=6, input_type="mfcc",
                       num_features=8)
        x = jnp.asarray(rng.standard_normal((2, 8, 24)), jnp.float32)
    else:
        m = DeepSpeech(n_feature=8, n_hidden=24, n_class=6)
        x = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    p = m.init(jax.random.PRNGKey(5))
    tgt = jnp.asarray(rng.integers(1, 6, (2, 3)), jnp.int32)

    def loss_fn(pp):
        lp = jax.nn.log_softmax(m.apply(pp, x), -1)
        return tac.ctc_loss(lp, tgt)

    step = jax.jit(lambda pp: (loss_fn(pp), jax.grad(loss_fn)(pp)))
    losses = []
    for _ in range(10):
        l, g = step(p)
        losses.append(float(l))
        p = jax.tree_util.tree_map(lambda w, gr: w - 0.02 * gr, p, g)
    assert losses[-1] < losses[0] * 0.9, losses
