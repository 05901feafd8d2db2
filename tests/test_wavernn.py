"""WaveRNN (`models/wavernn.py`): shape relations, gradient flow,
teacher-forced training decreases cross-entropy, jit, validation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models.wavernn import WaveRNN


@pytest.fixture(scope="module")
def tiny():
    m = WaveRNN(upsample_scales=(2, 2), n_classes=32, hop_length=4,
                n_res_block=2, n_rnn=24, n_fc=24, kernel_size=3,
                n_freq=10, n_hidden=12, n_output=16)
    return m, m.init(jax.random.PRNGKey(0))


def test_shapes(tiny):
    m, p = tiny
    t_mel = 9
    t = m.hop * (t_mel - m.kernel + 1)           # 4 * 7 = 28
    wav = jnp.zeros((2, t))
    spec = jnp.zeros((2, 10, t_mel))
    out = jax.jit(m.apply)(p, wav, spec)
    assert out.shape == (2, t, 32)
    with pytest.raises(ValueError):
        m.apply(p, jnp.zeros((2, t + 1)), spec)  # wrong length
    with pytest.raises(ValueError):
        m.apply(p, jnp.zeros((2, 1, t)), spec)
    with pytest.raises(ValueError):
        WaveRNN(upsample_scales=(2, 2), hop_length=5)
    with pytest.raises(ValueError):
        WaveRNN(upsample_scales=(2, 2), hop_length=4, n_output=10)


def test_gradients_reach_trainable_leaves(tiny):
    m, p = tiny
    rng = np.random.default_rng(1)
    t_mel = 7
    t = m.hop * (t_mel - m.kernel + 1)
    wav = jnp.asarray(rng.standard_normal((2, t)), jnp.float32)
    spec = jnp.asarray(rng.standard_normal((2, 10, t_mel)), jnp.float32)
    g = jax.grad(lambda pp: jnp.sum(m.apply(pp, wav, spec) ** 2))(p)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0
            and "upsample" not in jax.tree_util.keystr(k)]
    assert not dead, dead


def test_teacher_forced_training_decreases(tiny):
    """Next-sample cross-entropy drops when fitting one clip."""
    m, p = tiny
    rng = np.random.default_rng(2)
    t_mel = 8
    t = m.hop * (t_mel - m.kernel + 1)
    target = jnp.asarray(rng.integers(0, 32, (1, t)), jnp.int32)
    wav_in = (target.astype(jnp.float32) / 16.0) - 1.0
    spec = jnp.asarray(rng.standard_normal((1, 10, t_mel)), jnp.float32)

    def loss_fn(pp):
        logits = m.apply(pp, wav_in, spec)
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(
            jnp.take_along_axis(lp, target[..., None], -1))

    step = jax.jit(lambda pp: (loss_fn(pp), jax.grad(loss_fn)(pp)))
    losses = []
    for _ in range(12):
        l, g = step(p)
        losses.append(float(l))
        p = jax.tree_util.tree_map(lambda w, gr: w - 0.1 * gr, p, g)
    assert losses[-1] < losses[0] * 0.8, losses


def test_infer_matches_teacher_forced_logits():
    """Generated samples must be exactly what re-sampling from the
    teacher-forced logits (on the generated history) produces with the
    same key chain — pins infer ≡ apply consistency."""
    net = WaveRNN(upsample_scales=(2, 2), hop_length=4, n_classes=16,
                  n_res_block=2, n_rnn=8, n_fc=8, kernel_size=3,
                  n_freq=6, n_hidden=8, n_output=8)
    params = net.init(jax.random.PRNGKey(0))
    spec = jnp.asarray(np.random.default_rng(1)
                       .standard_normal((2, 6, 7)), jnp.float32)
    key = jax.random.PRNGKey(42)
    gen = net.infer(params, spec, key)
    T = 4 * (7 - 3 + 1)
    assert gen.shape == (2, T)
    assert float(jnp.max(jnp.abs(gen))) <= 1.0
    # teacher-force on the generated history (shifted by one)
    hist = jnp.concatenate([jnp.zeros((2, 1)), gen[:, :-1]], 1)
    logits = net.apply(params, hist, spec)
    k = key
    for t in range(T):
        k, sub = jax.random.split(k)
        cls = jax.random.categorical(sub, logits[:, t])
        want = 2.0 * cls.astype(jnp.float32) / 15 - 1.0
        np.testing.assert_allclose(np.asarray(gen[:, t]),
                                   np.asarray(want), atol=1e-6,
                                   err_msg=f"t={t}")
    # deterministic under the same key; different under another
    gen2 = net.infer(params, spec, key)
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(gen2))
    gen3 = net.infer(params, spec, jax.random.PRNGKey(7))
    assert float(jnp.max(jnp.abs(gen3 - gen))) > 0
    with pytest.raises(ValueError, match="specgram"):
        net.infer(params, jnp.zeros((6, 7)), key)
