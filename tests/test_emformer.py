"""Emformer (`models/emformer.py`): streaming infer ≡ full-utterance
apply (the defining invariant), block causality, memory-bank reach,
padding invariance, gradient flow, jit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models.emformer import Emformer


@pytest.fixture(scope="module")
def small():
    enc = Emformer(input_dim=16, num_heads=2, ffn_dim=32, num_layers=2,
                   segment_length=4, left_context_length=3,
                   right_context_length=2, max_memory_size=2,
                   tanh_on_mem=True)
    params = enc.init(jax.random.PRNGKey(0))
    return enc, params


def _stream(enc, params, x, lengths, T, jit=False):
    """Feed `x (B, T+R, D)` chunkwise; return stitched (B, Tp, D)."""
    B = x.shape[0]
    S, R = enc.S, enc.R
    nseg = -(-T // S)
    Tp = nseg * S
    ext = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    lengths = np.asarray(lengths)
    ext_len = lengths + np.where(lengths == T, R, 0)
    state = enc.init_state(B)
    step = jax.jit(enc.infer) if jit else enc.infer
    outs = []
    for i in range(nseg):
        base = i * S
        rc_start = min(base + S, T)
        utt = ext[:, base:base + S]
        rc = ext[:, rc_start:rc_start + R]
        utt_len = np.clip(lengths - base, 0, S)
        rc_len = np.clip(ext_len - rc_start, 0, R)
        o, ol, state = step(params, jnp.concatenate([utt, rc], axis=1),
                            state, jnp.asarray(utt_len),
                            jnp.asarray(rc_len))
        np.testing.assert_array_equal(np.asarray(ol), utt_len)
        outs.append(o)
    return jnp.concatenate(outs, axis=1)


def test_streaming_equals_full(small):
    """Chunkwise infer reproduces the full-utterance forward exactly,
    including ragged lengths and a non-segment-multiple T."""
    enc, params = small
    rng = np.random.default_rng(1)
    B, T, R = 3, 11, enc.R
    lengths = np.array([11, 11, 6])
    x = rng.standard_normal((B, T + R, 16)).astype(np.float32)
    for b, l in enumerate(lengths):          # zero-pad ragged samples
        if l < T:
            x[b, l:] = 0.0
    y_full, _ = enc.apply(params, jnp.asarray(x), jnp.asarray(lengths))
    y_str = _stream(enc, params, jnp.asarray(x), lengths, T)
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(y_str[b, :l]),
                                   np.asarray(y_full[b, :l]),
                                   atol=2e-5, err_msg=f"sample {b}")


def test_streaming_equals_full_jit(small):
    enc, params = small
    rng = np.random.default_rng(2)
    T, R = 8, enc.R
    x = rng.standard_normal((1, T + R, 16)).astype(np.float32)
    y_full, _ = enc.apply(params, jnp.asarray(x))
    y_str = _stream(enc, params, jnp.asarray(x), np.array([T]), T,
                    jit=True)
    np.testing.assert_allclose(np.asarray(y_str[:, :T]),
                               np.asarray(y_full), atol=2e-5)


def test_block_causality(small):
    """Changing segment k leaves segments ≤ k-2 unchanged (R < S ⇒
    only the immediately preceding segment can see into k)."""
    enc, params = small
    rng = np.random.default_rng(3)
    T, R, S = 16, enc.R, enc.S
    x = rng.standard_normal((1, T + R, 16)).astype(np.float32)
    y1, _ = enc.apply(params, jnp.asarray(x))
    x2 = x.copy()
    x2[0, 3 * S:4 * S] = rng.standard_normal((S, 16))  # segment k=3
    y2, _ = enc.apply(params, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y1[0, :2 * S]),
                               np.asarray(y2[0, :2 * S]), atol=1e-6)
    assert np.abs(np.asarray(y1[0, 3 * S:] - y2[0, 3 * S:])).max() > 1e-3


def test_memory_reaches_past_left_context(small):
    """With a memory bank, frames beyond L+S of history still influence
    the present; without one they cannot."""
    rng = np.random.default_rng(4)
    T = 16
    x = rng.standard_normal((1, T + 2, 16)).astype(np.float32)
    x2 = x.copy()
    x2[0, :4] = rng.standard_normal((4, 16))  # segment 0
    for M, expect in [(2, True), (0, False)]:
        enc = Emformer(16, 2, 32, 2, segment_length=4,
                       left_context_length=2, right_context_length=2,
                       max_memory_size=M)
        params = enc.init(jax.random.PRNGKey(0))
        ya, _ = enc.apply(params, jnp.asarray(x))
        yb, _ = enc.apply(params, jnp.asarray(x2))
        # segment 3 (frames 12..15): distance to segment 0 > L + S
        diff = np.abs(np.asarray(ya[0, 12:] - yb[0, 12:])).max()
        assert (diff > 1e-5) == expect, (M, diff)


def test_padding_invariance(small):
    enc, params = small
    rng = np.random.default_rng(5)
    T, R = 12, enc.R
    x = rng.standard_normal((2, T + R, 16)).astype(np.float32)
    lengths = np.array([12, 7])
    x[1, 7:] = 0.0
    y, _ = enc.apply(params, jnp.asarray(x), jnp.asarray(lengths))
    x_solo = np.zeros((1, T + R, 16), np.float32)
    x_solo[0, :7] = x[1, :7]
    y_solo, _ = enc.apply(params, jnp.asarray(x_solo),
                          jnp.asarray([7]))
    np.testing.assert_allclose(np.asarray(y[1, :7]),
                               np.asarray(y_solo[0, :7]), atol=1e-5)
    assert np.abs(np.asarray(y[1, 7:])).max() == 0.0


def test_gradients_reach_every_leaf(small):
    enc, params = small
    x = jnp.asarray(np.random.default_rng(6)
                    .standard_normal((2, 10, 16)), jnp.float32)
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, x)[0] ** 2))(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    dead = [jax.tree_util.keystr(k) for k, v in flat
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, f"zero-gradient leaves: {dead}"


def test_validation_errors():
    with pytest.raises(ValueError):
        Emformer(15, 2, 32, 1, segment_length=4)
    enc = Emformer(16, 2, 32, 1, segment_length=4,
                   right_context_length=2)
    params = enc.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        enc.apply(params, jnp.ones((1, 10, 8)))
    with pytest.raises(ValueError):
        enc.infer(params, jnp.ones((1, 5, 16)), enc.init_state(1))


# ------------------------------------------------------ ConvEmformer
@pytest.fixture(scope="module")
def conv_small():
    from torchaudio_contrib_tpu.models.emformer import ConvEmformer
    enc = ConvEmformer(input_dim=16, num_heads=2, ffn_dim=32,
                       num_layers=2, segment_length=4,
                       kernel_size=3, left_context_length=3,
                       right_context_length=2, max_memory_size=2,
                       tanh_on_mem=True)
    params = enc.init(jax.random.PRNGKey(5))
    return enc, params


def test_conv_emformer_streaming_equals_full(conv_small):
    """The Emformer contract holds with the convolution module: the
    conv cache carries exactly the previous segment's post-attention
    tail, so chunkwise infer ≡ full apply (ragged + non-multiple T)."""
    enc, params = conv_small
    rng = np.random.default_rng(6)
    B, T, R = 3, 11, enc.R
    lengths = np.array([11, 11, 6])
    x = rng.standard_normal((B, T + R, 16)).astype(np.float32)
    for b, l in enumerate(lengths):
        if l < T:
            x[b, l:] = 0.0
    y_full, _ = enc.apply(params, jnp.asarray(x), jnp.asarray(lengths))
    y_str = _stream(enc, params, jnp.asarray(x), lengths, T)
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(y_str[b, :l]),
                                   np.asarray(y_full[b, :l]),
                                   atol=2e-5, err_msg=f"sample {b}")


def test_conv_emformer_streaming_equals_full_jit(conv_small):
    enc, params = conv_small
    rng = np.random.default_rng(7)
    T, R = 8, enc.R
    x = rng.standard_normal((1, T + R, 16)).astype(np.float32)
    y_full, _ = enc.apply(params, jnp.asarray(x))
    y_str = _stream(enc, params, jnp.asarray(x), np.array([T]), T,
                    jit=True)
    np.testing.assert_allclose(np.asarray(y_str[:, :T]),
                               np.asarray(y_full), atol=2e-5)


def test_conv_emformer_grads_and_conv_matters(conv_small):
    enc, params = conv_small
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 8 + enc.R, 16)),
                    jnp.float32)
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, x)[0] ** 2))(params)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead
    # zeroing the conv depthwise kernel changes the output
    import copy
    p2 = jax.tree_util.tree_map(lambda v: v, params)
    for lp in p2["layers"]:
        lp["conv"]["dw"] = jnp.zeros_like(lp["conv"]["dw"])
    y1, _ = enc.apply(params, x)
    y2, _ = enc.apply(p2, x)
    assert float(jnp.max(jnp.abs(y1 - y2))) > 1e-4
    from torchaudio_contrib_tpu.models.emformer import ConvEmformer
    with pytest.raises(ValueError, match="kernel_size"):
        ConvEmformer(16, 2, 32, 1, 4, kernel_size=0)
