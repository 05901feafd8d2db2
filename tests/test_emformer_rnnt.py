"""Streaming Emformer-RNNT composition: chunkwise
``stream_greedy_step`` / ``RNNTBeamSearch.infer`` must reproduce the
full-utterance ``greedy_decode`` / ``__call__`` — the invariant that
makes the stack a streaming ASR system (torchaudio's
emformer_rnnt capability, rebuilt TPU-first)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models import RNNT, RNNTBeamSearch, Emformer


@pytest.fixture(scope="module")
def stack():
    enc = Emformer(input_dim=16, num_heads=2, ffn_dim=32, num_layers=2,
                   segment_length=4, left_context_length=3,
                   right_context_length=2, max_memory_size=2,
                   tanh_on_mem=True)
    model = RNNT(enc, num_symbols=5, encoding_dim=16, joiner_dim=16,
                 predictor_embed_dim=8, predictor_hidden_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    return enc, model, params


def _chunks(enc, x, lengths, T):
    """Split `x (B, T+R, D)` into Emformer infer chunks (the
    convention pinned in test_emformer.py)."""
    S, R = enc.S, enc.R
    nseg = -(-T // S)
    Tp = nseg * S
    # tail stays at stream position T; infer masks utt slots itself
    ext = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    lengths = np.asarray(lengths)
    ext_len = lengths + np.where(lengths == T, R, 0)
    for i in range(nseg):
        base = i * S
        rc_start = min(base + S, T)
        chunk = jnp.concatenate(
            [ext[:, base:base + S], ext[:, rc_start:rc_start + R]],
            axis=1)
        utt_len = np.clip(lengths - base, 0, S)
        rc_len = np.clip(ext_len - rc_start, 0, R)
        yield chunk, jnp.asarray(utt_len), jnp.asarray(rc_len)


def _ragged_input(enc, B, T, lengths, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T + enc.R, 16)).astype(np.float32)
    for b, l in enumerate(lengths):
        if l < T:
            x[b, l:] = 0.0
    return jnp.asarray(x)


def test_stream_greedy_equals_full(stack):
    """Chunkwise greedy emission grid == one-shot grid, ragged batch,
    non-segment-multiple T."""
    enc, model, params = stack
    B, T = 3, 11
    lengths = np.array([11, 11, 6])
    x = _ragged_input(enc, B, T, lengths, seed=1)
    full = model.greedy_decode(params, x, jnp.asarray(lengths),
                               compact=False)        # (B, Tp>=T, K)
    state = model.init_stream_state(params, B)
    grids = []
    for chunk, ul, rl in _chunks(enc, x, lengths, T):
        g, ol, state = model.stream_greedy_step(
            params, chunk, state, utt_lengths=ul, rc_lengths=rl)
        np.testing.assert_array_equal(np.asarray(ol), np.asarray(ul))
        grids.append(np.asarray(g))
    streamed = np.concatenate(grids, axis=1)
    np.testing.assert_array_equal(streamed[:, :T],
                                  np.asarray(full)[:, :T])


def test_stream_greedy_tokens_roundtrip(stack):
    """Compact token lists recovered from the streamed grid match
    greedy_decode's."""
    enc, model, params = stack
    B, T = 2, 8
    lengths = np.array([8, 8])
    x = _ragged_input(enc, B, T, lengths, seed=2)
    want = model.greedy_decode(params, x)
    state = model.init_stream_state(params, B)
    toks = [[] for _ in range(B)]
    for chunk, ul, rl in _chunks(enc, x, lengths, T):
        g, _, state = model.stream_greedy_step(
            params, chunk, state, utt_lengths=ul, rc_lengths=rl)
        for b, row in enumerate(np.asarray(g)):
            toks[b] += [int(t) for t in row.reshape(-1)
                        if t != model.blank]
    assert toks == want


def test_stream_beam_equals_full(stack):
    """Chunkwise RNNTBeamSearch.infer == one-shot __call__: same
    hypotheses, same scores (identical host arithmetic on identical
    features)."""
    enc, model, params = stack
    B, T = 2, 8
    lengths = np.array([8, 5])
    x = _ragged_input(enc, B, T, lengths, seed=3)
    search = RNNTBeamSearch(model, beam_width=4, max_symbols=2)
    want = search(params, x, jnp.asarray(lengths))
    states = search.init_state(params, B)
    enc_state = model.init_stream_state(params, B)["enc"]
    got = None
    for chunk, ul, rl in _chunks(enc, x, lengths, T):
        feats, ol, enc_state = model.stream_transcribe(
            params, chunk, enc_state, utt_lengths=ul, rc_lengths=rl)
        got, states = search.infer(params, feats, ol, states)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert [t for t, _ in g] == [t for t, _ in w]
        np.testing.assert_allclose([s for _, s in g],
                                   [s for _, s in w], rtol=0,
                                   atol=1e-6)


def test_init_stream_state_requires_streaming_transcriber(stack):
    _, _, params = stack

    class NoStream:
        def init(self, key):
            return {}

        def apply(self, params, x, lengths=None):
            return x

    model = RNNT(NoStream(), num_symbols=5, encoding_dim=16)
    with pytest.raises(TypeError, match="init_state"):
        model.init_stream_state(params, 2)


def test_trainable_end_to_end(stack):
    """rnnt_loss through the Emformer transcriber: grads reach every
    leaf (the training path of the streaming stack)."""
    import torchaudio_contrib_tpu as tac
    enc, model, params = stack
    B, T = 2, 8
    x = _ragged_input(enc, B, T, np.array([8, 8]), seed=4)
    targets = jnp.asarray([[1, 2], [3, 4]], jnp.int32)

    def loss_fn(p):
        logits, out_lengths = model.joint_logits(p, x, targets)
        return tac.rnnt_loss(logits, targets, out_lengths, blank=0)

    g = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
    dead = sum(bool(np.allclose(np.asarray(leaf), 0.0))
               for leaf in flat)
    assert dead == 0, f"{dead} dead leaves"
