"""Fully-jitted batched RNNT beam search
(`models/rnnt.py::RNNTBeamSearch.decode_batched`): exact equivalence
to the host beam (sequences AND logaddexp-merged scores), padded-batch
invariance, streaming-chunk equivalence, and the single-dispatch
contract (the whole decode is one compiled scan)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models import RNNT, RNNTBeamSearch

from test_rnnt_model import TinyTranscriber


@pytest.fixture(scope="module")
def small():
    model = RNNT(TinyTranscriber(8, 24), num_symbols=5,
                 encoding_dim=24, joiner_dim=16,
                 predictor_embed_dim=8, predictor_hidden_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _x(b=3, t=7, d=8, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal((b, t, d)), jnp.float32)


def _assert_same(host, dev, atol=1e-4):
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        # the device beam keeps exactly beam_width survivors; the
        # host list is the same set (same top-K pruning)
        assert len(hb) == len(db), (hb, db)
        for (ht, hs), (dt, ds) in zip(hb, db):
            assert ht == dt, (hb, db)
            np.testing.assert_allclose(hs, ds, atol=atol)


def test_batched_equals_host_beam(small):
    model, params = small
    search = RNNTBeamSearch(model, beam_width=4, max_symbols=2)
    x = _x()
    host = search(params, x)
    dev = search.decode_batched(params, x)
    _assert_same(host, dev)


def test_batched_equals_host_beam_wide(small):
    """Wider beam than distinct finite hypotheses early on: -inf
    padding slots must never displace or corrupt real hypotheses."""
    model, params = small
    search = RNNTBeamSearch(model, beam_width=8, max_symbols=3)
    x = _x(b=2, t=5, seed=3)
    _assert_same(search(params, x),
                 search.decode_batched(params, x))


def test_batched_padded_lengths(small):
    """Padded frames leave the carry untouched: decoding [T valid of
    T_pad] equals decoding the unpadded sample."""
    model, params = small
    search = RNNTBeamSearch(model, beam_width=4, max_symbols=2)
    x = _x(b=2, t=9, seed=5)
    lengths = jnp.asarray([9, 6])
    dev = search.decode_batched(params, x, lengths)
    solo = search.decode_batched(params, x[1:, :6])
    _assert_same([dev[1]], solo)
    host = search(params, x, lengths)
    _assert_same(host, dev)


def test_streaming_chunks_equal_full(small):
    """infer_batched over feature chunks == decode_batched one-shot
    (the carry IS the beam)."""
    model, params = small
    search = RNNTBeamSearch(model, beam_width=4, max_symbols=2)
    x = _x(b=2, t=8, seed=7)
    enc, out_lengths = model.transcribe(params, x)
    full = search.decode_batched(params, x)
    carry = search.init_batched_state(params, 2,
                                      max_tokens=8 * search.max_symbols)
    for lo in range(0, 8, 4):
        chunk = enc[:, lo:lo + 4]
        chunk_len = jnp.clip(out_lengths - lo, 0, 4)
        ranked, carry = search.infer_batched(params, chunk,
                                             chunk_len, carry)
    _assert_same(full, ranked)


def test_single_dispatch_contract(small):
    """The frame loop is one compiled function: re-running with the
    same shapes must not retrace."""
    model, params = small
    search = RNNTBeamSearch(model, beam_width=4, max_symbols=2)
    search.decode_batched(params, _x(seed=11))
    before = RNNTBeamSearch._run_batched._cache_size()
    search.decode_batched(params, _x(seed=12))
    assert RNNTBeamSearch._run_batched._cache_size() == before
