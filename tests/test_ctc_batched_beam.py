"""Fully-jitted batched CTC prefix beam search (`ops.ctc_beam_decode`):
exact set/score equivalence to the host float64 beam
(`ctc_prefix_beam_search`, itself pinned against exhaustive
enumeration), padded-batch invariance, wide-beam -inf filler safety,
merge correctness on repeat-heavy lattices, and the one-dispatch
contract (the whole batch decodes in one compiled scan)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.ops import (ctc_beam_decode,
                                        ctc_prefix_beam_search)


def _lattice(b, t, v, seed=0, peaky=1.0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, v)) * peaky
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return jnp.asarray(lp, jnp.float32)


def _host(lp, K, blank=0, lengths=None):
    out = []
    for i in range(lp.shape[0]):
        n = None if lengths is None else int(lengths[i])
        hyps = ctc_prefix_beam_search(
            np.asarray(lp[i]), beam_width=K, blank=blank, nbest=K,
            input_length=n)
        out.append([(tuple(h.tokens), h.score) for h in hyps])
    return out


def _device(lp, K, blank=0, lengths=None):
    toks, lens, scores = ctc_beam_decode(
        lp, input_lengths=lengths, beam_width=K, blank=blank)
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    out = []
    for i in range(toks.shape[0]):
        out.append([(tuple(int(x) for x in toks[i, k, :lens[i, k]]),
                     float(scores[i, k]))
                    for k in range(K) if np.isfinite(scores[i, k])])
    return out


def _assert_same(host, dev, atol=2e-4):
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        # identical hypothesis SETS; scores equal; equal-score
        # neighbors may swap order between fp64 and fp32 sorts
        assert dict(hb).keys() == dict(db).keys(), (hb, db)
        hs, ds = dict(hb), dict(db)
        for k in hs:
            np.testing.assert_allclose(hs[k], ds[k], atol=atol, rtol=0)


def test_matches_host_beam():
    lp = _lattice(3, 9, 5, seed=1)
    _assert_same(_host(lp, 4), _device(lp, 4))


def test_matches_host_beam_repeats():
    """Peaky lattice dominated by one repeated symbol: exercises the
    repeat/blank split and the extend-into-existing-prefix merge."""
    lp = np.full((1, 8, 3), -4.0)
    lp[0, :, 1] = -0.1          # symbol 1 dominates every frame
    lp[0, 3, 0] = -0.1          # one blank-favored frame in the middle
    lp = jnp.asarray(lp - np.log(np.exp(lp).sum(-1, keepdims=True)),
                     jnp.float32)
    _assert_same(_host(lp, 6), _device(lp, 6))


def test_wide_beam_filler_slots():
    """beam_width > reachable distinct prefixes early on: -inf filler
    slots (structural twins) must never duplicate or corrupt mass."""
    lp = _lattice(2, 6, 3, seed=2)
    _assert_same(_host(lp, 12), _device(lp, 12))


def test_padded_lengths_invariance():
    lp = _lattice(2, 10, 5, seed=3)
    lengths = jnp.asarray([6, 10], jnp.int32)
    dev = _device(lp, 4, lengths=lengths)
    dev_cut = _device(lp[:1, :6], 4)
    assert dict(dev[0]).keys() == dict(dev_cut[0]).keys()
    for k, v in dict(dev_cut[0]).items():
        np.testing.assert_allclose(dict(dev[0])[k], v, atol=1e-5)
    _assert_same(_host(lp, 4, lengths=lengths), dev)


def test_nonzero_blank():
    lp = _lattice(2, 7, 4, seed=4)
    _assert_same(_host(lp, 4, blank=3), _device(lp, 4, blank=3))


def test_max_tokens_freeze():
    """Full token buffers stop extending but keep their mass."""
    lp = _lattice(1, 12, 4, seed=5)
    toks, lens, scores = ctc_beam_decode(lp, beam_width=4, max_tokens=2)
    assert int(np.max(np.asarray(lens))) <= 2
    assert np.isfinite(float(scores[0, 0]))
    assert np.all(np.asarray(toks)[np.asarray(lens)[..., None]
                                   <= np.arange(2)[None, None, :]] == -1)


def test_one_dispatch_and_jit_stability():
    lp = _lattice(2, 6, 4, seed=6)
    r1 = ctc_beam_decode(lp, beam_width=4)
    r2 = ctc_beam_decode(lp + 0.0, beam_width=4)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # scores are the log TOTAL sequence probability: top hypothesis
    # must dominate the greedy best-path score
    from torchaudio_contrib_tpu.ops import ctc_greedy_decode
    _, _, path_score = ctc_greedy_decode(lp)
    assert float(r1[2][0, 0]) >= float(path_score[0]) - 1e-4
