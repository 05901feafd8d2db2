"""ctc_greedy_decode / ctc_prefix_beam_search (`ops/ctcdecode.py`) vs
literal oracles: python collapse for greedy; EXHAUSTIVE alignment-path
enumeration for the beam posterior."""
import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac


def _lp(t, c, seed):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((t, c))
    return z - np.log(np.exp(z).sum(-1, keepdims=True))


def _collapse(path, blank=0):
    out, prev = [], None
    for p in path:
        if p != blank and p != prev:
            out.append(int(p))
        prev = p
    return out


def test_greedy_matches_collapse_oracle():
    for seed in range(6):
        lp = _lp(15, 5, seed)
        toks, lens, scores = tac.ctc_greedy_decode(
            jnp.asarray(lp, jnp.float32)[None])
        path = lp.argmax(-1)
        exp = _collapse(path)
        n = int(lens[0])
        assert np.asarray(toks)[0, :n].tolist() == exp
        assert (np.asarray(toks)[0, n:] == -1).all()
        np.testing.assert_allclose(float(scores[0]),
                                   lp.max(-1).sum(), rtol=1e-5)


def test_greedy_lengths_batch_jit():
    lp1, lp2 = _lp(12, 4, 10), _lp(8, 4, 11)
    batch = np.stack([lp1, np.pad(lp2, ((0, 4), (0, 0)))])
    toks, lens, _ = jax.jit(tac.ctc_greedy_decode)(
        jnp.asarray(batch, jnp.float32),
        input_lengths=jnp.asarray([12, 8]))
    exp2 = _collapse(lp2.argmax(-1))
    assert np.asarray(toks)[1, :int(lens[1])].tolist() == exp2
    with pytest.raises(ValueError):
        tac.ctc_greedy_decode(jnp.zeros((3, 4)))


def _exhaustive_posteriors(lp, blank=0):
    """Total probability of every label sequence by enumerating ALL
    C^T alignment paths (tiny lattices only)."""
    t_max, c = lp.shape
    post = {}
    for path in itertools.product(range(c), repeat=t_max):
        seq = tuple(_collapse(path, blank))
        logp = sum(lp[t, k] for t, k in enumerate(path))
        post[seq] = np.logaddexp(post.get(seq, -np.inf), logp)
    return post


def test_beam_search_exact_on_tiny_lattice():
    for seed in range(4):
        lp = _lp(4, 3, 20 + seed)
        post = _exhaustive_posteriors(lp)
        ranked = sorted(post.items(), key=lambda kv: -kv[1])
        hyps = tac.ctc_prefix_beam_search(
            jnp.asarray(lp, jnp.float32), beam_width=200, nbest=3)
        # wide beam = exact posterior for the top sequences
        for h, (seq, score) in zip(hyps, ranked[:3]):
            assert tuple(h.tokens) == seq, seed
            np.testing.assert_allclose(h.score, score, atol=1e-4)


def test_beam_search_narrow_still_reasonable():
    lp = _lp(6, 4, 30)
    best_wide = tac.ctc_prefix_beam_search(lp, beam_width=500)[0]
    best_narrow = tac.ctc_prefix_beam_search(lp, beam_width=8)[0]
    # narrow beam may miss, but never outranks the exact best
    assert best_narrow.score <= best_wide.score + 1e-9
    assert isinstance(repr(best_wide), str)


def test_beam_search_repeat_merging():
    """Peaked '1 1' with blank between: beam must separate repeats."""
    frames = [1, 0, 1]
    z = np.full((3, 3), -8.0)
    for i, k in enumerate(frames):
        z[i, k] = 0.0
    lp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    best = tac.ctc_prefix_beam_search(lp, beam_width=50)[0]
    assert best.tokens == [1, 1]
    # input_length truncation: only the first frame → single '1'
    best1 = tac.ctc_prefix_beam_search(lp, beam_width=50,
                                       input_length=1)[0]
    assert best1.tokens == [1]
    with pytest.raises(ValueError):
        tac.ctc_prefix_beam_search(np.zeros((2, 3, 4)))


def test_greedy_matches_beam_on_peaked():
    frames = [0, 2, 2, 0, 1, 0, 3, 3]
    z = np.full((8, 4), -9.0)
    for i, k in enumerate(frames):
        z[i, k] = 0.0
    lp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    toks, lens, _ = tac.ctc_greedy_decode(jnp.asarray(lp, jnp.float32)[None])
    beam = tac.ctc_prefix_beam_search(lp, beam_width=50)[0]
    assert np.asarray(toks)[0, :int(lens[0])].tolist() == beam.tokens \
        == [2, 1, 3]
