"""edit_distance / edit_distance_batched (`ops/edit.py`) vs a literal
O(n*m) Python DP oracle, plus merge_tokens span semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac


def _oracle(a, b):
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return d[n][m]


def test_edit_distance_random_vs_oracle():
    rng = np.random.default_rng(0)
    for _ in range(30):
        n, m = rng.integers(0, 12, 2)
        a = rng.integers(0, 5, n).tolist()
        b = rng.integers(0, 5, m).tolist()
        assert tac.edit_distance(a, b) == _oracle(a, b), (a, b)


def test_edit_distance_known_cases():
    assert tac.edit_distance("kitten", "sitting") == 3
    assert tac.edit_distance([], [1, 2]) == 2
    assert tac.edit_distance([1, 2, 3], []) == 3
    assert tac.edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert tac.edit_distance("hello world".split(),
                             "hello there world".split()) == 1


def test_batched_matches_host_and_jits():
    rng = np.random.default_rng(1)
    refs, hyps, rl, hl = [], [], [], []
    for _ in range(8):
        n, m = rng.integers(1, 10, 2)
        refs.append(rng.integers(0, 6, n))
        hyps.append(rng.integers(0, 6, m))
        rl.append(n)
        hl.append(m)
    pad = lambda xs, L: np.stack([np.pad(x, (0, L - len(x))) for x in xs])
    out = jax.jit(tac.edit_distance_batched)(
        jnp.asarray(pad(refs, 10)), jnp.asarray(pad(hyps, 10)),
        jnp.asarray(rl), jnp.asarray(hl))
    for k in range(8):
        assert int(out[k]) == _oracle(refs[k].tolist(), hyps[k].tolist())


def test_batched_zero_lengths_and_validation():
    out = tac.edit_distance_batched(
        jnp.zeros((2, 4), jnp.int32), jnp.ones((2, 3), jnp.int32),
        ref_lengths=jnp.asarray([0, 4]), hyp_lengths=jnp.asarray([3, 0]))
    assert out.tolist() == [3, 4]
    with pytest.raises(ValueError):
        tac.edit_distance_batched(jnp.zeros((4,), jnp.int32),
                                  jnp.zeros((2, 3), jnp.int32))


def test_merge_tokens_spans():
    tokens = np.array([0, 1, 1, 0, 2, 0, 0, 3, 3, 3, 0])
    scores = np.arange(11, dtype=np.float32)
    spans = tac.merge_tokens(tokens, scores)
    assert [(s.token, s.start, s.end) for s in spans] == [
        (1, 1, 3), (2, 4, 5), (3, 7, 10)]
    np.testing.assert_allclose(spans[0].score, (1 + 2) / 2)
    np.testing.assert_allclose(spans[2].score, (7 + 8 + 9) / 3)
    assert len(spans[2]) == 3


def test_merge_tokens_from_forced_align():
    """End-to-end: align peaked emissions, merge, recover transcript."""
    rng = np.random.default_rng(2)
    frames = [0, 1, 1, 0, 2, 2, 2, 0, 3, 0]
    logits = rng.standard_normal((10, 5))
    for i, k in enumerate(frames):
        logits[i, k] += 6.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    a, s = tac.forced_align(jnp.asarray(lp, jnp.float32)[None],
                            jnp.asarray([[1, 2, 3]], jnp.int32))
    spans = tac.merge_tokens(np.asarray(a)[0], np.asarray(s)[0])
    assert [sp.token for sp in spans] == [1, 2, 3]
    assert spans[1] == tac.TokenSpan(2, 4, 7, 0.0)  # eq ignores score
    # adjacent equal tokens split by a blank stay separate spans
    tokens = np.array([1, 0, 1])
    spans = tac.merge_tokens(tokens, np.zeros(3))
    assert [(sp.start, sp.end) for sp in spans] == [(0, 1), (2, 3)]
    with pytest.raises(ValueError):
        tac.merge_tokens(np.zeros((2, 3)), np.zeros((2, 3)))
