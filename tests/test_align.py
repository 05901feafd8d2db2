"""forced_align (`ops/align.py`) vs a float64 NumPy CTC-Viterbi oracle,
plus CTC-topology invariants, padded-batch masking, jit/vmap."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac


def _emissions(t, c, seed=0, peaked=None):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((t, c)).astype(np.float64)
    if peaked is not None:
        for i, k in enumerate(peaked):
            logits[i, k] += 6.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return lp


def _oracle(lp, tgt, blank=0):
    """Literal float64 CTC Viterbi with backtrace."""
    t_max, _ = lp.shape
    lab = [blank]
    for tok in tgt:
        lab += [tok, blank]
    s_max = len(lab)
    delta = np.full((t_max, s_max), -np.inf)
    bp = np.zeros((t_max, s_max), np.int64)
    delta[0, 0] = lp[0, lab[0]]
    if s_max > 1:
        delta[0, 1] = lp[0, lab[1]]
    for t in range(1, t_max):
        for s in range(s_max):
            cands = [delta[t - 1, s]]
            if s >= 1:
                cands.append(delta[t - 1, s - 1])
            else:
                cands.append(-np.inf)
            if (s >= 2 and lab[s] != blank and lab[s] != lab[s - 2]):
                cands.append(delta[t - 1, s - 2])
            else:
                cands.append(-np.inf)
            k = int(np.argmax(cands))
            bp[t, s] = k
            delta[t, s] = cands[k] + lp[t, lab[s]]
    ends = [s_max - 1, max(s_max - 2, 0)]
    s = ends[int(np.argmax([delta[-1, e] for e in ends]))]
    path = []
    for t in range(t_max - 1, -1, -1):
        path.append(lab[s])
        if t >= 1:
            s -= bp[t, s]
    return np.array(path[::-1]), delta


def test_matches_oracle_random_emissions():
    for seed in range(4):
        lp = _emissions(20, 5, seed)
        tgt = np.array([1, 2, 2, 3])
        got_a, got_s = tac.forced_align(
            jnp.asarray(lp, jnp.float32)[None],
            jnp.asarray(tgt)[None])
        ref_a, _ = _oracle(lp, tgt)
        np.testing.assert_array_equal(np.asarray(got_a)[0], ref_a,
                                      err_msg=f"seed {seed}")
        # scores are the emission log-probs of the aligned labels
        exp_s = lp[np.arange(20), ref_a]
        np.testing.assert_allclose(np.asarray(got_s)[0], exp_s,
                                   atol=1e-4)


def test_peaked_emissions_recover_transcript():
    """Emissions peaked on a valid blank-expanded path align exactly."""
    frames = [0, 1, 1, 0, 2, 2, 0, 0, 3, 0]
    lp = _emissions(10, 5, 1, peaked=frames)
    tgt = np.array([1, 2, 3])
    a, _ = tac.forced_align(jnp.asarray(lp, jnp.float32)[None],
                            jnp.asarray(tgt)[None])
    a = np.asarray(a)[0]
    # collapsing the alignment recovers the transcript
    collapsed = [x for i, x in enumerate(a)
                 if x != 0 and (i == 0 or x != a[i - 1])]
    assert collapsed == [1, 2, 3]
    np.testing.assert_array_equal(a, frames)


def test_alignment_is_valid_ctc_path():
    rng = np.random.default_rng(3)
    lp = _emissions(30, 6, 4)
    tgt = np.array([2, 5, 1, 1, 4])
    a, _ = tac.forced_align(jnp.asarray(lp, jnp.float32)[None],
                            jnp.asarray(tgt)[None])
    a = np.asarray(a)[0]
    collapsed = []
    prev = None
    for i, x in enumerate(a):
        if x != 0 and (x != prev):
            collapsed.append(int(x))
        prev = x if x != 0 else None
    # repeated target tokens must be separated by blanks and preserved
    assert collapsed == [2, 5, 1, 1, 4]


def test_padded_batch_masks_lengths():
    lp1 = _emissions(15, 5, 5)
    lp2 = _emissions(10, 5, 6)
    tgt1, tgt2 = np.array([1, 2, 3]), np.array([4, 2])
    # pad to common shapes
    lp = np.stack([lp1, np.pad(lp2, ((0, 5), (0, 0)))])
    tgt = np.stack([tgt1, np.pad(tgt2, (0, 1))])
    a, s = tac.forced_align(jnp.asarray(lp, jnp.float32),
                            jnp.asarray(tgt),
                            input_lengths=jnp.asarray([15, 10]),
                            target_lengths=jnp.asarray([3, 2]))
    a1, _ = tac.forced_align(jnp.asarray(lp1, jnp.float32)[None],
                             jnp.asarray(tgt1)[None])
    a2, _ = tac.forced_align(jnp.asarray(lp2, jnp.float32)[None],
                             jnp.asarray(tgt2)[None])
    np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(a1)[0])
    np.testing.assert_array_equal(np.asarray(a)[1, :10],
                                  np.asarray(a2)[0])
    # padded frames are blank with zero score
    assert (np.asarray(a)[1, 10:] == 0).all()
    assert (np.asarray(s)[1, 10:] == 0).all()


def test_jit_and_empty_target():
    lp = _emissions(8, 4, 7)
    a, s = jax.jit(tac.forced_align)(
        jnp.asarray(lp, jnp.float32)[None],
        jnp.zeros((1, 0), jnp.int32))
    assert (np.asarray(a) == 0).all()          # all-blank path
    with pytest.raises(ValueError):
        tac.forced_align(jnp.zeros((3, 4)), jnp.zeros((1, 2),
                                                      jnp.int32))
