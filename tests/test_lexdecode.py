"""Device lexicon beam (`ops/lexdecode.py`) ≡ the host
``models/decoder.py::CTCDecoder`` (``log_add=False``,
``beam_threshold=inf``): words, tokens, timesteps and max-merged
scores, with ZeroLM and a bigram ARPA LM, sil and sil-less lexicons,
batches with ragged lengths."""
import math

import numpy as np
import pytest

from torchaudio_contrib_tpu.models.decoder import (ARPALM, ZeroLM,
                                                   ctc_decoder)
from torchaudio_contrib_tpu.ops import (compile_lexicon_tables,
                                        ctc_lexicon_beam_decode,
                                        device_ctc_decoder)

TOKENS = ["-", "|", "a", "b", "c", "d"]
LEXICON = [
    "ab a b", "ba b a", "cad c a d", "dab d a b", "ad a d",
    "abc a b c", "cab c a b", "bad b a d",
]
ARPA = """\\data\\
ngram 1=7
ngram 2=6

\\1-grams:
-0.5\t<s>\t-0.30
-0.9\t</s>
-0.4\tab\t-0.20
-0.6\tba\t-0.25
-0.7\tcad\t-0.10
-0.8\tdab\t-0.15
-0.65\tad\t-0.22

\\2-grams:
-0.20\t<s> ab
-0.30\tab ba
-0.50\tba cad
-0.40\tcad </s>
-0.35\tab ad
-0.45\tad </s>

\\end\\
""".splitlines()


def _host(lm=None, **kw):
    kw.setdefault("beam_size", 8)
    kw.setdefault("nbest", 4)
    return ctc_decoder(LEXICON, TOKENS, lm=lm,
                       beam_threshold=math.inf, **kw)


def _emissions(rng, B, T, scale=1.0):
    lp = rng.standard_normal((B, T, len(TOKENS))) * scale
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp.astype(np.float32)


def _assert_matches(host_out, dev_out, tol=2e-3):
    """Every device hypothesis must appear in the host n-best with a
    close score; the top-1 must agree exactly on words/tokens."""
    for hb, db in zip(host_out, dev_out):
        assert db, "device produced no hypotheses"
        assert tuple(db[0].words) == tuple(hb[0].words), \
            (db[0].words, hb[0].words)
        assert db[0].tokens == hb[0].tokens
        assert db[0].timesteps == hb[0].timesteps
        assert abs(db[0].score - hb[0].score) < tol, \
            (db[0].score, hb[0].score)
        host_keys = {(tuple(h.words), tuple(h.tokens)): h.score
                     for h in hb}
        for h in db:
            key = (tuple(h.words), tuple(h.tokens))
            assert key in host_keys, key
            assert abs(h.score - host_keys[key]) < tol


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host_zerolm(seed):
    rng = np.random.default_rng(seed)
    lp = _emissions(rng, 2, 18)
    host = _host(word_score=-0.3, sil_score=0.1)
    dev = device_ctc_decoder(host)
    _assert_matches(host(lp), dev(lp))


@pytest.mark.parametrize("seed", [3, 4])
def test_device_matches_host_bigram_lm(seed):
    rng = np.random.default_rng(seed)
    lp = _emissions(rng, 2, 16)
    lm = ARPALM(ARPA)
    assert lm.order == 2
    host = _host(lm=lm, lm_weight=1.7, word_score=0.2)
    dev = device_ctc_decoder(host)
    _assert_matches(host(lp), dev(lp))


def test_device_matches_host_ragged_lengths():
    rng = np.random.default_rng(7)
    lp = _emissions(rng, 3, 20)
    lengths = [20, 13, 6]
    host = _host()
    dev = device_ctc_decoder(host)
    _assert_matches(host(lp, lengths), dev(lp, lengths))


def test_device_sil_less_lexicon():
    """Wordpiece-style lexicon (sil_token=None): words complete only
    at the final flush."""
    rng = np.random.default_rng(11)
    lex = ["ab a b", "abc a b c", "cd c d", "da d a"]
    lp = _emissions(rng, 2, 10)
    host = ctc_decoder(lex, TOKENS, sil_token=None, beam_size=8,
                       nbest=4, beam_threshold=math.inf)
    dev = device_ctc_decoder(host)
    _assert_matches(host(lp), dev(lp))


def test_device_recovers_planted_sentence():
    """Emissions strongly biased to 'ab|cad|' must decode to the
    planted words with a bigram LM on device."""
    tok_idx = {t: i for i, t in enumerate(TOKENS)}
    path = "a b | c a d |"
    T = len(path.split())
    lp = np.full((1, T, len(TOKENS)), -8.0, np.float32)
    for t, sym in enumerate(path.split()):
        lp[0, t, tok_idx[sym]] = -0.05
    host = _host(lm=ARPALM(ARPA), lm_weight=0.5)
    dev = device_ctc_decoder(host)
    out = dev(lp)
    assert out[0][0].words == ["ab", "cad"], out[0][0]
    _assert_matches(host(lp), out)


def test_device_rejects_host_only_features():
    host = _host(log_add=True)
    with pytest.raises(NotImplementedError, match="log_add"):
        device_ctc_decoder(host)
    host = _host(unk_score=-5.0)
    with pytest.raises(NotImplementedError, match="unk"):
        device_ctc_decoder(host)
    arpa3 = [ln for ln in ARPA if ln != "\\end\\"] \
        + ["\\3-grams:", "-0.1\tab ba cad", "", "\\end\\"]
    lm3 = ARPALM(arpa3)
    assert lm3.order == 3
    host = _host(lm=lm3)
    with pytest.raises(NotImplementedError, match="order"):
        device_ctc_decoder(host)


def test_raw_api_shapes():
    rng = np.random.default_rng(5)
    lp = _emissions(rng, 2, 12)
    host = _host()
    compiled = compile_lexicon_tables(host)
    toks, times, lens, wids, wlens, scores = ctc_lexicon_beam_decode(
        lp, compiled, beam_width=8, blank=host.blank_idx,
        sil=host.sil_idx)
    assert toks.shape == (2, 8, 12) and scores.shape == (2, 8)
    assert np.all(np.asarray(lens) <= 12)
    best = np.asarray(scores)[:, 0]
    assert np.all(np.isfinite(best) | (best == -np.inf))
