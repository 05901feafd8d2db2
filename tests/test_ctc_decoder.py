"""Lexicon+LM CTC beam decoder (`models/decoder.py`): ARPA backoff
scores vs hand computation, lexicon constraint, LM steering, n-best,
timesteps, file loading."""
import math

import numpy as np
import pytest

from torchaudio_contrib_tpu.models.decoder import (
    ARPALM, ZeroLM, ctc_decoder,
)

# alphabet: blank, sil, a, b, c
TOKENS = ["-", "|", "a", "b", "c"]
LEXICON = {"ab": ["a", "b"], "ba": ["b", "a"], "a": ["a"],
           "abc": ["a", "b", "c"]}


def _emit(seq, n_classes=5, hi=0.0, lo=-12.0):
    """Log-prob lattice strongly favoring the given token indices."""
    lp = np.full((len(seq), n_classes), lo)
    for t, c in enumerate(seq):
        lp[t, c] = hi
    return lp - np.logaddexp.reduce(lp, axis=1, keepdims=True)


ARPA = [
    "\\data\\",
    "ngram 1=6",
    "ngram 2=2",
    "",
    "\\1-grams:",
    "-0.30103\t<s>\t-0.30103",
    "-0.69897\t</s>",
    "-0.52288\tab\t-0.30103",
    "-1.00000\tba\t-0.15490",
    "-0.39794\ta\t-0.22185",
    "-1.30103\t<unk>",
    "",
    "\\2-grams:",
    "-0.17609\t<s> ab",
    "-0.09691\tab a",
    "",
    "\\end\\",
]


def test_arpa_scores_match_hand_computation():
    lm = ARPALM(ARPA)
    assert lm.order == 2
    st = lm.start()
    assert st == ("<s>",)
    # bigram hit
    st1, s = lm.score(st, "ab")
    np.testing.assert_allclose(s, -0.17609, atol=1e-6)
    assert st1 == ("ab",)
    # backoff: ("ab","ba") missing -> backoff("ab") + unigram("ba")
    _, s2 = lm.score(st1, "ba")
    np.testing.assert_allclose(s2, -0.30103 + -1.0, atol=1e-6)
    # OOV maps to <unk> with the context backoff applied
    _, s3 = lm.score(st1, "zzz")
    np.testing.assert_allclose(s3, -0.30103 + -1.30103, atol=1e-6)
    # finish scores </s> through backoff from state ("ab",)
    np.testing.assert_allclose(lm.finish(st1),
                               -0.30103 + -0.69897, atol=1e-6)


def test_arpa_requires_ngrams():
    with pytest.raises(ValueError, match="no n-grams"):
        ARPALM(["\\data\\", "\\end\\"])


def test_lexicon_decode_clean_path():
    dec = ctc_decoder(LEXICON, TOKENS, beam_size=10)
    # a a - b b | : one word "ab"
    lp = _emit([2, 2, 0, 3, 3, 1])
    out = dec(lp)
    assert len(out) == 1 and out[0][0].words == ["ab"]
    hyp = out[0][0]
    assert dec.idxs_to_tokens(hyp.tokens) == ["a", "b", "|"]
    assert hyp.timesteps == sorted(hyp.timesteps)
    # batch + lengths: second row truncated to the same content
    batch = np.stack([lp, np.roll(lp, 0, 0)])
    out2 = dec(batch, lengths=[6, 6])
    assert [o[0].words for o in out2] == [["ab"], ["ab"]]


def test_lexicon_constraint_snaps_to_vocabulary():
    dec = ctc_decoder(LEXICON, TOKENS, beam_size=16)
    # emissions favor "c a |" — not a lexicon word ("c" never starts
    # one), so the decoder must pick an in-vocabulary reading
    lp = _emit([4, 2, 1], hi=0.0, lo=-2.0)
    out = dec(lp)[0]
    assert out, "no hypothesis survived"
    assert all(w in LEXICON for w in out[0].words)


def test_word_final_flush_without_trailing_sil():
    dec = ctc_decoder(LEXICON, TOKENS, beam_size=10)
    lp = _emit([2, 3])                       # "a b" then clip ends
    out = dec(lp)[0]
    assert out[0].words == ["ab"]


def test_lm_steers_homophones():
    # "ab" and "ba" both acoustically plausible; LM prefers "ab"
    lp = _emit([2, 3, 1], hi=0.0, lo=-1.0)   # weak preference for ab
    lm = ARPALM(ARPA)
    no_lm = ctc_decoder(LEXICON, TOKENS, beam_size=16, nbest=16)
    with_lm = ctc_decoder(LEXICON, TOKENS, lm=lm, lm_weight=4.0,
                          beam_size=16, nbest=16)
    base = no_lm(lp)[0]
    fused = with_lm(lp)[0]
    words = [h.words for h in fused]
    assert ["ab"] in words
    # the LM-fused score of "ab" beats "ba" by more than acoustically
    def sc(res, w):
        return max(h.score for h in res if h.words == [w])
    gap_ac = sc(base, "ab") - sc(base, "ba")
    gap_lm = sc(fused, "ab") - sc(fused, "ba")
    assert gap_lm > gap_ac + 1.0


def test_nbest_and_log_add():
    dec = ctc_decoder(LEXICON, TOKENS, beam_size=16, nbest=3,
                      log_add=True)
    lp = _emit([2, 3, 1], hi=0.0, lo=-1.5)
    out = dec(lp)[0]
    assert 1 < len(out) <= 3
    scores = [h.score for h in out]
    assert scores == sorted(scores, reverse=True)


def test_file_loading_and_validation(tmp_path):
    lex = tmp_path / "lexicon.txt"
    lex.write_text("ab a b\nba b a\n")
    toks = tmp_path / "tokens.txt"
    toks.write_text("\n".join(TOKENS))
    dec = ctc_decoder(str(lex), str(toks))
    assert dec(_emit([2, 3, 1]))[0][0].words == ["ab"]
    with pytest.raises(ValueError, match="blank"):
        ctc_decoder(LEXICON, ["x", "|"])
    with pytest.raises(ValueError, match="sil"):
        ctc_decoder(LEXICON, ["-", "a"])
    with pytest.raises(ValueError, match="not in"):
        ctc_decoder({"q": ["q"]}, TOKENS)
    with pytest.raises(ValueError, match="empty lexicon"):
        ctc_decoder({}, TOKENS)
    with pytest.raises(ValueError, match="batch"):
        dec(np.zeros((2, 2, 2, 2)))


def test_greedy_agreement_on_unambiguous_lattice():
    """With a saturated lattice and ZeroLM the beam decode equals the
    obvious transcription."""
    dec = ctc_decoder(LEXICON, TOKENS, lm=ZeroLM(), beam_size=8)
    lp = _emit([2, 0, 3, 4, 1, 3, 2, 1])     # "abc | ba |"
    out = dec(lp)[0][0]
    assert out.words == ["abc", "ba"]
    assert out.timesteps[0] == 0


def test_final_flush_expands_all_homophones():
    """When emissions end mid-word (no trailing sil), every word
    completing at the trie node must be hypothesized — the LM can
    prefer a homophone that is not the first lexicon entry."""
    tokens = ["-", "|", "r", "e", "d"]
    lexicon = {"red": ["r", "e", "d"], "read": ["r", "e", "d"]}
    arpa = ["\\data\\", "ngram 1=3", "", "\\1-grams:",
            "-3.0\tred", "-0.1\tread", "-1.0\t<unk>", "", "\\end\\"]
    lm = ARPALM(arpa)
    dec = ctc_decoder(lexicon, tokens, lm=lm, lm_weight=2.0,
                      nbest=4, beam_size=8)
    lp = _emit([2, 3, 4], n_classes=5)       # r e d, no trailing |
    out = dec(lp)[0]
    words = [h.words for h in out]
    assert ["read"] in words and ["red"] in words
    assert out[0].words == ["read"]          # LM-preferred homophone


def test_arpa_gzip_loading(tmp_path):
    import gzip
    p = str(tmp_path / "lm.arpa.gz")
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(ARPA))
    lm = ARPALM(p)
    assert lm.order == 2
    _, s = lm.score(lm.start(), "ab")
    np.testing.assert_allclose(s, -0.17609, atol=1e-6)


def test_sil_token_none_for_wordpiece_alphabets():
    """Alphabets without a silence token (boundaries live in the
    lexicon spellings) construct with sil_token=None and decode via
    word-final flush — previously the factory raised even though the
    docstring promised the configuration."""
    tokens = ["-", "a", "b", "c"]           # no "|"
    lex = {"ab": ["a", "b"], "a": ["a"]}
    dec = ctc_decoder(lex, tokens, beam_size=10, sil_token=None)
    lp = _emit([1, 1, 0, 2, 2], n_classes=4)  # a a - b b -> "ab"
    out = dec(lp)
    assert out[0][0].words == ["ab"]
    # a present-but-missing sil token still raises loudly
    with pytest.raises(ValueError, match="sil token"):
        ctc_decoder(lex, tokens, sil_token="|")
