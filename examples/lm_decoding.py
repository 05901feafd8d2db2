"""Lexicon + n-gram LM CTC decoding, end to end on synthetic emissions.

Builds a tiny character lexicon and ARPA bigram LM, fabricates
acoustically ambiguous CTC emissions, and shows the LM steering the
beam toward the likelier homophone — the `models.decoder` workflow
(torchaudio's `models.decoder.ctc_decoder` equivalent).

Run: python examples/lm_decoding.py        (host-only, no TPU needed)
"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from torchaudio_contrib_tpu.models.decoder import (  # noqa: E402
    ARPALM, ctc_decoder)

TOKENS = ["-", "|", "a", "d", "e", "r", "t"]
LEXICON = {
    "tread": ["t", "r", "e", "a", "d"],
    "dread": ["d", "r", "e", "a", "d"],
    "tea": ["t", "e", "a"],
    "red": ["r", "e", "d"],
}
ARPA = [
    "\\data\\", "ngram 1=6", "ngram 2=3", "",
    "\\1-grams:",
    "-0.5\t<s>\t-0.3",
    "-0.8\t</s>",
    "-0.9\ttread\t-0.2",
    "-1.9\tdread\t-0.2",
    "-0.7\ttea\t-0.2",
    "-0.8\tred\t-0.2",
    "",
    "\\2-grams:",
    "-0.2\t<s> tread",
    "-1.6\t<s> dread",
    "-0.4\ttread red",
    "",
    "\\end\\",
]


def emissions(seq, favored=0.0, other=-2.3):
    idx = {s: i for i, s in enumerate(TOKENS)}
    lp = np.full((len(seq), len(TOKENS)), other)
    for t, s in enumerate(seq):
        lp[t, idx[s]] = favored
    return lp - np.logaddexp.reduce(lp, axis=1, keepdims=True)


def main():
    # 't' and 'd' nearly tied on the first frame: acoustics alone
    # barely prefer "dread"; the LM knows "tread" is far likelier.
    lp = emissions(["d", "r", "e", "a", "d", "|"])
    lp[0, TOKENS.index("t")] = lp[0, TOKENS.index("d")] - 0.1

    acoustic = ctc_decoder(LEXICON, TOKENS, nbest=2, beam_size=16)
    fused = ctc_decoder(LEXICON, TOKENS, lm=ARPALM(ARPA),
                        lm_weight=3.0, nbest=2, beam_size=16)

    hyps = fused(lp)[0]
    print("acoustic-only :", [h.words for h in acoustic(lp)[0]])
    print("with bigram LM:", [h.words for h in hyps])
    best = hyps[0]
    print(f"best: {best.words} score={best.score:.3f} "
          f"tokens={fused.idxs_to_tokens(best.tokens)} "
          f"timesteps={best.timesteps}")
    assert best.words == ["tread"]


if __name__ == "__main__":
    main()
