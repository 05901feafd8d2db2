"""Device lexicon CTC beam vs the host decoder (VERDICT r4 ask 4).

Same search (trie-constrained prefix beam, max-merge, optional bigram
LM fusion), same config as the 128×RT host row in PERFORMANCE.md's
decode table: 200-word trie, beam 10, T=200 frames (8 s at 25 fps).
The host pays Python dict mechanics per frame per hypothesis and
serializes over the batch; the device path is one compiled
``lax.scan`` over the whole batch.

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r5_lexdecode.py [--smoke]
"""
from __future__ import annotations

import json
import math
import time

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.models.decoder import ARPALM, ctc_decoder
from torchaudio_contrib_tpu.ops import (compile_lexicon_tables,
                                        ctc_lexicon_beam_decode)
from torchaudio_contrib_tpu.utils.timing import time_device_loop


def build(n_words=200, seed=0):
    rng = np.random.default_rng(seed)
    letters = [chr(ord("a") + i) for i in range(26)]
    tokens = ["-", "|"] + letters
    words = set()
    while len(words) < n_words:
        n = rng.integers(3, 8)
        words.add("".join(rng.choice(letters, n)))
    words = sorted(words)
    lexicon = [f"{w} {' '.join(w)}" for w in words]
    # bigram ARPA over the lexicon words (random logprobs)
    uni = [f"{-1.0 - 2.0 * rng.random():.3f}\t{w}\t-0.30"
           for w in words]
    big = [f"{-0.5 - 1.5 * rng.random():.3f}\t{a} {b}"
           for a, b in zip(rng.choice(words, 300),
                           rng.choice(words, 300))]
    arpa = (["\\data\\", f"ngram 1={len(words) + 2}",
             "ngram 2=300", "", "\\1-grams:",
             "-0.5\t<s>\t-0.3", "-0.9\t</s>"] + uni
            + ["", "\\2-grams:"] + big + ["", "\\end\\"])
    return tokens, lexicon, ARPALM(arpa)


def main(smoke=False):
    tokens, lexicon, lm = build(20 if smoke else 200)
    B, T = (2, 20) if smoke else (8, 200)
    beam = 4 if smoke else 10
    rng = np.random.default_rng(1)
    lp = rng.standard_normal((B, T, len(tokens))).astype(np.float32)
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True)).astype(np.float32)

    for lm_name, the_lm in (("zerolm", None), ("bigram", lm)):
        host = ctc_decoder(lexicon, tokens, lm=the_lm,
                           beam_size=beam, nbest=1,
                           beam_threshold=math.inf)
        compiled = compile_lexicon_tables(host)

        t0 = time.perf_counter()
        host_out = host(lp)
        host_s = time.perf_counter() - t0          # B clips, serial

        def dev(v):
            out = ctc_lexicon_beam_decode(
                v, compiled, beam_width=beam, blank=host.blank_idx,
                sil=host.sil_idx, lm_weight=host.lm_weight,
                word_score=host.word_score, sil_score=host.sil_score)
            return jnp.where(jnp.isfinite(out[-1]), out[-1], 0.0)

        dev_s = time_device_loop(dev, jnp.asarray(lp), k=4, reps=3)

        # correctness spot check: top-1 words equal on every clip
        toks, times_, lens, wids, wlens, scores = \
            ctc_lexicon_beam_decode(
                lp, compiled, beam_width=beam, blank=host.blank_idx,
                sil=host.sil_idx, lm_weight=host.lm_weight,
                word_score=host.word_score, sil_score=host.sil_score)
        wids_np, wlens_np = np.asarray(wids), np.asarray(wlens)
        sc_np = np.asarray(scores)
        agree = True
        for b in range(B):
            if not host_out[b]:
                agree &= not np.isfinite(sc_np[b, 0])
                continue
            dev_words = [compiled.words[i] for i in
                         wids_np[b, 0, :int(wlens_np[b, 0])]]
            agree &= dev_words == host_out[b][0].words
        audio_s = B * T / 25.0                     # 25 fps emissions
        print(json.dumps({
            "metric": f"lexicon_beam-{lm_name}",
            "host_ms_batch": round(host_s * 1e3, 1),
            "device_ms_batch": round(dev_s * 1e3, 2),
            "speedup": round(host_s / dev_s, 1),
            "host_xrt": round(audio_s / host_s, 1),
            "device_xrt": round(audio_s / dev_s, 1),
            "top1_words_agree": bool(agree)}), flush=True)


if __name__ == "__main__":
    import sys
    main(smoke="--smoke" in sys.argv)
