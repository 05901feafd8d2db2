"""End-to-end ASR demo: Kaldi fbank → Conformer → CTC → greedy decode.

A compact, complete speech-recognition training loop built entirely
from this library: feature extraction (``compliance.kaldi.fbank``),
a Conformer encoder, ``ctc_loss`` training, ``ctc_greedy_decode`` +
``edit_distance`` evaluation, and ``forced_align``/``merge_tokens``
for word timing at the end.  The synthetic task (each "word" is a
tone at a class-specific frequency) is learnable in a few dozen steps.

Run: python examples/asr_pipeline.py [--tiny]
Works on CPU or TPU (whatever backend JAX selects).
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import optax  # noqa: E402

import torchaudio_contrib_tpu as tac  # noqa: E402
from torchaudio_contrib_tpu.compliance import kaldi  # noqa: E402
from torchaudio_contrib_tpu.models.conformer import Conformer  # noqa: E402

SR = 16000
TONES = [0.0, 440.0, 880.0, 1320.0, 1760.0]   # class 0 = silence/blank


def synth_utterance(rng, tokens, frames_per_token=8):
    """Each token = a tone held for N hops (hop 10 ms)."""
    hop = SR // 100
    wav = np.zeros(hop * frames_per_token * len(tokens), np.float32)
    t0 = 0
    for tok in tokens:
        seg = hop * frames_per_token
        t = np.arange(seg) / SR
        wav[t0:t0 + seg] = 0.3 * np.sin(2 * np.pi * TONES[tok] * t)
        t0 += seg
    return wav + 0.01 * rng.standard_normal(len(wav)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    steps = 30 if args.tiny else 120
    rng = np.random.default_rng(0)

    # -- data: batch of 3-token "sentences" over a 4-word vocabulary --
    batch, n_tok = (4, 3)
    tokens = rng.integers(1, 5, (batch, n_tok))
    waves = np.stack([synth_utterance(rng, seq) for seq in tokens])

    feats = kaldi.fbank(jnp.asarray(waves), num_mel_bins=23)
    print(f"fbank features: {feats.shape}")

    enc = Conformer(input_dim=23, d_model=64, num_layers=2,
                    num_heads=4, ff_ratio=2, conv_kernel=7)
    params = {"enc": enc.init(jax.random.PRNGKey(0)),
              "head": 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                              (64, 5))}
    targets = jnp.asarray(tokens, jnp.int32)

    def log_probs(p):
        h = enc.apply(p["enc"], feats)
        return jax.nn.log_softmax(h @ p["head"], -1)

    def loss_fn(p):
        return tac.ctc_loss(log_probs(p), targets, blank=0)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    t0 = time.time()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 10 == 0:
            print(f"step {i:3d}  ctc loss {float(loss):.3f}")
    print(f"trained {steps} steps in {time.time() - t0:.1f}s")

    # -- decode + WER -------------------------------------------------
    lp = log_probs(params)
    hyp, lens, _ = tac.ctc_greedy_decode(lp, blank=0)
    total_err = total_len = 0
    for b in range(batch):
        h = np.asarray(hyp)[b, :int(lens[b])].tolist()
        r = tokens[b].tolist()
        total_err += tac.edit_distance(r, h)
        total_len += len(r)
        print(f"ref {r}  hyp {h}")
    print(f"WER {total_err / total_len:.2%}")

    # -- forced alignment: where is each word? ------------------------
    ali, scores = tac.forced_align(lp[:1], targets[:1], blank=0)
    spans = tac.merge_tokens(np.asarray(ali)[0], np.asarray(scores)[0])
    for sp in spans:
        print(f"token {sp.token}: frames [{sp.start}, {sp.end}) "
              f"score {sp.score:.3f}")


if __name__ == "__main__":
    main()
