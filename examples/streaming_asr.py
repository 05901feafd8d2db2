"""Streaming ASR demo: Emformer-RNNT trained on a synthetic tone task,
then decoded CHUNK BY CHUNK with carried state — the streamed
transcript matches the full-utterance decode exactly.

Pipeline (entirely from this library): log-mel frontend
(``Melspectrogram`` + ``AmplitudeToDb``) → ``Emformer`` transcriber
inside an ``RNNT`` → ``rnnt_loss`` training → full
``greedy_decode`` vs chunkwise ``stream_greedy_step`` vs streaming
``RNNTBeamSearch.infer``.

Run: python examples/streaming_asr.py [--tiny]
Works on CPU or TPU (whatever backend JAX selects).
"""
import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import optax  # noqa: E402

import torchaudio_contrib_tpu as tac  # noqa: E402

SR = 16000
TONES = [0.0, 500.0, 1000.0, 1500.0, 2000.0]    # class 0 = blank
HOP = 160
SEG, RC = 4, 2                                   # Emformer segment/lookahead


def synth(rng, tokens, frames_per_token=8):
    wav = np.zeros(HOP * frames_per_token * len(tokens), np.float32)
    t0 = 0
    for tok in tokens:
        seg = HOP * frames_per_token
        t = np.arange(seg) / SR
        wav[t0:t0 + seg] = 0.3 * np.sin(2 * np.pi * TONES[tok] * t)
        t0 += seg
    return wav + 0.01 * rng.standard_normal(len(wav)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    steps = 40 if args.tiny else 200
    rng = np.random.default_rng(0)

    batch, n_tok = 4, 3
    tokens = rng.integers(1, 5, (batch, n_tok))
    waves = np.stack([synth(rng, seq) for seq in tokens])

    n_mels = 16
    frontend = tac.Pipeline(
        *tac.Melspectrogram(num_mels=n_mels, sample_rate=SR,
                            fft_length=400, hop_length=HOP),
        tac.AmplitudeToDb(power=2.0))
    mel = jnp.swapaxes(frontend(jnp.asarray(waves)), 1, 2)  # (B,T,M)
    mel = (mel - jnp.mean(mel)) / (jnp.std(mel) + 1e-5)
    # frames = utterance + Emformer lookahead tail
    T = mel.shape[1] - RC

    enc = tac.Emformer(input_dim=n_mels, num_heads=2, ffn_dim=64,
                       num_layers=2, segment_length=SEG,
                       left_context_length=4,
                       right_context_length=RC, max_memory_size=2,
                       tanh_on_mem=True)
    model = tac.RNNT(enc, num_symbols=5, encoding_dim=n_mels,
                     joiner_dim=32, predictor_embed_dim=16,
                     predictor_hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0))
    targets = jnp.asarray(tokens, jnp.int32)

    def loss_fn(p):
        # the fused path: the (B, T, U+1, V) joint grid is computed
        # time-chunk-wise under remat and never stored — at production
        # B/T/V this is the memory-capacity lever (PERFORMANCE.md
        # round 5); equals rnnt_loss(model.joint_logits(...)) exactly
        return model.loss(p, mel, targets)

    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    for i in range(steps):
        params, ost, l = step(params, ost)
        if i % 40 == 0 or i == steps - 1:
            print(f"step {i:4d}  rnnt_loss {float(l):.3f}")

    # -- full-utterance decode -------------------------------------
    full = model.greedy_decode(params, mel)
    print("targets :", tokens.tolist())
    print("full    :", full)

    # -- streaming decode, one Emformer chunk at a time ------------
    nseg = -(-T // SEG)
    Tp = nseg * SEG
    ext = jnp.pad(mel, ((0, 0), (0, Tp - mel.shape[1] + RC), (0, 0)))
    state = model.init_stream_state(params, batch)
    search = tac.RNNTBeamSearch(model, beam_width=4)
    bstates = search.init_state(params, batch)
    enc_state = model.init_stream_state(params, batch)["enc"]
    streamed = [[] for _ in range(batch)]
    for i in range(nseg):
        base = i * SEG
        rc_start = min(base + SEG, T)
        chunk = jnp.concatenate([ext[:, base:base + SEG],
                                 ext[:, rc_start:rc_start + RC]], 1)
        ul = jnp.full((batch,), min(SEG, T - base), jnp.int32)
        rl = jnp.full((batch,), min(RC, T + RC - rc_start), jnp.int32)
        grid, _, state = model.stream_greedy_step(
            params, chunk, state, utt_lengths=ul, rc_lengths=rl)
        for b, row in enumerate(np.asarray(grid)):
            streamed[b] += [int(t) for t in row.reshape(-1) if t != 0]
        feats, ol, enc_state = model.stream_transcribe(
            params, chunk, enc_state, utt_lengths=ul, rc_lengths=rl)
        beams, bstates = search.infer(params, feats, ol, bstates)
    print("streamed:", streamed)
    print("beam    :", [b[0][0] for b in beams])
    assert streamed == full, "streaming must equal full decode"
    acc = np.mean([s == list(t) for s, t in zip(streamed, tokens)])
    print(f"greedy==full OK; sequence accuracy {acc:.2f}")


if __name__ == "__main__":
    main()
