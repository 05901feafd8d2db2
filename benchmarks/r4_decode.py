"""Decode-path benchmarks (TPU): RNNT greedy, RNNT beam search
(host loop vs the round-4 fully-jitted batched beam), and the lexicon
CTC beam decoder.  Throughput in frames/s and ×realtime.

Decode is isolated from the transcriber: the predictor/joiner/beam
run on synthetic *projected* encoder features at the
``emformer_rnnt_base`` decoder scale (V=4097 sentencepieces, 2×512
LSTM predictor, 1024-d joiner, 25 fps features after the stride-4
time reduction → 1 frame = 40 ms of audio).

Run on the chip (one process):

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r4_decode.py [--smoke] [--only SECTION]

Sections: greedy, beam_batched, beam_host, ctc_lexicon.
Numbers land in docs/PERFORMANCE.md's "decode" table.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.models.rnnt import RNNT, RNNTBeamSearch
from torchaudio_contrib_tpu.utils.timing import time_device_loop_p

FPS = 25.0                      # feature frames per audio second


class _NoopTranscriber:
    """Identity transcriber so RNNT wraps a decode-only benchmark."""

    def __init__(self, dim):
        self.dim = dim

    def init(self, key):
        return {}

    def apply(self, params, x, lengths=None):
        return x


def emit(name, seconds, frames, batch):
    audio_s = frames / FPS * batch
    print(json.dumps({
        "metric": name,
        "value": round(frames * batch / seconds, 1),
        "unit": "frames/s",
        "xRT": round(audio_s / seconds, 2),
        "ms": round(seconds * 1e3, 2)}), flush=True)


def _model(smoke):
    V, J = (33, 32) if smoke else (4097, 1024)
    m = RNNT(_NoopTranscriber(J), num_symbols=V, encoding_dim=J,
             joiner_dim=J, predictor_embed_dim=J // 2,
             predictor_hidden_dim=J // 2, predictor_layers=2)
    return m, m.init(jax.random.PRNGKey(0)), V, J


def _feats(rng, b, t, j):
    return jnp.asarray(rng.standard_normal((b, t, j)) * 0.5,
                       jnp.float32)


def bench_greedy(rng, smoke):
    m, p, V, J = _model(smoke)
    B, T = (2, 10) if smoke else (8, 250)      # 10 s per sample
    feats = _feats(rng, B, T, J)
    lengths = jnp.full((B,), T, jnp.int32)

    def run(pp, x):
        grid, _ = m._greedy_on_enc(pp, x, lengths, 4,
                                   m.greedy_init_state(pp, B))
        return grid.astype(jnp.float32)

    sec = time_device_loop_p(run, p, feats, k=2)
    emit("rnnt-greedy", sec, T, B)


def bench_beam_batched(rng, smoke):
    m, p, V, J = _model(smoke)
    B, T = (2, 10) if smoke else (8, 250)
    K = 2 if smoke else 8
    search = RNNTBeamSearch(m, beam_width=K, max_symbols=4)
    feats = _feats(rng, B, T, J)
    lengths = jnp.full((B,), T, jnp.int32)
    L = T * 4

    def run(pp, x):
        carry = search.init_batched_state(pp, B, L)
        out = search._run_batched(pp, x, lengths, carry)
        return jnp.where(jnp.isfinite(out["scores"]),
                         out["scores"], 0.0)

    sec = time_device_loop_p(run, p, feats, k=2)
    emit(f"rnnt-beam{K}-batched", sec, T, B)


def bench_beam_host(rng, smoke):
    # host loop is dispatch-bound: wall-clock a single short utterance
    # (dispatch cost dominates; frames/s extrapolates linearly)
    m, p, V, J = _model(smoke)
    T = 5 if smoke else 50
    K = 2 if smoke else 8
    search = RNNTBeamSearch(m, beam_width=K, max_symbols=4)
    feats = _feats(rng, 1, T, J)
    lengths = jnp.asarray([T])
    states = search.init_state(p, 1)
    search.infer(p, feats, lengths, states)       # warm the jits
    t0 = time.perf_counter()
    search.infer(p, feats, lengths, search.init_state(p, 1))
    sec = time.perf_counter() - t0
    emit(f"rnnt-beam{K}-host", sec, T, 1)


def bench_ctc_lexicon(rng, smoke):
    from torchaudio_contrib_tpu.models.decoder import ctc_decoder
    labels = ["-", "|"] + [chr(ord("a") + i) for i in range(26)]
    words = ["".join(rng.choice(list("abcdefgh"), size=5))
             for _ in range(20 if smoke else 200)]
    lexicon = {w: list(w) for w in dict.fromkeys(words)}
    dec = ctc_decoder(lexicon, labels, blank_token="-",
                      sil_token="|", beam_size=10)
    T = 20 if smoke else 200                       # 50 fps CTC frames
    em = np.log(np.random.default_rng(0).dirichlet(
        np.ones(len(labels)), size=(1, T)).astype(np.float32))
    dec(em)                                        # warm
    t0 = time.perf_counter()
    dec(em)
    sec = time.perf_counter() - t0
    audio_s = T / 50.0
    print(json.dumps({"metric": "ctc-lexicon-beam10", "value":
                      round(T / sec, 1), "unit": "frames/s",
                      "xRT": round(audio_s / sec, 2),
                      "ms": round(sec * 1e3, 2)}), flush=True)


_SECTIONS = {"greedy": bench_greedy,
             "beam_batched": bench_beam_batched,
             "beam_host": bench_beam_host,
             "ctc_lexicon": bench_ctc_lexicon}


def main(smoke=False, only=""):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} "
          f"{getattr(dev, 'device_kind', '')}", flush=True)
    if only and only not in _SECTIONS:
        raise SystemExit(f"--only must be one of {sorted(_SECTIONS)}")
    for name, fn in _SECTIONS.items():
        if not only or only == name:
            fn(rng, smoke)


if __name__ == "__main__":
    import sys
    only = ""
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    main(smoke="--smoke" in sys.argv, only=only)
