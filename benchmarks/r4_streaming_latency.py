"""Streaming-ASR per-chunk latency (TPU): Emformer-RNNT at bundle scale.

The decode table (r4_decode.py) measures offline throughput; a live
ASR server cares about something else — the latency of ONE streaming
step: a 16-frame segment (+4 lookahead) through all 20 Emformer
layers, the joiner projection, and the greedy emission loop, with the
carried state threaded through.  At 25 fps encoder features one
segment = 640 ms of audio, so real time requires < 640 ms/step and
the margin is the serving headroom.

Two regimes, per CLAUDE.md timing doctrine:

- **dispatch-timed** — each chunk is its own dispatch with a scalar
  fetch of the emissions (the production streaming pattern: results
  must come back before the next chunk exists, so the tunnel RTT is
  genuinely part of THIS metric; a colocated server would pay µs
  instead of the axon 1–4 ms).
- **device-loop** — C chunks chained through the carried state in one
  jit (`lax.scan`), isolating pure per-chunk compute.

Run:  env PYTHONPATH=/root/.axon_site:/root/repo \
          python benchmarks/r4_streaming_latency.py [--smoke]
Numbers land in docs/PERFORMANCE.md's "streaming latency" table.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.models import emformer_rnnt_model

FPS = 25.0                      # encoder feature frames per second


def build(smoke: bool):
    if smoke:
        m = emformer_rnnt_model(
            input_dim=16, num_symbols=33, segment_length=4,
            right_context_length=2, left_context_length=4,
            num_heads=2, ffn_dim=32, num_layers=2, max_memory_size=2,
            predictor_embed_dim=16, predictor_hidden_dim=16,
            joiner_dim=16)
    else:
        m = emformer_rnnt_model(
            input_dim=80, num_symbols=4097, segment_length=16,
            right_context_length=4)
    params = m.init(jax.random.PRNGKey(0))
    S = m.transcriber.S + m.transcriber.R
    return m, params, S, m.transcriber.d


def emit(name, sec_per_chunk, seg_frames, batch):
    audio_s = seg_frames / FPS
    print(json.dumps({
        "metric": name,
        "value": round(sec_per_chunk * 1e3, 2),
        "unit": "ms/chunk",
        "chunk_audio_ms": round(audio_s * 1e3, 1),
        "xRT": round(audio_s * batch / sec_per_chunk, 2)}), flush=True)


def bench_batch(m, params, S, D, batch, n_chunks, seg_frames):
    rng = np.random.default_rng(batch)
    chunk = jnp.asarray(rng.standard_normal((batch, S, D)) * 0.5,
                        jnp.float32)

    def step(p, ch, st):
        grid, lens, st = m.stream_greedy_step(p, ch, st, max_symbols=4)
        return grid.astype(jnp.float32), st

    jstep = jax.jit(step)

    # -- dispatch-timed: one round trip per chunk ------------------
    st = m.init_stream_state(params, batch)
    grid, st = jstep(params, chunk, st)            # compile
    float(jnp.sum(grid))
    st = m.init_stream_state(params, batch)
    times = []
    for i in range(n_chunks):
        t0 = time.perf_counter()
        grid, st = jstep(params, chunk * (1.0 + 1e-30 * i), st)
        float(jnp.sum(grid))                       # scalar fetch sync
        times.append(time.perf_counter() - t0)
    emit(f"stream-step-dispatch-B{batch}",
         float(np.median(times)), seg_frames, batch)

    # -- device-loop: chunks chained through the state in one jit --
    chunks = jnp.asarray(
        rng.standard_normal((n_chunks, batch, S, D)) * 0.5, jnp.float32)

    def loop(p, cs, st):
        def body(carry, ch):
            grid, carry = step(p, ch, carry)
            return carry, jnp.sum(grid)
        st, sums = jax.lax.scan(body, st, cs)
        return jnp.sum(sums)

    jloop = jax.jit(loop)
    st0 = m.init_stream_state(params, batch)
    float(jloop(params, chunks, st0))              # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(jloop(params, chunks, st0))
        best = min(best, time.perf_counter() - t0)
    emit(f"stream-step-deviceloop-B{batch}",
         best / n_chunks, seg_frames, batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    print("device:", jax.devices()[0].device_kind, flush=True)
    m, params, S, D = build(args.smoke)
    seg = m.transcriber.S
    n_chunks = 4 if args.smoke else 24
    for batch in ((1,) if args.smoke else (1, 8)):
        bench_batch(m, params, S, D, batch, n_chunks, seg)


if __name__ == "__main__":
    main()
