"""Round-4 late additions on the chip: the fully-jitted batched CTC
prefix beam search (``ops.ctc_beam_decode``) and the Kaldi pitch
tracker (``ops.compute_kaldi_pitch``).

Run on the chip (one process):

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r4_extras.py [--smoke]

Numbers land in docs/PERFORMANCE.md (decode table + frontend ops).
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from torchaudio_contrib_tpu.ops import ctc_beam_decode, \
    compute_kaldi_pitch
from torchaudio_contrib_tpu.utils.timing import time_device_loop

FPS = 25.0


def emit(name, seconds, audio_s, **extra):
    print(json.dumps({
        "metric": name,
        "ms": round(seconds * 1e3, 2),
        "xRT": round(audio_s / seconds, 1), **extra}), flush=True)


def main(smoke: bool):
    B, T, V, K = (2, 20, 33, 4) if smoke else (8, 250, 1024, 16)
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    def beam(x):
        toks, lens, scores = ctc_beam_decode(x, beam_width=K)
        # scalar so the device loop has a fetchable sync point
        return scores[:, 0].sum() + toks.sum() * 0.0 + lens.sum() * 0.0

    sec = time_device_loop(beam, lp)
    emit("ctc_beam_decode", sec, B * T / FPS,
         config=f"B={B},T={T},V={V},beam={K}",
         frames_per_s=round(B * T / sec, 1))

    sr, dur = (16000, 1.0) if smoke else (16000, 10.0)
    t = np.arange(int(sr * dur)) / sr
    f = 120.0 + 80.0 * np.sin(2 * np.pi * 0.5 * t)
    wave = np.stack([
        (0.3 * np.sin(2 * np.pi * np.cumsum(f * (1 + 0.01 * b)) / sr))
        .astype(np.float32) for b in range(B)])

    def pitch(x):
        return compute_kaldi_pitch(x, sr).sum()

    sec = time_device_loop(pitch, jnp.asarray(wave))
    emit("compute_kaldi_pitch", sec, B * dur,
         config=f"B={B}x{dur:g}s@{sr}")


if __name__ == "__main__":
    main("--smoke" in sys.argv)
