"""End-to-end examples: feature extraction, trainable frontend, corpus run.

Run: python examples/melspectrogram_pipeline.py [--tiny]
Works on CPU or TPU (uses whatever backend JAX selects).
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# runnable from anywhere: the package lives one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import torchaudio_contrib_tpu as tac  # noqa: E402
from torchaudio_contrib_tpu import parallel as par


def example_features(tiny: bool):
    """Composable pipeline, reference-style."""
    sr = 16000
    t = sr if tiny else sr * 10
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4, 2, t)).astype(np.float32))

    # factory pipeline (Sequential-style, spliceable)
    mel = tac.Melspectrogram(num_mels=64, sample_rate=sr,
                             fft_length=1024, hop_length=256)
    logmel = tac.Pipeline(*mel, tac.AmplitudeToDb(power=2.0))
    out = jax.jit(logmel)(x)
    print(f"pipeline log-mel: {x.shape} -> {out.shape}")

    # single fused kernel (TPU fast path; falls back off-TPU)
    fused = tac.FusedMelspectrogram(num_mels=64, sample_rate=sr,
                                    fft_length=1024, hop_length=256)
    out_f = jax.jit(fused)(x)
    print(f"fused log-mel:    {x.shape} -> {out_f.shape}")

    # round-trip
    spec = tac.stft(x, 1024, 256)
    y = tac.istft(spec, 256, length=t)
    print(f"istft round-trip max err: {float(jnp.max(jnp.abs(y - x))):.2e}")


def example_trainable(tiny: bool):
    """BASELINE config 3: gradients reach the mel filterbank."""
    model = tac.MelFrontendClassifier(num_classes=10, num_mels=32,
                                      fft_length=512, hop_length=128)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 1, 4000)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 8))
    for step in range(3 if tiny else 10):
        params, loss = model.train_step(params, x, y, 1e-3)
    print(f"trainable frontend loss after steps: {float(loss):.4f}")
    g = jax.grad(model.loss_fn)(params, x, y)
    print(f"filterbank grad norm: "
          f"{float(jnp.linalg.norm(g['frontend'][2])):.4f}")


def example_corpus(tiny: bool):
    """BASELINE config 5 (scaled down): sharded, fault-tolerant corpus."""
    sr = 16000
    n_files = 32 if tiny else 256
    rng = np.random.default_rng(2)
    store = {i: rng.standard_normal((1, sr)).astype(np.float32)
             for i in range(n_files)}

    def loader(i):
        if i % 17 == 13:
            raise IOError("synthetic decode failure")
        return store[i]

    mesh = par.make_mesh(n_data=jax.device_count())
    pre = par.CorpusPreprocessor(
        loader, clip_samples=sr, batch_size=jax.device_count() * 2,
        mesh=mesh, fft_length=512, hop_length=128, num_mels=64,
        sample_rate=sr, frames_per_chunk=16)
    t0 = time.perf_counter()
    stats = pre.run(range(n_files))
    print(f"corpus: {stats.files_done} ok / {stats.files_failed} skipped, "
          f"{stats.frames_per_sec:,.0f} frames/s "
          f"({time.perf_counter() - t0:.1f}s, {jax.device_count()} devices)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}, devices: "
          f"{jax.device_count()}", file=sys.stderr)
    example_features(args.tiny)
    example_trainable(args.tiny)
    example_corpus(args.tiny)
