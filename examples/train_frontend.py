"""Training demo: trainable mel frontend + SpecAugment on synthetic data.

A compact but complete training loop showing the pieces working
together: WAV decode → batched waveforms → trainable-filterbank frontend
→ SpecAugment on the features → CNN → loss → jitted SGD step sharded
over all devices.  The synthetic task (classify which band carries the
tone) is learnable in a few dozen steps.

Run: python examples/train_frontend.py [--steps N]
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

import torchaudio_contrib_tpu as tac  # noqa: E402
from torchaudio_contrib_tpu import parallel as par  # noqa: E402
from torchaudio_contrib_tpu.models import MelFrontendClassifier  # noqa: E402


def make_batch(rng, n, sr, num_classes):
    """Tone in one of `num_classes` bands + noise; label = band."""
    labels = rng.integers(0, num_classes, n)
    t = np.arange(sr) / sr
    freqs = 300 * (2.0 ** labels)  # 300/600/1200/2400 Hz
    x = 0.5 * np.sin(2 * np.pi * freqs[:, None] * t[None, :])
    x += 0.05 * rng.standard_normal((n, sr))
    return (jnp.asarray(x[:, None, :].astype(np.float32)),
            jnp.asarray(labels))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", action="store_true",
                    help="single-kernel log-mel frontend (TPU fast path; "
                         "fwd AND bwd run as Pallas kernels)")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    sr, num_classes = 8000, 4
    model = MelFrontendClassifier(num_classes=num_classes, num_mels=32,
                                  sample_rate=sr, fft_length=256,
                                  hop_length=128, channels=(16, 32),
                                  fused=args.fused)
    params = model.init(jax.random.PRNGKey(0))
    mesh = par.make_mesh(n_data=jax.device_count())
    params = par.replicate(params, mesh)

    # augment the log-mel features inside the loss (train-time only)
    def loss_fn(p, x, y, key):
        feats = model.features(p, x)                    # (B,1,mels,T)
        k1, k2 = jax.random.split(key)
        feats = tac.freq_mask(k1, feats, mask_param=6)
        feats = tac.time_mask(k2, feats, mask_param=10)
        z = jnp.transpose(feats.mean(axis=1, keepdims=True), (0, 2, 3, 1))
        from torchaudio_contrib_tpu.models.frontend import _conv
        for cp in p["conv"]:
            z = jax.nn.relu(_conv(z, cp["w"], cp["b"], stride=2))
        logits = z.mean(axis=(1, 2)) @ p["head"]["w"] + p["head"]["b"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    @jax.jit
    def step(p, x, y, key, lr):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y, key)
        return jax.tree_util.tree_map(lambda a, g: a - lr * g, p,
                                      grads), loss

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.steps):
        x, y = make_batch(rng, args.batch, sr, num_classes)
        x, y = par.shard_batch(x, mesh), par.shard_batch(y, mesh)
        key, sub = jax.random.split(key)
        params, loss = step(params, x, y, sub, 3e-3)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}")
    print(f"{args.steps} steps in {time.perf_counter() - t0:.1f}s "
          f"on {jax.device_count()} device(s)")

    # eval accuracy on a fresh batch (no augmentation)
    x, y = make_batch(rng, 128, sr, num_classes)
    logits = model.apply(jax.device_get(params), x)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == y))
    print(f"eval accuracy: {acc:.2%}")


if __name__ == "__main__":
    main()
