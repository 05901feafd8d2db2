"""SSL pretraining demo: HuBERT masked prediction over a WavLM encoder.

Shows the self-supervised stack end to end on synthetic data:
synthetic waveforms → k-means-style pseudo-labels (here: the dominant
band of each 20 ms frame) → `HuBERTPretrainModel(WavLM(...))` masked
cross-entropy → jitted, data-parallel SGD over every available device.
Swap `WavLM` for `Wav2Vec2`/`ConformerWav2Vec2` — the pretrain model is
duck-typed over any encoder exposing the SSL hooks.

The synthetic objective is genuinely learnable: masked-frame CE drops
well below ln(num_classes) within ~60 steps on CPU.

`--bf16` runs the step through `utils.mixed_precision`: f32 master
params, bf16 compute, f32 grads — the production TPU pattern (1.23×
at the batch knee, docs/PERFORMANCE.md round 5); the training curve
is indistinguishable from f32 on this objective.

Run: python examples/ssl_pretrain.py [--steps N] [--encoder wavlm|w2v2]
     [--bf16]
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
from torchaudio_contrib_tpu.models.wav2vec2 import (  # noqa: E402
    Wav2Vec2, WavLM)

# tiny encoder: total stride 20 → 50 ms frames at 1 kHz toy rate
_ENC = dict(extractor_conv_layers=((16, 10, 5), (16, 4, 2), (16, 2, 2)),
            d_model=32, num_layers=2, num_heads=4, ff_dim=64,
            pos_conv_kernel=9, pos_conv_groups=4)


def make_batch(rng, n, t_samples, num_classes, out_len, stride=20):
    """Per-frame band-toggled tones; pseudo-label = active band."""
    seg = rng.integers(0, num_classes, (n, out_len))
    tt = np.arange(t_samples) / 1000.0
    frame_of = np.minimum(np.arange(t_samples) // stride, out_len - 1)
    freqs = 60.0 * (2.0 ** seg[:, frame_of])          # (n, T)
    x = 0.5 * np.sin(2 * np.pi * np.cumsum(freqs / 1000.0, axis=1))
    x += 0.02 * rng.standard_normal((n, t_samples))
    return (jnp.asarray(x.astype(np.float32)), jnp.asarray(seg))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--encoder", choices=("wavlm", "w2v2"),
                    default="wavlm")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute (f32 master params/grads) via "
                         "utils.mixed_precision")
    args = ap.parse_args()

    num_classes = 4
    enc = (WavLM(num_buckets=16, max_distance=40, **_ENC)
           if args.encoder == "wavlm" else Wav2Vec2(**_ENC))
    model = tac.HuBERTPretrainModel(enc, num_classes=num_classes,
                                    mask_prob=0.3, mask_span=3)
    params = model.init(jax.random.PRNGKey(0))

    t_samples = 400
    out_len = int(enc.output_length(t_samples))
    print(f"encoder={args.encoder}  frames/clip={out_len}  "
          f"devices={jax.device_count()}")

    mesh = tac.parallel.make_mesh()
    data_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data"))

    def loss_fn(pp, key, x, labels):
        return model.loss(pp, key, x, labels)

    if args.bf16:
        # f32 master params in, bf16 compute inside, f32 grads out
        loss_fn = tac.utils.mixed_precision(loss_fn)

    @jax.jit
    def step(p, key, x, labels):
        loss, g = jax.value_and_grad(
            lambda pp: loss_fn(pp, key, x, labels))(p)
        new_p = jax.tree_util.tree_map(lambda w, gr: w - 0.1 * gr, p, g)
        return loss, new_p

    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    for i in range(args.steps):
        x, labels = make_batch(rng, args.batch, t_samples,
                               num_classes, out_len)
        x = jax.device_put(x, data_sharding)
        labels = jax.device_put(labels, data_sharding)
        key, sub = jax.random.split(key)
        loss, params = step(params, sub, x, labels)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  masked-CE+pen {float(loss):.4f}  "
                  f"(ln C = {np.log(num_classes):.3f})")
    print(f"done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
