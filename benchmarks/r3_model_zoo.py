"""Model-zoo device benchmarks (TPU): HiFi-GAN vocoder throughput,
Conformer encoder fwd / fwd+bwd, ConvTasNet separation throughput.

Run on the chip (one process, pinned device-loop methodology):

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r3_model_zoo.py

Emits one JSON line per measurement (same shape as
benchmarks/run_configs.py).  Numbers land in docs/PERFORMANCE.md's
"model zoo" table.
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.models.hifigan import hifigan_vocoder_v1, \
    hifigan_vocoder_v3
from torchaudio_contrib_tpu.models.conformer import Conformer
from torchaudio_contrib_tpu.models.tasnet import ConvTasNet
from torchaudio_contrib_tpu.utils.timing import time_device_loop


def emit(name, seconds, work, unit):
    print(json.dumps({"metric": name,
                      "value": round(work / seconds / 1e6, 3),
                      "unit": f"M{unit}/s",
                      "ms": round(seconds * 1e3, 2)}), flush=True)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          flush=True)

    # HiFi-GAN vocoder: batch 8 x 3 s of 22.05 kHz mel frames (hop 256)
    for name, factory in (("hifigan_v1", hifigan_vocoder_v1),
                          ("hifigan_v3", hifigan_vocoder_v3)):
        net = factory()
        params = net.init(jax.random.PRNGKey(0))
        frames = 256                      # ~3 s at hop 256 / 22.05 kHz
        mel = jnp.asarray(rng.standard_normal((8, 80, frames)),
                          jnp.float32)
        sec = time_device_loop(lambda m: net.apply(params, m), mel,
                               k=4)
        emit(f"{name}-voc-fwd", sec, 8 * frames * 256, "samples")

    # Conformer encoder (ASR-scale): batch 16 x 10 s of 100 fps feats
    enc = Conformer(input_dim=80, d_model=256, num_layers=12,
                    num_heads=4, conv_kernel=31)
    p = enc.init(jax.random.PRNGKey(1))
    feats = jnp.asarray(rng.standard_normal((16, 1000, 80)),
                        jnp.float32)
    sec = time_device_loop(lambda x: enc.apply(p, x), feats, k=4)
    emit("conformer12-fwd", sec, 16 * 1000, "frames")

    def loss(pp, x):
        return jnp.sum(enc.apply(pp, x) ** 2)

    g = jax.grad(loss)

    sec = time_device_loop(
        lambda x: jax.tree_util.tree_leaves(g(p, x))[0], feats, k=4)
    emit("conformer12-fwdbwd", sec, 16 * 1000, "frames")

    # ConvTasNet base: batch 4 x 4 s of 8 kHz separation
    net = ConvTasNet()
    tp = net.init(jax.random.PRNGKey(2))
    mix = jnp.asarray(rng.standard_normal((4, 32000)) * 0.1,
                      jnp.float32)
    sec = time_device_loop(lambda m: net.apply(tp, m), mix, k=4)
    emit("convtasnet-fwd", sec, 4 * 32000, "samples")


if __name__ == "__main__":
    main()
