"""Model-zoo device benchmarks (TPU): HiFi-GAN vocoder throughput,
Conformer encoder fwd / fwd+bwd, Wav2Vec2 vs WavLM encoder fwd,
ConvTasNet separation throughput.

Run on the chip (one process, pinned device-loop methodology):

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r3_model_zoo.py [--smoke] [--only SECTION]

Sections: hifigan, conformer, w2v2, convtasnet.  Emits one JSON line
per measurement (same shape as benchmarks/run_configs.py).  Numbers
land in docs/PERFORMANCE.md's "model zoo" table.
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
from torchaudio_contrib_tpu.utils.timing import (time_device_loop,
                                                 time_device_loop_p)


def emit(name, seconds, work, unit):
    print(json.dumps({"metric": name,
                      "value": round(work / seconds / 1e6, 3),
                      "unit": f"M{unit}/s",
                      "ms": round(seconds * 1e3, 2)}), flush=True)


def bench_hifigan(rng, smoke):
    B = 1 if smoke else 8
    FR = 16 if smoke else 256             # mel frames (~3 s at hop 256)
    for name, factory in (("hifigan_v1", hifigan_vocoder_v1),
                          ("hifigan_v3", hifigan_vocoder_v3)):
        net = factory()
        params = net.init(jax.random.PRNGKey(0))
        mel = jnp.asarray(rng.standard_normal((B, 80, FR)),
                          jnp.float32)
        sec = time_device_loop(lambda m: net.apply(params, m), mel,
                               k=2 if smoke else 4)
        emit(f"{name}-voc-fwd", sec, B * FR * 256, "samples")


def bench_conformer(rng, smoke):
    # ASR-scale encoder: batch 16 x 10 s of 100 fps features
    BT, T, LYR = (2, 50, 2) if smoke else (16, 1000, 12)
    enc = Conformer(input_dim=80, d_model=256, num_layers=LYR,
                    num_heads=4, conv_kernel=31)
    p = enc.init(jax.random.PRNGKey(1))
    feats = jnp.asarray(rng.standard_normal((BT, T, 80)), jnp.float32)
    sec = time_device_loop(lambda x: enc.apply(p, x), feats, k=4)
    emit(f"conformer{LYR}-fwd", sec, BT * T, "frames")

    def loss(pp, x):
        return jnp.sum(enc.apply(pp, x) ** 2)

    g = jax.grad(loss)
    sec = time_device_loop(
        lambda x: jax.tree_util.tree_leaves(g(p, x))[0], feats, k=4)
    emit(f"conformer{LYR}-fwdbwd", sec, BT * T, "frames")


def bench_w2v2(rng, smoke):
    # Wav2Vec2 vs WavLM BASE (same dims): isolates the gated
    # rel-pos-bias cost (table lookup + per-layer gate GEMM)
    from torchaudio_contrib_tpu.models.wav2vec2 import (
        wav2vec2_base, wavlm_base, Wav2Vec2, WavLM)
    BW, TW = (1, 16000) if smoke else (4, 160000)   # 10 s @ 16 kHz
    if smoke:
        cfg = dict(extractor_conv_layers=((32, 10, 5), (32, 3, 2)),
                   d_model=32, num_layers=2, num_heads=4, ff_dim=64,
                   pos_conv_kernel=16, pos_conv_groups=4)
        pair = (("w2v2", Wav2Vec2(**cfg)), ("wavlm", WavLM(**cfg)))
    else:
        pair = (("w2v2-base", wav2vec2_base()),
                ("wavlm-base", wavlm_base()))
    for name, net in pair:
        pw = net.init(jax.random.PRNGKey(3))
        wav = jnp.asarray(rng.standard_normal((BW, TW)) * 0.1,
                          jnp.float32)
        sec = time_device_loop_p(
            lambda pp, x: net.apply(pp, x)[0], pw, wav, k=2)
        emit(f"{name}-fwd", sec, BW * TW, "samples")


def bench_convtasnet(rng, smoke):
    net = ConvTasNet() if not smoke else ConvTasNet(
        enc_filters=64, bottleneck=32, hidden=64, num_blocks=2,
        num_repeats=1)
    tp = net.init(jax.random.PRNGKey(2))
    BS, TS = (1, 4000) if smoke else (4, 32000)
    mix = jnp.asarray(rng.standard_normal((BS, TS)) * 0.1,
                      jnp.float32)
    sec = time_device_loop(lambda m: net.apply(tp, m), mix, k=2)
    emit("convtasnet-fwd", sec, BS * TS, "samples")


def bench_vggish(rng, smoke):
    # AudioSet embedder: batch of 0.96 s patches; params ride as a jit
    # argument (time_device_loop_p) — the 72 M-param FC stack would
    # otherwise bake a ~300 MB constant into the HLO
    from torchaudio_contrib_tpu.models import VGGish
    net = VGGish()
    with jax.default_device(jax.local_devices(backend="cpu")[0] if
                            jax.default_backend() != "cpu" else None):
        pv = net.init(jax.random.PRNGKey(4))
    # ship the tree to the accelerator ONCE — leaving it CPU-committed
    # makes every timed rep re-transfer ~290 MB over the tunnel
    # (measured: 1 899 ms "forward" = pure wire time)
    pv = jax.device_put(pv, jax.devices()[0])
    B = 2 if smoke else 32                 # 32 patches ~ 30.7 s audio
    x = jnp.asarray(rng.standard_normal((B, 96, 64)), jnp.float32)
    sec = time_device_loop_p(lambda pp, v: net.apply(pp, v), pv, x,
                             k=2 if smoke else 4)
    emit("vggish-fwd", sec, B * 96 * 160 + B * 240, "samples")


_SECTIONS = {"hifigan": bench_hifigan, "conformer": bench_conformer,
             "w2v2": bench_w2v2, "convtasnet": bench_convtasnet,
             "vggish": bench_vggish}


def main(smoke: bool = False, only: str = ""):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          flush=True)
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
