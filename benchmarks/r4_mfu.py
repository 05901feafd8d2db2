"""MFU accounting for the flagship training steps (TPU v5e):
Conformer-RNNT, wav2vec2-base-geometry HuBERT pretrain, HDemucs.

For each model: XLA's own FLOP count for the compiled step
(``compiled.cost_analysis()['flops']`` — the authoritative number for
what the program actually executes) over the measured device-loop step
time, as a fraction of the v5e peak (197.1 TFLOP/s with bf16 MXU
multiplies — the default-precision f32-in/bf16-mult reality of these
GEMMs; f32-accumulate).  Also probes the two named levers:
``jax.checkpoint`` around the encoder (memory↔FLOPs trade) and bf16
activations+params (throughput).

Run on the chip (one process):

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r4_mfu.py [--smoke] [--only SECTION]

Sections: conformer_rnnt, w2v2_pretrain, hdemucs.
Numbers land in docs/PERFORMANCE.md's "training-step MFU" table.
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.utils.timing import time_device_loop_p

PEAK_FLOPS = 197.1e12        # TPU v5e, bf16 MXU multiplies


def _flops(fn, *args) -> float:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def emit(name, seconds, flops, extra=None):
    rec = {"metric": name, "ms": round(seconds * 1e3, 2),
           "tflops": round(flops / 1e12, 3),
           "mfu_pct": round(100.0 * flops / seconds / PEAK_FLOPS, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


# ------------------------------------------------------------------ #
# Conformer-RNNT                                                     #
# ------------------------------------------------------------------ #

def bench_conformer_rnnt(rng, smoke):
    from torchaudio_contrib_tpu.models import Conformer, RNNT
    from torchaudio_contrib_tpu.ops import rnnt_loss
    if smoke:
        B, T, U, V, L, D = 2, 20, 5, 32, 2, 32
    else:
        B, T, U, V, L, D = 4, 250, 30, 512, 16, 256
    enc = Conformer(input_dim=80, d_model=D, num_layers=L,
                    num_heads=4, conv_kernel=31)
    model = RNNT(enc, num_symbols=V, encoding_dim=D, joiner_dim=D,
                 predictor_embed_dim=D // 2, predictor_hidden_dim=D,
                 predictor_layers=2)
    p = model.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    tgts = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)

    def loss_fn(pp, x):
        logits, _ = model.joint_logits(pp, x, tgts)
        return rnnt_loss(logits, tgts, blank=0, reduction="mean")

    grad_fn = jax.value_and_grad(loss_fn)

    def step(pp, x):
        _, g = grad_fn(pp, x)
        return jax.tree_util.tree_leaves(g)[0]

    fl_f = _flops(loss_fn, p, feats)
    sec_f = time_device_loop_p(loss_fn, p, feats, k=2)
    emit("conformer_rnnt-fwd", sec_f, fl_f)
    fl = _flops(step, p, feats)
    sec = time_device_loop_p(step, p, feats, k=2)
    emit("conformer_rnnt-fwdbwd", sec, fl)

    # lever 1: remat the encoder (recompute activations in bwd)
    remat_enc = jax.checkpoint(
        lambda pp, x: enc.apply(pp, x), static_argnums=())

    def loss_remat(pp, x):
        e = remat_enc(pp["transcriber"], x)
        e = e @ pp["enc_proj"]["w"] + pp["enc_proj"]["b"]
        pred = model.predictor.apply(pp["predictor"], tgts)
        logits = model.join(pp, e[:, :, None, :], pred[:, None, :, :])
        return rnnt_loss(logits, tgts, blank=0, reduction="mean")

    def step_remat(pp, x):
        g = jax.grad(loss_remat)(pp, x)
        return jax.tree_util.tree_leaves(g)[0]

    fl_r = _flops(step_remat, p, feats)
    sec_r = time_device_loop_p(step_remat, p, feats, k=2)
    emit("conformer_rnnt-fwdbwd-remat", sec_r, fl_r)

    # lever 2: bf16 params + activations
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, p)

    def step_bf16(pp, x):
        g = jax.grad(lambda q, v: loss_fn(
            jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, q),
            v.astype(jnp.bfloat16)).astype(jnp.float32))(pp, x)
        return jax.tree_util.tree_leaves(g)[0]

    try:
        fl_b = _flops(step_bf16, p, feats)
        sec_b = time_device_loop_p(step_bf16, p, feats, k=2)
        emit("conformer_rnnt-fwdbwd-bf16", sec_b, fl_b)
    except Exception as e:
        print(json.dumps({"metric": "conformer_rnnt-fwdbwd-bf16",
                          "error": str(e)[:200]}), flush=True)


# ------------------------------------------------------------------ #
# wav2vec2 / HuBERT pretrain                                         #
# ------------------------------------------------------------------ #

def bench_w2v2_pretrain(rng, smoke):
    from torchaudio_contrib_tpu.models import HuBERTPretrainModel
    from torchaudio_contrib_tpu.models.wav2vec2 import (Wav2Vec2,
                                                        wav2vec2_base)
    if smoke:
        enc = Wav2Vec2(extractor_conv_layers=((32, 10, 5), (32, 3, 2)),
                       d_model=32, num_layers=2, num_heads=4,
                       ff_dim=64, pos_conv_kernel=16,
                       pos_conv_groups=4)
        B, TS = 1, 8000
    else:
        enc = wav2vec2_base()
        B, TS = 4, 32000                     # 4 x 2 s @ 16 kHz
    model = HuBERTPretrainModel(enc, num_classes=100)
    p = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((B, TS)) * 0.1, jnp.float32)
    labels = jnp.asarray(
        rng.integers(0, 100, (B, int(enc.output_length(TS)))),
        jnp.int32)
    key = jax.random.PRNGKey(2)

    def step(pp, v):
        g = jax.grad(lambda q: model.loss(q, key, v, labels))(pp)
        return jax.tree_util.tree_leaves(g)[0]

    fl = _flops(step, p, x)
    sec = time_device_loop_p(step, p, x, k=2)
    emit("w2v2_pretrain-fwdbwd", sec, fl)

    def loss_remat(pp, v):
        return jax.checkpoint(
            lambda q, u: model.loss(q, key, u, labels))(pp, v)

    def step_r(pp, v):
        g = jax.grad(loss_remat)(pp, v)
        return jax.tree_util.tree_leaves(g)[0]

    fl_r = _flops(step_r, p, x)
    sec_r = time_device_loop_p(step_r, p, x, k=2)
    emit("w2v2_pretrain-fwdbwd-remat", sec_r, fl_r)


# ------------------------------------------------------------------ #
# HDemucs                                                            #
# ------------------------------------------------------------------ #

def bench_hdemucs(rng, smoke):
    from torchaudio_contrib_tpu.models import HDemucs
    if smoke:
        m = HDemucs(sources=("a", "b"), audio_channels=1, channels=4,
                    depth=3, shared_depth=1, nfft=128, kernel=8,
                    stride=4)
        B, C, TS = 1, 1, 2048
    else:
        m = HDemucs(sources=("drums", "bass", "other", "vocals"),
                    audio_channels=2, channels=48, depth=4,
                    shared_depth=2, nfft=4096, kernel=8, stride=4)
        B, C, TS = 2, 2, 44100                # 2 x 1 s stereo
    p = m.init(jax.random.PRNGKey(3))
    mix = jnp.asarray(rng.standard_normal((B, C, TS)) * 0.1,
                      jnp.float32)
    tgt = jnp.asarray(rng.standard_normal(
        (B, len(m.sources), C, TS)) * 0.1, jnp.float32)

    def loss_fn(pp, v):
        return jnp.mean((m.apply(pp, v) - tgt) ** 2)

    def step(pp, v):
        g = jax.grad(loss_fn)(pp, v)
        return jax.tree_util.tree_leaves(g)[0]

    fl_f = _flops(loss_fn, p, mix)
    sec_f = time_device_loop_p(loss_fn, p, mix, k=2)
    emit("hdemucs-fwd", sec_f, fl_f)
    fl = _flops(step, p, mix)
    sec = time_device_loop_p(step, p, mix, k=2)
    emit("hdemucs-fwdbwd", sec, fl)


def bench_scale(rng, smoke):
    """Batch-scaling probe: does MFU rise with B (arithmetic
    intensity) as the latency-regime analysis predicts?"""
    from torchaudio_contrib_tpu.models import Conformer, RNNT
    from torchaudio_contrib_tpu.ops import rnnt_loss
    T, U, V, L, D = (20, 5, 32, 2, 32) if smoke else \
        (250, 30, 512, 16, 256)
    enc = Conformer(input_dim=80, d_model=D, num_layers=L,
                    num_heads=4, conv_kernel=31)
    model = RNNT(enc, num_symbols=V, encoding_dim=D, joiner_dim=D,
                 predictor_embed_dim=D // 2, predictor_hidden_dim=D,
                 predictor_layers=2)
    p = model.init(jax.random.PRNGKey(0))
    for B in ((1, 2) if smoke else (4, 16, 32)):
        feats = jnp.asarray(rng.standard_normal((B, T, 80)),
                            jnp.float32)
        tgts = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)

        def step(pp, x, tgts=tgts):
            def loss_fn(q, v):
                logits, _ = model.joint_logits(q, v, tgts)
                return rnnt_loss(logits, tgts, blank=0,
                                 reduction="mean")
            g = jax.grad(loss_fn)(pp, x)
            return jax.tree_util.tree_leaves(g)[0]

        fl = _flops(step, p, feats)
        sec = time_device_loop_p(step, p, feats, k=2)
        emit(f"conformer_rnnt-fwdbwd-B{B}", sec, fl)


_SECTIONS = {"conformer_rnnt": bench_conformer_rnnt,
             "w2v2_pretrain": bench_w2v2_pretrain,
             "hdemucs": bench_hdemucs,
             "scale": bench_scale}


def main(smoke=False, only=""):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} "
          f"{getattr(dev, 'device_kind', '')} peak={PEAK_FLOPS/1e12} "
          "TFLOP/s (bf16 MXU)", flush=True)
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
