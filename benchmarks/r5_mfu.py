"""Round-5 MFU completion (TPU v5e): batch-knee curve, bytes-moved
roofline, scan-over-layers and fused (flash) attention probes, and the
HDemucsTA (published-layout) zoo row.

Extends ``r4_mfu.py`` per VERDICT r4 ask 2:

* **knee** — Conformer-RNNT and HuBERT-pretrain train steps at
  B = 32…256 / 8…128 with K≥8 device-loop chaining (the r4 probe used
  K=2 — thin dispatch amortization at 15–33 ms steps), each emitting
  the XLA-counted FLOPs AND bytes accessed, so every point carries its
  own roofline verdict: ``gbps / 819 GB/s`` (v5e HBM) vs
  ``mfu_pct / 100``.  OOM at a batch size is reported as the knee's
  memory boundary, not an error.
* **scan_layers** — the one lever r4 never tried: ``lax.scan`` over
  stacked Conformer layers vs the unrolled Python loop (same math),
  fwd and fwd+bwd.
* **flash_attn** — fused (flash-style) attention at T ≥ 1000: XLA's
  einsum-softmax-einsum MHA vs ``pallas.ops.tpu.flash_attention``
  (fwd and fwd+bwd), B=8, H=8, dh=64, T ∈ {1024, 2048, 4096}.
* **hdemucs_ta** — device row for the checkpoint-compatible demucs-v3
  build (hdemucs_high(compat="torchaudio")), fwd ×RT and fwd+bwd MFU.

Run on the chip (ONE process):

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r5_mfu.py [--smoke] [--only SECTION]

Sections: knee, knee_fused, knee_bf16, fused_chunk, rnnt_bf16,
bf16_chunk, scan_layers, flash_attn, hdemucs_ta.
Numbers land in docs/PERFORMANCE.md.
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.utils.timing import time_device_loop_p

PEAK_FLOPS = 197.1e12       # TPU v5e, bf16 MXU multiplies
HBM_GBPS = 819.0            # TPU v5e HBM bandwidth


def _cost(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get(
        "bytes accessed", 0.0))


def emit(name, seconds, flops, nbytes=None, extra=None):
    rec = {"metric": name, "ms": round(seconds * 1e3, 2),
           "tflops": round(flops / 1e12, 3),
           "mfu_pct": round(100.0 * flops / seconds / PEAK_FLOPS, 2)}
    if nbytes:
        gbps = nbytes / seconds / 1e9
        rec["gb_per_step"] = round(nbytes / 1e9, 3)
        rec["gbps"] = round(gbps, 1)
        rec["hbm_pct"] = round(100.0 * gbps / HBM_GBPS, 1)
        rec["bound"] = ("bandwidth" if gbps / HBM_GBPS
                        > flops / seconds / PEAK_FLOPS else "compute")
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


# ------------------------------------------------------------------ #
# batch knee with roofline                                           #
# ------------------------------------------------------------------ #

def _conformer_rnnt(smoke):
    from torchaudio_contrib_tpu.models import Conformer, RNNT
    T, U, V, L, D = (20, 5, 32, 2, 32) if smoke else \
        (250, 30, 512, 16, 256)
    enc = Conformer(input_dim=80, d_model=D, num_layers=L,
                    num_heads=4, conv_kernel=31)
    model = RNNT(enc, num_symbols=V, encoding_dim=D, joiner_dim=D,
                 predictor_embed_dim=D // 2, predictor_hidden_dim=D,
                 predictor_layers=2)
    return model, T, U, V


def bench_knee(rng, smoke):
    from torchaudio_contrib_tpu.ops import rnnt_loss
    model, T, U, V = _conformer_rnnt(smoke)
    p = model.init(jax.random.PRNGKey(0))
    for B in ((1, 2) if smoke else (32, 64, 128, 256)):
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

        try:
            fl, nb = _cost(step, p, feats)
            sec = time_device_loop_p(step, p, feats, k=8)
            emit(f"conformer_rnnt-fwdbwd-B{B}", sec, fl, nb)
        except Exception as e:
            print(json.dumps({"metric": f"conformer_rnnt-fwdbwd-B{B}",
                              "error": str(e)[:160]}), flush=True)
            break

    from torchaudio_contrib_tpu.models import HuBERTPretrainModel
    from torchaudio_contrib_tpu.models.wav2vec2 import (Wav2Vec2,
                                                        wav2vec2_base)
    if smoke:
        enc = Wav2Vec2(extractor_conv_layers=((32, 10, 5), (32, 3, 2)),
                       d_model=32, num_layers=2, num_heads=4,
                       ff_dim=64, pos_conv_kernel=16,
                       pos_conv_groups=4)
        TS, bs = 8000, (1, 2)
    else:
        enc = wav2vec2_base()
        TS, bs = 32000, (8, 16, 32, 64, 128)     # 2 s clips @ 16 kHz
    hub = HuBERTPretrainModel(enc, num_classes=100)
    hp = hub.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    for B in bs:
        x = jnp.asarray(rng.standard_normal((B, TS)) * 0.1,
                        jnp.float32)
        labels = jnp.asarray(
            rng.integers(0, 100, (B, int(enc.output_length(TS)))),
            jnp.int32)

        def step(pp, v, labels=labels):
            g = jax.grad(lambda q: hub.loss(q, key, v, labels))(pp)
            return jax.tree_util.tree_leaves(g)[0]

        try:
            fl, nb = _cost(step, hp, x)
            sec = time_device_loop_p(step, hp, x, k=8)
            emit(f"w2v2_pretrain-fwdbwd-B{B}", sec, fl, nb)
        except Exception as e:
            print(json.dumps({"metric": f"w2v2_pretrain-fwdbwd-B{B}",
                              "error": str(e)[:160]}), flush=True)
            break


def bench_knee_fused(rng, smoke):
    """Same Conformer-RNNT knee as ``bench_knee``, but through
    ``RNNT.loss`` → :func:`rnnt_loss_fused`: the ``(B, T, U+1, V)``
    joint grid is computed ``time_chunk`` frames at a time under remat
    and never stored.  The unfused knee decays past B=64 on joint-tensor
    capacity (1.0 GB fwd + cotangent at B=64) — this measures whether
    removing the lattice moves the knee and the MFU ceiling."""
    model, T, U, V = _conformer_rnnt(smoke)
    p = model.init(jax.random.PRNGKey(0))
    for B in ((1, 2) if smoke else (32, 64, 128, 256, 512)):
        feats = jnp.asarray(rng.standard_normal((B, T, 80)),
                            jnp.float32)
        tgts = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)

        def step(pp, x, tgts=tgts):
            g = jax.grad(
                lambda q, v: model.loss(q, v, tgts,
                                        reduction="mean"))(pp, x)
            return jax.tree_util.tree_leaves(g)[0]

        try:
            fl, nb = _cost(step, p, feats)
            sec = time_device_loop_p(step, p, feats, k=8)
            emit(f"conformer_rnnt_fused-fwdbwd-B{B}", sec, fl, nb)
        except Exception as e:
            print(json.dumps(
                {"metric": f"conformer_rnnt_fused-fwdbwd-B{B}",
                 "error": str(e)[:160]}), flush=True)
            break


def bench_fused_chunk(rng, smoke):
    """``rnnt_loss_fused`` time_chunk sweep at the batch sizes where
    the fused knee behaved asymmetrically (1.6× faster than unfused at
    B=32, slower past B=128): chunk ∈ {4…64} at B ∈ {32, 128, 256}
    — is the large-B falloff the chunk-scan serialization (fixable by
    a bigger chunk) or capacity of the per-chunk joint?  First pass
    measured B32 {8,16,32,64} + B128 {8,16,32}: best point tracks
    B·chunk ≈ 512 (B32→chunk16: 14.4 ms; B128→chunk8: 89.0 ms, which
    BEATS the unfused 101.6 ms).  Second pass fills the grid edges to
    pin the adaptive default."""
    model, T, U, V = _conformer_rnnt(smoke)
    p = model.init(jax.random.PRNGKey(0))
    grid = ({1: (4,)} if smoke else
            {32: (8, 16, 32, 64), 128: (4, 8, 16, 32),
             256: (2, 4, 8)})
    from torchaudio_contrib_tpu.ops import rnnt_loss
    for B, chunks in grid.items():
        feats = jnp.asarray(rng.standard_normal((B, T, 80)),
                            jnp.float32)
        tgts = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)

        # unfused anchor IN THE SAME SESSION (±10 % cross-session
        # variance makes fused-vs-unfused comparisons invalid
        # otherwise — CLAUDE.md timing rules)
        def step_unfused(pp, x, tgts=tgts):
            def loss_fn(q, v):
                logits, _ = model.joint_logits(q, v, tgts)
                return rnnt_loss(logits, tgts, blank=0,
                                 reduction="mean")
            g = jax.grad(loss_fn)(pp, x)
            return jax.tree_util.tree_leaves(g)[0]

        try:
            fl, nb = _cost(step_unfused, p, feats)
            sec = time_device_loop_p(step_unfused, p, feats, k=8)
            emit(f"rnnt_unfused-B{B}", sec, fl, nb)
        except Exception as e:
            print(json.dumps({"metric": f"rnnt_unfused-B{B}",
                              "error": str(e)[:160]}), flush=True)

        for chunk in chunks:
            def step(pp, x, tgts=tgts, chunk=chunk):
                g = jax.grad(
                    lambda q, v: model.loss(q, v, tgts,
                                            time_chunk=chunk,
                                            reduction="mean"))(pp, x)
                return jax.tree_util.tree_leaves(g)[0]

            try:
                fl, nb = _cost(step, p, feats)
                sec = time_device_loop_p(step, p, feats, k=8)
                emit(f"rnnt_fused-B{B}-chunk{chunk}", sec, fl, nb)
            except Exception as e:
                print(json.dumps(
                    {"metric": f"rnnt_fused-B{B}-chunk{chunk}",
                     "error": str(e)[:160]}), flush=True)


def bench_bf16_chunk(rng, smoke):
    """Chunk law under bf16.  The f32 sweep pinned the best
    ``time_chunk`` at ``512 // B`` — a constant per-chunk joint block.
    bf16 halves the block's bytes, so if the law is *byte*-driven the
    bf16 optimum should sit near ``1024 // B``; if it is
    element-count-driven it stays at ``512 // B``.  Probed at B=64
    (where bf16 at the f32 chunk moved nothing — serialization
    suspected) and B=128, chunks {0.5×, 1×, 2×, 4×} the f32 law."""
    from torchaudio_contrib_tpu.utils import mixed_precision
    model, T, U, V = _conformer_rnnt(smoke)
    p = model.init(jax.random.PRNGKey(0))
    grid = ({1: (4,)} if smoke else
            {64: (4, 8, 16, 32), 128: (2, 4, 8, 16)})
    for B, chunks in grid.items():
        feats = jnp.asarray(rng.standard_normal((B, T, 80)),
                            jnp.float32)
        tgts = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
        for chunk in chunks:
            def loss(pp, x, tgts=tgts, chunk=chunk):
                return model.loss(pp, x, tgts, time_chunk=chunk,
                                  reduction="mean")

            mp = mixed_precision(loss)

            def step(pp, x, mp=mp):
                g = jax.grad(mp)(pp, x)
                return jax.tree_util.tree_leaves(g)[0]

            try:
                fl, nb = _cost(step, p, feats)
                sec = time_device_loop_p(step, p, feats, k=8)
                emit(f"rnnt_fused_bf16-B{B}-chunk{chunk}", sec, fl, nb)
            except Exception as e:
                print(json.dumps(
                    {"metric": f"rnnt_fused_bf16-B{B}-chunk{chunk}",
                     "error": str(e)[:160]}), flush=True)


def bench_rnnt_bf16(rng, smoke):
    """The two levers composed: fused RNNT loss (adaptive chunk) ×
    bf16 compute (``utils.precision.mixed_precision``).  The joint
    GEMMs and the encoder run bf16; ``rnnt_loss_fused`` upcasts at the
    log-softmax so the lattice recursion stays f32.  Emits f32 vs bf16
    fused step time + loss parity per batch size."""
    from torchaudio_contrib_tpu.utils import mixed_precision
    model, T, U, V = _conformer_rnnt(smoke)
    p = model.init(jax.random.PRNGKey(0))
    for B in ((1,) if smoke else (32, 64, 128)):
        feats = jnp.asarray(rng.standard_normal((B, T, 80)),
                            jnp.float32)
        tgts = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)

        def loss_f32(pp, x, tgts=tgts):
            return model.loss(pp, x, tgts, reduction="mean")

        loss_bf16 = mixed_precision(loss_f32)
        l32 = float(jax.jit(loss_f32)(p, feats))
        l16 = float(jax.jit(loss_bf16)(p, feats))
        rel = abs(l16 - l32) / max(abs(l32), 1e-9)

        for name, fn in (("f32", loss_f32), ("bf16", loss_bf16)):
            def step(pp, x, fn=fn):
                g = jax.grad(fn)(pp, x)
                return jax.tree_util.tree_leaves(g)[0]

            try:
                fl, nb = _cost(step, p, feats)
                sec = time_device_loop_p(step, p, feats, k=8)
                emit(f"rnnt_fused-{name}-fwdbwd-B{B}", sec, fl, nb,
                     extra={"loss_rel_err": round(rel, 5)}
                     if name == "bf16" else None)
            except Exception as e:
                print(json.dumps(
                    {"metric": f"rnnt_fused-{name}-fwdbwd-B{B}",
                     "error": str(e)[:160]}), flush=True)


def bench_knee_bf16(rng, smoke):
    """Mixed-precision probe AT THE KNEE: r4 measured 'bf16 moves
    nothing' at B=4–32 where the step is latency-bound; the r5 roofline
    says HuBERT-pretrain at B≥64 is BANDWIDTH-bound (≈100 % HBM, ~90
    FLOP/B vs the 240 FLOP/B balance point) — there, halving activation
    bytes is exactly the predicted lever.  Production pattern: params
    stay f32 (optimizer-grade), cast params+inputs to bf16 inside the
    step, grads flow back to f32 through the cast.  Emits f32 vs bf16
    step time + a loss-parity check per batch size."""
    import jax.tree_util as jtu
    from torchaudio_contrib_tpu.models import HuBERTPretrainModel
    from torchaudio_contrib_tpu.models.wav2vec2 import (Wav2Vec2,
                                                        wav2vec2_base)
    if smoke:
        enc = Wav2Vec2(extractor_conv_layers=((32, 10, 5), (32, 3, 2)),
                       d_model=32, num_layers=2, num_heads=4,
                       ff_dim=64, pos_conv_kernel=16,
                       pos_conv_groups=4)
        TS, bs = 8000, (1,)
    else:
        enc = wav2vec2_base()
        TS, bs = 32000, (32, 64, 128)
    hub = HuBERTPretrainModel(enc, num_classes=100)
    hp = hub.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)

    def cast(tree, dt):
        return jtu.tree_map(
            lambda l: l.astype(dt)
            if jnp.issubdtype(l.dtype, jnp.floating) else l, tree)

    for B in bs:
        x = jnp.asarray(rng.standard_normal((B, TS)) * 0.1,
                        jnp.float32)
        labels = jnp.asarray(
            rng.integers(0, 100, (B, int(enc.output_length(TS)))),
            jnp.int32)

        def loss_f32(pp, v, labels=labels):
            return hub.loss(pp, key, v, labels)

        def loss_bf16(pp, v, labels=labels):
            # params cast INSIDE the differentiated fn: grads exit f32
            return hub.loss(cast(pp, jnp.bfloat16), key,
                            v.astype(jnp.bfloat16), labels)

        l32 = float(jax.jit(loss_f32)(hp, x))
        l16 = float(jax.jit(loss_bf16)(hp, x))
        rel = abs(l16 - l32) / max(abs(l32), 1e-9)

        for name, fn in (("f32", loss_f32), ("bf16", loss_bf16)):
            def step(pp, v, fn=fn):
                g = jax.grad(fn)(pp, v)
                return jax.tree_util.tree_leaves(g)[0]

            try:
                fl, nb = _cost(step, hp, x)
                sec = time_device_loop_p(step, hp, x, k=8)
                emit(f"w2v2_pretrain-{name}-fwdbwd-B{B}", sec, fl, nb,
                     extra={"loss_rel_err": round(rel, 5)}
                     if name == "bf16" else None)
            except Exception as e:
                print(json.dumps(
                    {"metric": f"w2v2_pretrain-{name}-fwdbwd-B{B}",
                     "error": str(e)[:160]}), flush=True)


# ------------------------------------------------------------------ #
# scan over layers                                                   #
# ------------------------------------------------------------------ #

def bench_scan_layers(rng, smoke):
    from torchaudio_contrib_tpu.models import Conformer
    B, T, L, D = (1, 20, 2, 32) if smoke else (8, 1000, 16, 256)
    enc = Conformer(input_dim=80, d_model=D, num_layers=L,
                    num_heads=4, conv_kernel=31)
    p = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)

    def layer(h, lp):
        h = enc._ffn(h, lp["ffn1"])
        h = enc._attention(h, lp["attn"], None)
        h = enc._conv_module(h, lp["conv"], None)
        h = enc._ffn(h, lp["ffn2"])
        from torchaudio_contrib_tpu.models.conformer import _layernorm
        return _layernorm(h, lp["out_ln"])

    # params rearranged once: the scan variants carry the layer stack
    # INSIDE the differentiated pytree so layer grads are real work
    p_scan = {"proj": p["proj"], "proj_b": p["proj_b"],
              "layers": jax.tree_util.tree_map(
                  lambda *ls: jnp.stack(ls), *p["layers"])}

    def fwd_loop(pp, v):
        h = v @ pp["proj"] + pp["proj_b"]
        for lp in pp["layers"]:
            h = layer(h, lp)
        return jnp.sum(h * h)

    def fwd_scan(pp, v):
        h = v @ pp["proj"] + pp["proj_b"]
        h = jax.lax.scan(lambda c, lp: (layer(c, lp), None),
                         h, pp["layers"])[0]
        return jnp.sum(h * h)

    def fwd_scan_remat(pp, v):
        # scan + per-layer remat: the composition the loop can't state
        h = v @ pp["proj"] + pp["proj_b"]
        body = jax.checkpoint(lambda c, lp: (layer(c, lp), None))
        h = jax.lax.scan(body, h, pp["layers"])[0]
        return jnp.sum(h * h)

    par = abs(float(jax.jit(fwd_loop)(p, x))
              - float(jax.jit(fwd_scan)(p_scan, x)))
    print(json.dumps({"metric": "scan_vs_loop_parity",
                      "abs_err": par}), flush=True)

    for name, fn, args in (("loop", fwd_loop, p),
                           ("scan", fwd_scan, p_scan),
                           ("scan_remat", fwd_scan_remat, p_scan)):
        if name != "scan_remat":
            fl, nb = _cost(fn, args, x)
            sec = time_device_loop_p(fn, args, x, k=8)
            emit(f"conformer_enc-fwd-{name}", sec, fl, nb)

        def step(pp, v, fn=fn):
            g = jax.grad(fn)(pp, v)
            return jnp.sum(jax.tree_util.tree_leaves(g["layers"])[0])

        fl, nb = _cost(step, args, x)
        sec = time_device_loop_p(step, args, x, k=8)
        emit(f"conformer_enc-fwdbwd-{name}", sec, fl, nb)


# ------------------------------------------------------------------ #
# fused (flash) attention                                            #
# ------------------------------------------------------------------ #

def bench_flash_attn(rng, smoke):
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
    except Exception as e:
        print(json.dumps({"metric": "flash_attn",
                          "error": f"import: {e}"[:160]}), flush=True)
        return
    B, H, dh = (1, 2, 32) if smoke else (8, 8, 64)
    for T in ((64,) if smoke else (1024, 2048, 4096)):
        q, k, v = (jnp.asarray(
            rng.standard_normal((B, H, T, dh)) * 0.1, jnp.float32)
            for _ in range(3))

        def xla_attn(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
            a = jax.nn.softmax(s, -1)
            return jnp.einsum("bhqk,bhkd->bhqd", a, v)

        def flash(q, k, v):
            return flash_attention(q, k, v, causal=False,
                                   sm_scale=1.0 / np.sqrt(dh))

        # parity first — a fast wrong kernel is worthless
        ref = xla_attn(q, k, v)
        try:
            got = flash(q, k, v)
            err = float(jnp.max(jnp.abs(got - ref)))
        except Exception as e:
            print(json.dumps({"metric": f"flash_attn-T{T}",
                              "error": str(e)[:160]}), flush=True)
            continue

        for name, fn in (("xla", xla_attn), ("flash", flash)):
            def fwd(v3, fn=fn):
                return jnp.sum(fn(q, k, v3))

            fl, nb = _cost(fwd, v)
            sec = time_device_loop_p(
                lambda _p, v3, fn=fn: jnp.sum(fn(q, k, v3)), {}, v,
                k=8)
            emit(f"attn-fwd-{name}-T{T}", sec, fl, nb,
                 extra={"parity": round(err, 7)} if name == "flash"
                 else None)

            def step(_p, v3, fn=fn):
                g = jax.grad(
                    lambda u: jnp.sum(jnp.tanh(fn(q, k, u))))(v3)
                return g

            try:
                fl, nb = _cost(step, {}, v)
                sec = time_device_loop_p(step, {}, v, k=8)
                emit(f"attn-fwdbwd-{name}-T{T}", sec, fl, nb)
            except Exception as e:
                print(json.dumps(
                    {"metric": f"attn-fwdbwd-{name}-T{T}",
                     "error": str(e)[:160]}), flush=True)


# ------------------------------------------------------------------ #
# HDemucsTA zoo row                                                  #
# ------------------------------------------------------------------ #

def bench_hdemucs_ta(rng, smoke):
    from torchaudio_contrib_tpu.models import hdemucs_high
    from torchaudio_contrib_tpu.models.hdemucs_ta import HDemucsTA
    if smoke:
        m = HDemucsTA(sources=("a", "b"), audio_channels=1, channels=4,
                      nfft=64, depth=4, norm_starts=2, norm_groups=2,
                      dconv_lstm=2, dconv_attn=2, lstm_max_steps=16)
        B, C, TS = 1, 1, 640
    else:
        m = hdemucs_high(compat="torchaudio")
        B, C, TS = 1, 2, 44100 * 5                 # 5 s stereo @44.1k
    p = m.init(jax.random.PRNGKey(3))
    mix = jnp.asarray(rng.standard_normal((B, C, TS)) * 0.1,
                      jnp.float32)

    def fwd(pp, v):
        return jnp.sum(m.apply(pp, v))

    fl, nb = _cost(fwd, p, mix)
    sec = time_device_loop_p(fwd, p, mix, k=2)
    emit("hdemucs_ta-fwd", sec, fl, nb,
         extra={"x_realtime": round(B * TS / 44100.0 / sec, 1)})

    tgt = jnp.asarray(rng.standard_normal(
        (B, len(m.sources), C, TS)) * 0.1, jnp.float32)

    def step(pp, v):
        g = jax.grad(
            lambda q: jnp.mean((m.apply(q, v) - tgt) ** 2))(pp)
        return jax.tree_util.tree_leaves(g)[0]

    try:
        fl, nb = _cost(step, p, mix)
        sec = time_device_loop_p(step, p, mix, k=2)
        emit("hdemucs_ta-fwdbwd", sec, fl, nb)
    except Exception as e:
        print(json.dumps({"metric": "hdemucs_ta-fwdbwd",
                          "error": str(e)[:160]}), flush=True)


_SECTIONS = {"knee": bench_knee,
             "knee_fused": bench_knee_fused,
             "knee_bf16": bench_knee_bf16,
             "fused_chunk": bench_fused_chunk,
             "rnnt_bf16": bench_rnnt_bf16,
             "bf16_chunk": bench_bf16_chunk,
             "scan_layers": bench_scan_layers,
             "flash_attn": bench_flash_attn,
             "hdemucs_ta": bench_hdemucs_ta}


def main(smoke=False, only=""):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} "
          f"{getattr(dev, 'device_kind', '')} peak={PEAK_FLOPS / 1e12}"
          f" TFLOP/s, HBM {HBM_GBPS} GB/s", flush=True)
    wanted = [s for s in only.split(",") if s] if only else []
    for s in wanted:
        if s not in _SECTIONS:
            raise SystemExit(
                f"--only must name sections from {sorted(_SECTIONS)}")
    for name, fn in _SECTIONS.items():
        if not wanted or name in wanted:
            print(f"# section {name}", flush=True)
            fn(rng, smoke)


if __name__ == "__main__":
    import sys
    only = ""
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    main(smoke="--smoke" in sys.argv, only=only)
