"""Sequence-parallel (time-sharded) attention for the encoder zoo.

`timeshard.py` splits the TIME axis of the STFT/mel frontend over a
mesh axis with one halo exchange; this module extends the same axis
through the transformer encoders (Conformer, Wav2Vec2), so a
minutes-long recording never materializes a full ``T×T`` attention —
or even the full ``T`` activations — on one chip.  [ref-recon: no
reference counterpart — rebuild-only; extends SURVEY §5's "long
audio" axis to the adopted model zoo.]

Design (ring attention, Liu et al. 2023 shape, pure XLA):

* Every tensor keeps its time shard ``T_local = T / n`` resident; Q
  stays put while the K/V block travels the ring, one
  ``jax.lax.ppermute`` hop per step (n−1 hops total, riding the ICI).
* Softmax is accumulated *online* (running max ``m``, normalizer
  ``l``, unnormalized output ``o``) so the result equals the
  unsharded masked softmax up to float addition order — pinned ≤1e-5
  by test, gradients included (``ppermute``/``scan`` transpose is
  exact, the backward runs the reverse ring automatically under
  autodiff).
* Masking uses the same finite ``-1e30`` fill as the unsharded
  models, so fully-padded rows degrade to the same uniform-attention
  values instead of NaN.
* Everything position-dependent (relative-position bias, padding
  masks) is computed from GLOBAL indices ``axis_index·T_local +
  arange(T_local)``, so sharded and unsharded runs see identical
  logits.

Local ops (LayerNorm, FFN, pointwise convs) run unchanged on the
shard; finite-footprint ops (depthwise conv modules, the wav2vec2
feature extractor and positional conv) get a two-sided ppermute halo
(`_halo`), mirroring the STFT halo.  The wav2vec2 BASE extractor's
GroupNorm reduces over global time — implemented with one ``psum`` of
the shard moments.  WavLM's gated relative-position bias is exact
under the ring: the per-(query, head) gate depends only on the local
shard's content and the bucket only on the global offset ``k − q``
(one static 1-D offset table instead of the (t, t) grid).
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "sp_conformer_apply", "sp_wav2vec2_apply"]

_NEG = -1e30


# --------------------------------------------------------------- #
# halo exchange (both sides)                                      #
# --------------------------------------------------------------- #

def _halo(x, axis_name: str, left: int, right: int):
    """``x (B, T_local, C)`` → ``(B, left + T_local + right, C)``:
    ``left`` trailing frames from the left neighbors and ``right``
    leading frames from the right neighbors (zeros at the mesh edges —
    exactly the zero padding the unsharded op would see).  Halos wider
    than one shard chain multiple ``ppermute`` hops; devices no source
    reaches receive ppermute's zero fill, which IS the edge padding."""
    n = jax.lax.axis_size(axis_name)
    Tl = x.shape[1]
    parts = []
    # left halo = global frames [-left, 0); the distance-j neighbor
    # holds [-j*Tl, -(j-1)*Tl) — farthest (possibly partial) first
    hops = -(-left // Tl) if left > 0 else 0
    for j in range(hops, 0, -1):
        take = min(left - (j - 1) * Tl, Tl)
        perm = [(i, i + j) for i in range(max(n - j, 0))]
        parts.append(jax.lax.ppermute(x[:, Tl - take:], axis_name, perm))
    parts.append(x)
    # right halo = global frames [Tl, Tl+right) — nearest first
    hops = -(-right // Tl) if right > 0 else 0
    for j in range(1, hops + 1):
        take = min(right - (j - 1) * Tl, Tl)
        perm = [(i, i - j) for i in range(min(j, n), n)]
        parts.append(jax.lax.ppermute(x[:, :take], axis_name, perm))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


# --------------------------------------------------------------- #
# ring attention                                                  #
# --------------------------------------------------------------- #

def ring_attention(q, k, v, axis_name: str, *,
                   lengths: Optional[jnp.ndarray] = None,
                   bias_fn: Optional[Callable] = None,
                   scale: Optional[float] = None):
    """Time-sharded multi-head attention under ``shard_map``.

    ``q, k, v (B, T_local, H, dh)`` — the local time shard's
    projections.  ``lengths (B,)`` — GLOBAL valid lengths (replicated);
    keys past them are masked with ``-1e30`` like the unsharded
    models.  ``bias_fn(q_idx (Tq,), k_idx (Tk,)) -> (H, Tq, Tk)`` or
    ``(B, H, Tq, Tk)`` adds a logit bias from global indices
    (relative-position tables; the batched form carries
    content-dependent gates — WavLM).  Returns ``(B, T_local, H, dh)``.
    """
    B, Tl, H, dh = q.shape
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    q_idx = idx * Tl + jnp.arange(Tl)

    m = jnp.full((B, H, Tl), _NEG, q.dtype)
    l = jnp.zeros((B, H, Tl), q.dtype)
    o = jnp.zeros((B, H, Tl, dh), q.dtype)
    perm = [(i, (i + 1) % n) for i in range(n)]

    kb, vb = k, v
    for step in range(n):
        owner = (idx - step) % n             # whose block we hold now
        k_idx = owner * Tl + jnp.arange(Tl)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kb) * scale
        if bias_fn is not None:
            bias = bias_fn(q_idx, k_idx)
            s = s + (bias if bias.ndim == 4 else bias[None])
        if lengths is not None:
            valid = k_idx[None] < lengths[:, None]        # (B, Tk)
            s = jnp.where(valid[:, None, None, :], s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        o = o * alpha[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vb)
        m = m_new
        if step != n - 1:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return jnp.transpose(out, (0, 2, 1, 3))          # (B, Tl, H, dh)


# --------------------------------------------------------------- #
# Conformer                                                       #
# --------------------------------------------------------------- #

def _conformer_shard(model, params, xl, lengths, axis):
    from ..models.conformer import _layernorm

    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    B, Tl, _ = xl.shape
    pos = idx * Tl + jnp.arange(Tl)
    pad_mask = None
    if lengths is not None:
        pad_mask = pos[None, :] < lengths[:, None]      # (B, Tl)

    h, dh = model.num_heads, model.d_model // model.num_heads
    maxd = model.max_distance

    def bias_fn(q_idx, k_idx, rel):
        dist = jnp.clip(k_idx[None, :] - q_idx[:, None], -maxd, maxd)
        return jnp.transpose(rel[dist + maxd], (2, 0, 1))  # (H,Tq,Tk)

    def attention(x, p):
        y = _layernorm(x, p["ln"])
        qkv = (y @ p["wqkv"] + p["bqkv"]).reshape(B, Tl, 3, h, dh)
        out = ring_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], axis,
            lengths=lengths,
            bias_fn=functools.partial(bias_fn, rel=p["rel"]))
        return x + out.reshape(B, Tl, model.d_model) @ p["wo"] + p["bo"]

    def conv_module(x, p):
        y = _layernorm(x, p["ln"])
        if pad_mask is not None:
            y = jnp.where(pad_mask[..., None], y, 0.0)
        y = jax.nn.glu(y @ p["pw1"] + p["pb1"], axis=-1)
        pad = model.conv_kernel // 2
        yp = _halo(y, axis, pad, pad)
        # global edges: the unsharded op zero-pads there; _halo already
        # delivered zeros for the first/last shard
        y = sum(yp[:, j:j + Tl] * p["dw"][j, 0]
                for j in range(model.conv_kernel)) + p["db"]
        if model.conv_norm == "affine":
            y = y * p["norm"]["g"] + p["norm"]["b"]
        else:
            y = _layernorm(y, p["norm"])
        y = jax.nn.silu(y)
        return x + y @ p["pw2"] + p["pb2"]

    def ffn(x, p):
        y = _layernorm(x, p["ln"])
        y = jax.nn.silu(y @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
        return x + 0.5 * y

    x = xl @ params["proj"] + params["proj_b"]
    for p in params["layers"]:
        x = ffn(x, p["ffn1"])
        if model.convolution_first:
            x = conv_module(x, p["conv"])
            x = attention(x, p["attn"])
        else:
            x = attention(x, p["attn"])
            x = conv_module(x, p["conv"])
        x = ffn(x, p["ffn2"])
        x = _layernorm(x, p["out_ln"])
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
    return x


def sp_conformer_apply(model, params, x, lengths=None, *,
                       mesh: Mesh, axis: str = "data"):
    """:class:`~..models.Conformer` forward with the TIME axis sharded
    over ``mesh[axis]`` — ring attention + haloed depthwise conv;
    per-shard activations are ``T/n`` long and no ``T×T`` score matrix
    ever exists on one device.  ``x (B, T, input_dim)`` with ``T``
    divisible by the axis size; output ``(B, T, d_model)`` sharded on
    time.  Equality (≤1e-5, grads included) to ``model.apply`` is
    pinned by ``tests/test_spattn.py``."""
    n = mesh.shape[axis]
    if x.shape[1] % n:
        raise ValueError(f"time length {x.shape[1]} must divide the "
                         f"'{axis}' axis size {n}; pad the tail")
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
    fn = jax.shard_map(
        lambda pp, xl, ll: _conformer_shard(model, pp, xl, ll, axis),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                  P(None, axis, None), P()),
        out_specs=P(None, axis, None))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    return fn(params, xs, jnp.asarray(lengths, jnp.int32))


# --------------------------------------------------------------- #
# Wav2Vec2                                                        #
# --------------------------------------------------------------- #

def _w2v2_shard(model, params, wl, lengths, axis):
    from ..models.wav2vec2 import _ln

    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    B, Tl = wl.shape

    # ---- feature extractor: strided VALID conv chain over a right
    # halo of (receptive_field - total_stride) samples.  Each shard
    # then emits Tl/stride frames; globally only output_length(T)
    # exist (VALID framing), so the last shard's zero-halo tail yields
    # PHANTOM frames — they are masked out of the padding mask below
    # and never reach attention (mirrors timeshard's tail-slice).
    rf, st = 1, 1
    for _, kk, ss in model.extractor:
        rf = rf + (kk - 1) * st
        st = st * ss
    T_glob = Tl * n
    y = _halo(wl[..., None], axis, 0, rf - st)
    cum, rf_cur = 1, 1             # cumulative stride / receptive field
    for p, (_, kk, ss) in zip(params["extractor"], model.extractor):
        y = jax.lax.conv_general_dilated(
            y, p["w"], (ss,), "VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32)
        rf_cur = rf_cur + (kk - 1) * cum
        cum *= ss
        if "b" in p:
            y = y + p["b"]
        if "n" in p:
            y = _ln(y, p["n"])
        elif "gn" in p:
            # unsharded GroupNorm stats run over ALL globally-existing
            # frames at this layer (incl. per-sample padding — the
            # published BASE semantics); the shard buffer additionally
            # holds halo duplicates and phantoms, so mask to the
            # frames this shard OWNS that EXIST globally and psum the
            # masked moments — bit-matching the global reduction
            frames_here = y.shape[1]
            offs = idx * (Tl // cum) + jnp.arange(frames_here)
            G = (T_glob - rf_cur) // cum + 1   # global frame count
            own = (jnp.arange(frames_here) < Tl // cum) & (offs < G)
            w8 = own.astype(y.dtype)[None, :, None]
            cnt = jax.lax.psum(jnp.sum(w8, 1), axis)       # (1, 1)
            mu = jax.lax.psum(jnp.sum(y * w8, 1), axis) / cnt
            # two-pass variance: E[(x-mu)^2] keeps f32 precision
            # (E[x^2]-E[x]^2 cancels catastrophically here)
            d = (y - mu[:, None]) * w8
            var = jax.lax.psum(jnp.sum(d * d, 1), axis) / cnt
            y = ((y - mu[:, None]) * jax.lax.rsqrt(var[:, None] + 1e-5)
                 * p["gn"]["g"] + p["gn"]["b"])
        y = jax.nn.gelu(y, approximate=False)
    feats = y                                     # (B, Tl/st, C)
    Tf = feats.shape[1]
    pos_g = idx * Tf + jnp.arange(Tf)

    # lengths is always provided by the wrapper; the padding mask also
    # retires the phantom frames (out_lengths <= output_length(T))
    out_lengths = model.output_length(lengths)
    pad_mask = pos_g[None, :] < out_lengths[:, None]
    feats = jnp.where(pad_mask[..., None], feats, 0.0)

    x = (_ln(feats, params["proj_ln"]) @ params["proj"]["w"]
         + params["proj"]["b"])
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, 0.0)

    # positional grouped conv: (k//2, (k-1)//2) halo
    xh = _halo(x, axis, model.pos_k // 2, (model.pos_k - 1) // 2)
    pos = jax.lax.conv_general_dilated(
        xh, params["pos_conv"], (1,), "VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=model.pos_groups,
        preferred_element_type=jnp.float32) + params["pos_b"]
    x = x + jax.nn.gelu(pos, approximate=False)
    if not model.layer_norm_first:
        x = _ln(x, params["enc_ln"])
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, 0.0)

    h, dh = model.num_heads, model.d_model // model.num_heads
    lens_f = out_lengths

    # WavLM: shared bucket bias gated per (query, head) from LOCAL
    # content — the gate needs only the shard's rows, the bucket only
    # the global offset k−q, so the ring stays exact.  The 1-D offset
    # table is trace-time static NumPy (same math as the unsharded
    # model's (t, t) grid).
    wavlm_bias = None
    Tf_glob = Tf * n
    if getattr(model, "num_buckets", None) is not None:
        import numpy as np
        from ..models.wav2vec2 import wavlm_buckets
        offs_1d = jnp.asarray(wavlm_buckets(
            np.arange(-(Tf_glob - 1), Tf_glob), model.num_buckets,
            model.max_distance).astype(np.int32))

        def wavlm_bias(p, y):
            gates = jax.nn.sigmoid(
                (y.reshape(B, Tf, h, dh) @ p["gru_w"] + p["gru_b"])
                .reshape(B, Tf, h, 2, 4).sum(-1))
            gate = (gates[..., 0]
                    * (gates[..., 1] * p["gru_const"][None, None, :]
                       - 1.0) + 2.0)                    # (B, Tq, H)
            gate = jnp.transpose(gate, (0, 2, 1))       # (B, H, Tq)

            def bias_fn(q_idx, k_idx, gate=gate):
                rel = k_idx[None, :] - q_idx[:, None]
                bucket = offs_1d[rel + Tf_glob - 1]     # (Tq, Tk)
                bb = jnp.transpose(params["rel_embed"][bucket],
                                   (2, 0, 1))           # (H, Tq, Tk)
                return gate[..., None] * bb[None]
            return bias_fn

    def attention(p, y):
        qkv = (y @ p["wqkv"] + p["bqkv"]).reshape(B, Tf, 3, h, dh)
        out = ring_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], axis,
            lengths=lens_f,
            bias_fn=wavlm_bias(p, y) if wavlm_bias else None)
        return out.reshape(B, Tf, model.d_model) @ p["wo"] + p["bo"]

    def ffn(q, y):
        return (jax.nn.gelu(y @ q["w1"] + q["b1"], approximate=False)
                @ q["w2"] + q["b2"])

    for p in params["layers"]:
        if model.layer_norm_first:
            x = x + attention(p, _ln(x, p["ln1"]))
            x = x + ffn(p, _ln(x, p["ln2"]))
        else:
            x = _ln(x + attention(p, x), p["ln1"])
            x = _ln(x + ffn(p, x), p["ln2"])
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
    if model.layer_norm_first:
        x = _ln(x, params["enc_ln"])
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
    if model.aux_out is not None:
        x = x @ params["aux"]["w"] + params["aux"]["b"]
    return x


def sp_wav2vec2_apply(model, params, waveforms, lengths=None, *,
                      mesh: Mesh, axis: str = "data"):
    """:class:`~..models.Wav2Vec2` forward with TIME sharded over
    ``mesh[axis]`` end to end: haloed extractor convs (+ psum'd
    GroupNorm for the BASE extractor), haloed positional conv, ring
    attention per layer; WavLM's gated relative-position bias rides
    the ring exactly (query gates are shard-local, bucket offsets are
    global — see ``_w2v2_shard``).  ``waveforms (B, T)`` with ``T``
    divisible by ``n · total_stride`` (e.g. 320·n for the published
    extractor); returns ``(out (B, T', d_or_aux) sharded on time,
    out_lengths)``."""
    n = mesh.shape[axis]
    st = 1
    for _, _, s in model.extractor:
        st *= s
    B, T = waveforms.shape
    if T % (n * st):
        raise ValueError(
            f"sample count {T} must be a multiple of axis size x "
            f"total extractor stride = {n * st}; pad the tail")
    # a padding mask always exists: it also retires the last shard's
    # phantom frames (frames a one-shot VALID extractor never emits)
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    fn = jax.shard_map(
        lambda pp, wl, ll: _w2v2_shard(model, pp, wl, ll, axis),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                  P(None, axis), P()),
        out_specs=P(None, axis, None))
    ws = jax.device_put(waveforms, NamedSharding(mesh, P(None, axis)))
    return fn(params, ws, lengths), model.output_length(lengths)
