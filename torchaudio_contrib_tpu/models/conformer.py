"""Conformer encoder (Gulati et al. 2020) — pure-functional JAX.

Not in the reference (SURVEY §2 — the reference has no model zoo);
mirrors torchaudio's ``models.Conformer`` capability: a
length-masked encoder over frame features, the standard backbone in
front of CTC/RNN-T losses (both provided by this library — see
``ops/rnnt.py``, ``ops/ctcdecode.py``).

TPU-first choices:

* Everything is GEMMs: QKV/out projections, macaron FFNs and the two
  pointwise convs are ``(B·T, D)`` matmuls; the depthwise conv is one
  ``lax.conv_general_dilated`` with ``feature_group_count=D``.  All
  static shapes — one jitted program per (B, T) bucket.
* Relative position is a learned per-head bias over clipped signed
  distances (T5-style), added to the attention logits: O(T²) read of a
  tiny table instead of Transformer-XL's extra GEMM per layer — the
  MXU time goes to the score/value products.
* Padding: ``lengths`` masks attention scores AND zeroes padded frames
  between blocks, so a bucketed batch gives identical valid outputs
  regardless of padding (pinned by test).
* Norm: layernorm everywhere by default, including the conv module,
  instead of the paper's batchnorm — batchnorm's running stats are
  mutable state, which the library's pure/immutable contract excludes.
  ``conv_norm="affine"`` switches the conv-module norm to a frozen
  per-channel affine (``y·g + b`` — BatchNorm1d's inference form, the
  exact target of ``utils.import_torch._fold_bn``), making the layer
  weight-compatible with torchaudio's ``models.Conformer``
  (torch-replica forward parity pinned in
  ``tests/test_import_torch_extra.py``).  Zeroing the ``rel`` bias
  table makes the attention exactly plain MHA (torchaudio's Conformer
  has no relative-position term); ``convolution_first=True`` mirrors
  torchaudio's flag of the same name.
* Deterministic: no dropout (augment inputs with SpecAugment instead —
  ``ops/augment.py``).  Params are an explicit pytree; ``init`` /
  ``apply`` follow ``MelFrontendClassifier``'s idiom.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ._common import _dense, _ln as _layernorm, _ln_p as _ln_params

__all__ = ["Conformer", "ConformerTranscriber"]


def _glorot(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    s = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -s, s)


class Conformer:
    """Masked Conformer encoder: ``apply(params, x (B, T, D_in),
    lengths=None) -> (B, T, d_model)``.

    Blocks: ½FFN → MHSA(+relative-position bias) → conv module
    (pointwise·GLU → depthwise(k) → LN → swish → pointwise) → ½FFN →
    LN, each residual.  ``max_distance`` clips the signed relative
    distance for the shared-table position bias.
    """

    def __init__(self, input_dim: int, d_model: int = 256,
                 num_layers: int = 4, num_heads: int = 4,
                 ff_ratio: int = 4, conv_kernel: int = 31,
                 max_distance: int = 128,
                 conv_norm: str = "layernorm",
                 convolution_first: bool = False):
        if d_model % num_heads:
            raise ValueError("d_model must divide num_heads")
        if conv_kernel % 2 == 0:
            raise ValueError("conv_kernel must be odd")
        if conv_norm not in ("layernorm", "affine"):
            raise ValueError("conv_norm must be 'layernorm' or "
                             f"'affine', got {conv_norm!r}")
        self.input_dim = input_dim
        self.d_model = d_model
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.ff_dim = ff_ratio * d_model
        self.conv_kernel = conv_kernel
        self.max_distance = max_distance
        self.conv_norm = conv_norm
        self.convolution_first = convolution_first
        self._config = (input_dim, d_model, num_layers, num_heads,
                        ff_ratio, conv_kernel, max_distance,
                        conv_norm, convolution_first)

    # -- params ----------------------------------------------------------
    def init(self, key):
        d, f, h = self.d_model, self.ff_dim, self.num_heads
        keys = iter(jax.random.split(key, 6 + 12 * self.num_layers))

        def ffn():
            return {"ln": _ln_params(d),
                    "w1": _glorot(next(keys), (d, f)),
                    "b1": jnp.zeros((f,)),
                    "w2": _glorot(next(keys), (f, d)),
                    "b2": jnp.zeros((d,))}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "ffn1": ffn(),
                "attn": {
                    "ln": _ln_params(d),
                    "wqkv": _glorot(next(keys), (d, 3 * d)),
                    "bqkv": jnp.zeros((3 * d,)),
                    "wo": _glorot(next(keys), (d, d)),
                    "bo": jnp.zeros((d,)),
                    "rel": 0.02 * jax.random.normal(
                        next(keys), (2 * self.max_distance + 1, h)),
                },
                "conv": {
                    "ln": _ln_params(d),
                    "pw1": _glorot(next(keys), (d, 2 * d)),
                    "pb1": jnp.zeros((2 * d,)),
                    "dw": 0.1 * jax.random.normal(
                        next(keys), (self.conv_kernel, 1, d)),
                    "db": jnp.zeros((d,)),
                    "norm": _ln_params(d),
                    "pw2": _glorot(next(keys), (d, d)),
                    "pb2": jnp.zeros((d,)),
                },
                "ffn2": ffn(),
                "out_ln": _ln_params(d),
            })
        return {"proj": _glorot(next(keys), (self.input_dim, d)),
                "proj_b": jnp.zeros((d,)),
                "layers": layers}

    # -- blocks ----------------------------------------------------------
    def _ffn(self, x, p):
        y = _layernorm(x, p["ln"])
        y = jax.nn.silu(y @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
        return x + 0.5 * y

    def _attention(self, x, p, pad_mask):
        b, t, d = x.shape
        h = self.num_heads
        hd = d // h
        y = _layernorm(x, p["ln"])
        qkv = (y @ p["wqkv"] + p["bqkv"]).reshape(b, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        # shared T5-style relative bias table, clipped distance
        dist = jnp.clip(jnp.arange(t)[None, :] - jnp.arange(t)[:, None],
                        -self.max_distance, self.max_distance)
        logits = logits + jnp.transpose(
            p["rel"][dist + self.max_distance], (2, 0, 1))[None]
        if pad_mask is not None:
            logits = jnp.where(pad_mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return x + out @ p["wo"] + p["bo"]

    def _conv_module(self, x, p, pad_mask):
        y = _layernorm(x, p["ln"])
        if pad_mask is not None:
            y = jnp.where(pad_mask[..., None], y, 0.0)
        y = jax.nn.glu(y @ p["pw1"] + p["pb1"], axis=-1)
        # depthwise conv as kernel-tap shifted multiply-adds: same VPU
        # work as feature_group_count=D on TPU (depthwise never uses
        # the MXU), but its VJP is plain elementwise ops — the grouped
        # conv's batch_group_count VJP mis-partitions under GSPMD when
        # the batch axis is mesh-sharded (grad doubled by the spare
        # mesh axis; repro pinned in tests/test_tp.py).
        pad = self.conv_kernel // 2
        T = y.shape[1]
        yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
        y = sum(yp[:, j:j + T] * p["dw"][j, 0]
                for j in range(self.conv_kernel)) + p["db"]
        if self.conv_norm == "affine":
            y = y * p["norm"]["g"] + p["norm"]["b"]
        else:
            y = _layernorm(y, p["norm"])
        y = jax.nn.silu(y)
        return x + y @ p["pw2"] + p["pb2"]

    # -- forward ---------------------------------------------------------
    def apply(self, params, x, lengths: Optional[jnp.ndarray] = None):
        x = jnp.asarray(x)
        if x.ndim != 3 or x.shape[-1] != self.input_dim:
            raise ValueError(
                f"x must be (batch, time, {self.input_dim})")
        pad_mask = None
        if lengths is not None:
            lengths = jnp.asarray(lengths, jnp.int32)
            pad_mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        x = x @ params["proj"] + params["proj_b"]
        for p in params["layers"]:
            x = self._ffn(x, p["ffn1"])
            if self.convolution_first:
                x = self._conv_module(x, p["conv"], pad_mask)
                x = self._attention(x, p["attn"], pad_mask)
            else:
                x = self._attention(x, p["attn"], pad_mask)
                x = self._conv_module(x, p["conv"], pad_mask)
            x = self._ffn(x, p["ffn2"])
            x = _layernorm(x, p["out_ln"])
            if pad_mask is not None:
                x = jnp.where(pad_mask[..., None], x, 0.0)
        return x

    def __call__(self, params, x, lengths=None):
        return self.apply(params, x, lengths)

    def num_params(self, params):
        return sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))


class ConformerTranscriber:
    """torchaudio's prototype ``_ConformerEncoder`` geometry as an RNNT
    transcriber [ref-recon: torchaudio prototype/models/rnnt.py
    ``_ConformerEncoder`` — UNVERIFIED, mount empty]:

    stride-``s`` time reduction (frame stacking; trailing remainder
    frames dropped, torchaudio ``_TimeReduction`` semantics) →
    input linear + Conformer (the house Conformer's built-in input
    projection IS that linear: ``input_dim·s → conformer_input_dim``)
    → output linear → LayerNorm, emitting ``output_dim``-wide
    encodings at ``lengths // s``.

    Behavioral divergences from the torch prototype (no published
    checkpoint exists to match): the conv-module norm is LayerNorm
    rather than GroupNorm(1), and attention carries the house
    relative-position bias (zero-initialized → plain MHA at init).
    ``convolution_first=True`` matches the prototype's block order.
    """

    def __init__(self, *, input_dim: int, output_dim: int,
                 time_reduction_stride: int,
                 conformer_input_dim: int, conformer_ffn_dim: int,
                 conformer_num_layers: int, conformer_num_heads: int,
                 conformer_depthwise_conv_kernel_size: int = 31):
        if conformer_ffn_dim % conformer_input_dim:
            raise ValueError(
                "conformer_ffn_dim must be a multiple of "
                f"conformer_input_dim (got {conformer_ffn_dim} vs "
                f"{conformer_input_dim})")
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.stride = time_reduction_stride
        self.d = conformer_input_dim
        self.conformer = Conformer(
            input_dim=input_dim * time_reduction_stride,
            d_model=conformer_input_dim,
            num_layers=conformer_num_layers,
            num_heads=conformer_num_heads,
            ff_ratio=conformer_ffn_dim // conformer_input_dim,
            conv_kernel=conformer_depthwise_conv_kernel_size,
            convolution_first=True)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"conformer": self.conformer.init(k1),
                "out_lin": {"w": _dense(k2, self.d, self.output_dim),
                            "b": jnp.zeros((self.output_dim,))},
                "out_ln": _ln_params(self.output_dim)}

    def apply(self, params, x, lengths=None):
        x = jnp.asarray(x)
        if x.ndim != 3 or x.shape[-1] != self.input_dim:
            raise ValueError(
                f"x must be (batch, time, {self.input_dim})")
        B, T, D = x.shape
        s = self.stride
        T_red = T // s
        if T_red < 1:
            raise ValueError(
                f"need at least {s} input frames (got {T})")
        y = x[:, :T_red * s].reshape(B, T_red, D * s)
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        red_lengths = lengths.astype(jnp.int32) // s
        h = self.conformer.apply(params["conformer"], y, red_lengths)
        out = _layernorm(h @ params["out_lin"]["w"]
                         + params["out_lin"]["b"], params["out_ln"])
        return out, red_lengths
