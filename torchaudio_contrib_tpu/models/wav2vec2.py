"""Wav2Vec2 acoustic encoder (Baevski et al. 2020) — pure-functional.

Not in the reference (SURVEY §2 — no model zoo); mirrors torchaudio's
``models.wav2vec2_model`` capability: strided conv feature extractor
(raw waveform → ~50 Hz frames) → feature projection → transformer
encoder with a grouped-conv relative positional embedding; an optional
``aux_out`` linear head makes it a CTC fine-tuning model (torchaudio's
``wav2vec2_*`` + ``aux`` layout).

TPU notes: the extractor is 7 MXU convs; the conv positional embedding
is one grouped conv; attention/FFN are the usual GEMMs with key-side
padding masks.  Lengths propagate through the conv stack with the
exact floor formula so padded batches give identical valid outputs
(pinned by test).  Layernorm everywhere (the "layer_norm" extractor
variant — torchaudio's default "group_norm" base config keeps running
stats out anyway, but layer_norm avoids any normalization over padded
frames leaking across the batch).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ._common import _dense, _conv, _ln, _ln_p

__all__ = ["Wav2Vec2", "wav2vec2_base", "wav2vec2_large",
           "hubert_base", "hubert_large", "hubert_xlarge"]


class Wav2Vec2:
    """``apply(params, waveforms (B, T), lengths=None)`` →
    ``(features (B, T', d_model) [or logits if aux_out], out_lengths)``.

    ``extractor_conv_layers`` is ``((channels, kernel, stride), ...)``
    — the default is the standard wav2vec2 stack (total stride 320,
    i.e. 20 ms frames at 16 kHz).
    """

    _DEFAULT_EXTRACTOR = ((512, 10, 5), (512, 3, 2), (512, 3, 2),
                          (512, 3, 2), (512, 3, 2), (512, 2, 2),
                          (512, 2, 2))

    def __init__(self, extractor_conv_layers: Sequence[Tuple[int, int, int]]
                 = _DEFAULT_EXTRACTOR, d_model: int = 768,
                 num_layers: int = 12, num_heads: int = 12,
                 ff_dim: int = 3072, pos_conv_kernel: int = 128,
                 pos_conv_groups: int = 16,
                 aux_out: Optional[int] = None):
        if d_model % num_heads:
            raise ValueError("d_model must be divisible by num_heads")
        if d_model % pos_conv_groups:
            raise ValueError(
                "d_model must be divisible by pos_conv_groups")
        self.extractor = tuple(tuple(l) for l in extractor_conv_layers)
        self.d_model = d_model
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.ff_dim = ff_dim
        self.pos_k = pos_conv_kernel
        self.pos_groups = pos_conv_groups
        self.aux_out = aux_out
        self._config = (self.extractor, d_model, num_layers, num_heads,
                        ff_dim, pos_conv_kernel, pos_conv_groups,
                        aux_out)

    def init(self, key):
        keys = iter(jax.random.split(
            key, 3 + len(self.extractor) + 4 * self.num_layers))
        cin = 1
        ext = []
        for cout, k, s in self.extractor:
            ext.append({"w": _conv(next(keys), k, cin, cout),
                        "n": _ln_p(cout)})
            cin = cout
        d = self.d_model
        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "ln1": _ln_p(d),
                "wqkv": _dense(next(keys), d, 3 * d),
                "bqkv": jnp.zeros((3 * d,)),
                "wo": _dense(next(keys), d, d),
                "bo": jnp.zeros((d,)),
                "ln2": _ln_p(d),
                "w1": _dense(next(keys), d, self.ff_dim),
                "b1": jnp.zeros((self.ff_dim,)),
                "w2": _dense(next(keys), self.ff_dim, d),
                "b2": jnp.zeros((d,)),
            })
        p = {
            "extractor": ext,
            "proj_ln": _ln_p(cin),
            "proj": {"w": _dense(next(keys), cin, d),
                     "b": jnp.zeros((d,))},
            "pos_conv": _conv(next(keys), self.pos_k,
                              d // self.pos_groups, d),
            "pos_b": jnp.zeros((d,)),
            "enc_ln": _ln_p(d),
            "layers": layers,
        }
        if self.aux_out is not None:
            p["aux"] = {"w": _dense(next(keys), d, self.aux_out),
                        "b": jnp.zeros((self.aux_out,))}
        return p

    def output_length(self, length):
        """Frame count produced for an input sample count (exact)."""
        for _, k, s in self.extractor:
            length = (length - k) // s + 1
        return length

    def _extract(self, params, x):
        y = x[..., None]                              # (B, T, 1)
        for p, (_, k, s) in zip(params["extractor"], self.extractor):
            y = jax.lax.conv_general_dilated(
                y, p["w"], (s,), "VALID",
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32)
            y = jax.nn.gelu(_ln(y, p["n"]))
        return y

    def _attention(self, p, x, pad_mask):
        b, t, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = (x @ p["wqkv"] + p["bqkv"]).reshape(b, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if pad_mask is not None:
            logits = jnp.where(pad_mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return out @ p["wo"] + p["bo"]

    def apply(self, params, waveforms, lengths=None, *,
              frame_mask=None, mask_embedding=None,
              return_features=False):
        """Optional SSL-pretraining hooks: ``frame_mask (B, T') bool``
        + ``mask_embedding (d_model,)`` replace the projected features
        at masked frames with the learned mask token (HuBERT/wav2vec2
        masked prediction); ``return_features=True`` additionally
        returns the raw extractor output (for the feature penalty)."""
        waveforms = jnp.asarray(waveforms)
        if waveforms.ndim != 2:
            raise ValueError("waveforms must be (batch, time)")
        feats = self._extract(params, waveforms)      # (B, T', C)
        t_out = feats.shape[1]
        pad_mask = None
        out_lengths = jnp.full((waveforms.shape[0],), t_out, jnp.int32)
        if lengths is not None:
            out_lengths = self.output_length(
                jnp.asarray(lengths, jnp.int32))
            pad_mask = (jnp.arange(t_out)[None, :]
                        < out_lengths[:, None])
            feats = jnp.where(pad_mask[..., None], feats, 0.0)

        x = (_ln(feats, params["proj_ln"]) @ params["proj"]["w"]
             + params["proj"]["b"])
        if frame_mask is not None:
            if mask_embedding is None:
                raise ValueError("frame_mask needs mask_embedding")
            x = jnp.where(frame_mask[..., None], mask_embedding, x)
        # Padded frames of x are NOT zero (feats there are zero, but
        # _ln(0) = proj_ln.b so x_pad = proj_ln.b @ W + proj.b once
        # trained) — zero them so the positional conv's receptive
        # field sees exactly the zeros its own edge padding supplies,
        # keeping outputs independent of the padded length.
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        # grouped-conv positional embedding (wav2vec2's relative pos)
        pos = jax.lax.conv_general_dilated(
            x, params["pos_conv"], (1,),
            [((self.pos_k - 1) // 2, self.pos_k // 2)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=self.pos_groups,
            preferred_element_type=jnp.float32) + params["pos_b"]
        x = _ln(x + jax.nn.gelu(pos), params["enc_ln"])
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        for p in params["layers"]:
            x = x + self._attention(p, _ln(x, p["ln1"]), pad_mask)
            y = _ln(x, p["ln2"])
            x = x + jax.nn.gelu(y @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
            if pad_mask is not None:
                x = jnp.where(pad_mask[..., None], x, 0.0)
        if self.aux_out is not None:
            x = x @ params["aux"]["w"] + params["aux"]["b"]
        if return_features:
            return x, out_lengths, feats
        return x, out_lengths

    def __call__(self, params, waveforms, lengths=None):
        return self.apply(params, waveforms, lengths)


# -- standard configurations (torchaudio's wav2vec2_*/hubert_* zoo) --
def wav2vec2_base(aux_out: Optional[int] = None) -> Wav2Vec2:
    """BASE: 12 layers, d 768, 12 heads, FFN 3072 (95 M params)."""
    return Wav2Vec2(aux_out=aux_out)


def wav2vec2_large(aux_out: Optional[int] = None) -> Wav2Vec2:
    """LARGE: 24 layers, d 1024, 16 heads, FFN 4096 (317 M params)."""
    return Wav2Vec2(d_model=1024, num_layers=24, num_heads=16,
                    ff_dim=4096, aux_out=aux_out)


def hubert_base(aux_out: Optional[int] = None) -> Wav2Vec2:
    """HuBERT BASE — same encoder architecture as wav2vec2 BASE; the
    HuBERT-ness is the pretraining objective (`HuBERTPretrainModel`)."""
    return Wav2Vec2(aux_out=aux_out)


def hubert_large(aux_out: Optional[int] = None) -> Wav2Vec2:
    return Wav2Vec2(d_model=1024, num_layers=24, num_heads=16,
                    ff_dim=4096, aux_out=aux_out)


def hubert_xlarge(aux_out: Optional[int] = None) -> Wav2Vec2:
    """XLARGE: 48 layers, d 1280, 16 heads, FFN 5120 (~1 B params)."""
    return Wav2Vec2(d_model=1280, num_layers=48, num_heads=16,
                    ff_dim=5120, aux_out=aux_out)
