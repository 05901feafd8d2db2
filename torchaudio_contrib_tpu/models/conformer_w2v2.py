"""Conformer-encoder wav2vec 2.0 variant (feature input).

Not in the reference (SURVEY §2 — no model zoo); mirrors torchaudio's
``prototype.models.conformer_wav2vec2_model/base`` capability
[ref-recon: torchaudio/prototype/models/_conformer_wav2vec2.py —
UNVERIFIED, mount empty]: instead of the raw-waveform conv extractor,
the front end takes acoustic FEATURES (log-mel/fbank, ``(B, T, F)``),
applies a time-reduction layer (stack ``stride`` consecutive frames),
projects to the model width, and encodes with a Conformer.  Exact
torchaudio hyperparameters are unverifiable against the empty mount;
what this class pins is the architecture family and the SSL contract.

Duck-typed to the :class:`Wav2Vec2` SSL surface (``apply(...,
frame_mask=, mask_embedding=, return_features=True)``,
``output_length``, ``d_model``, ``aux_out``), so
:class:`.hubert.HuBERTPretrainModel` composes unchanged — pass
features where it says waveforms (pinned by test).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ._common import _dense, _ln

from .conformer import Conformer

__all__ = ["ConformerWav2Vec2", "conformer_wav2vec2_model",
           "conformer_wav2vec2_base",
           "ConformerWav2Vec2PretrainModel",
           "conformer_wav2vec2_pretrain_model",
           "conformer_wav2vec2_pretrain_base",
           "conformer_wav2vec2_pretrain_large"]


class ConformerWav2Vec2:
    """``apply(params, features (B, T, feature_dim), lengths=None)``
    → ``(encodings (B, T//stride, d_model) [or logits if aux_out],
    out_lengths)``."""

    def __init__(self, feature_dim: int = 64, stride: int = 4,
                 d_model: int = 256, num_layers: int = 12,
                 num_heads: int = 4, ff_ratio: int = 4,
                 conv_kernel: int = 31,
                 aux_out: Optional[int] = None):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.feature_dim = feature_dim
        self.stride = stride
        self.d_model = d_model
        self.aux_out = aux_out
        self.encoder = Conformer(input_dim=d_model, d_model=d_model,
                                 num_layers=num_layers,
                                 num_heads=num_heads,
                                 ff_ratio=ff_ratio,
                                 conv_kernel=conv_kernel)
        self._config = (feature_dim, stride, d_model, num_layers,
                        num_heads, ff_ratio, conv_kernel, aux_out)

    def output_length(self, length):
        """Reduced frame count for an input feature-frame count."""
        return length // self.stride

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cin = self.feature_dim * self.stride
        p = {"proj_ln": {"g": jnp.ones((cin,)),
                         "b": jnp.zeros((cin,))},
             "proj": {"w": _dense(k1, cin, self.d_model),
                      "b": jnp.zeros((self.d_model,))},
             "encoder": self.encoder.init(k2)}
        if self.aux_out is not None:
            p["aux"] = {"w": _dense(k3, self.d_model, self.aux_out),
                        "b": jnp.zeros((self.aux_out,))}
        return p

    def apply(self, params, features, lengths=None, *,
              frame_mask=None, mask_embedding=None,
              return_features=False):
        features = jnp.asarray(features)
        if features.ndim != 3 or features.shape[-1] != self.feature_dim:
            raise ValueError(
                f"features must be (batch, time, {self.feature_dim})")
        b, t, f = features.shape
        tr = t // self.stride
        if tr < 1:
            raise ValueError("need at least `stride` feature frames")
        # time reduction: stack `stride` consecutive frames
        feats = features[:, :tr * self.stride].reshape(
            b, tr, f * self.stride)
        out_lengths = jnp.full((b,), tr, jnp.int32)
        pad_mask = None
        if lengths is not None:
            out_lengths = self.output_length(
                jnp.asarray(lengths, jnp.int32))
            pad_mask = (jnp.arange(tr)[None, :]
                        < out_lengths[:, None])
            feats = jnp.where(pad_mask[..., None], feats, 0.0)

        x = (_ln(feats, params["proj_ln"]) @ params["proj"]["w"]
             + params["proj"]["b"])
        if frame_mask is not None:
            if mask_embedding is None:
                raise ValueError("frame_mask needs mask_embedding")
            x = jnp.where(frame_mask[..., None], mask_embedding, x)
        x = self.encoder.apply(params["encoder"], x,
                               lengths=out_lengths
                               if lengths is not None else None)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        if self.aux_out is not None:
            x = x @ params["aux"]["w"] + params["aux"]["b"]
        if return_features:
            return x, out_lengths, feats
        return x, out_lengths

    def __call__(self, params, features, lengths=None):
        return self.apply(params, features, lengths)


def conformer_wav2vec2_model(**kwargs) -> ConformerWav2Vec2:
    """Generic constructor — all :class:`ConformerWav2Vec2` kwargs."""
    return ConformerWav2Vec2(**kwargs)


def conformer_wav2vec2_base(aux_out: Optional[int] = None
                            ) -> ConformerWav2Vec2:
    """Base configuration: 64-dim features, 4× time reduction,
    12 Conformer layers at width 256."""
    return ConformerWav2Vec2(aux_out=aux_out)


class ConformerWav2Vec2PretrainModel:
    """Masked-prediction pretraining wrapper around
    :class:`ConformerWav2Vec2` (torchaudio's
    ``prototype.models.ConformerWav2Vec2PretrainModel`` capability
    [ref-recon: torchaudio/prototype/models/_conformer_wav2vec2.py —
    UNVERIFIED, mount empty]): the encoder plus a learned mask
    embedding and a span-mask generator.  ``apply(params, key,
    features, lengths=None)`` samples wav2vec2-style span masks over
    the valid reduced frames, replaces masked encoder inputs with the
    mask embedding, and returns ``(encodings, out_lengths, frame_mask,
    unmasked_features)`` — everything a contrastive or cluster-CE
    pretraining loss consumes (for the full HuBERT loss, compose
    :class:`.hubert.HuBERTPretrainModel` with the same encoder
    instead; this wrapper is the loss-agnostic masked forward).
    """

    def __init__(self, encoder: ConformerWav2Vec2,
                 mask_prob: float = 0.065, mask_span: int = 10):
        if encoder.aux_out is not None:
            raise ValueError("pretraining encoder must have "
                             "aux_out=None (the head would hide the "
                             "representations)")
        if not 0.0 < mask_prob <= 1.0:
            raise ValueError("mask_prob must be in (0, 1]")
        if mask_span < 1:
            raise ValueError("mask_span must be >= 1")
        self.encoder = encoder
        self.mask_prob = mask_prob
        self.mask_span = mask_span

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1),
                "mask_emb": 0.1 * jax.random.normal(
                    k2, (self.encoder.d_model,))}

    def apply(self, params, key, features, lengths=None,
              frame_mask=None):
        """Masked forward.  ``frame_mask (B, T//stride) bool``
        overrides the sampled mask (then ``key`` may be ``None``);
        ``key`` is consumed iff ``frame_mask`` is None."""
        from .hubert import span_mask
        features = jnp.asarray(features)
        b = features.shape[0]
        t_out = int(self.encoder.output_length(features.shape[1]))
        out_lengths = None if lengths is None else \
            self.encoder.output_length(jnp.asarray(lengths, jnp.int32))
        if frame_mask is None:
            if key is None:
                raise ValueError("need key when frame_mask is None")
            frame_mask = span_mask(key, b, t_out, out_lengths,
                                   mask_prob=self.mask_prob,
                                   mask_span=self.mask_span)
        enc, out_lengths, feats = self.encoder.apply(
            params["encoder"], features, lengths,
            frame_mask=frame_mask,
            mask_embedding=params["mask_emb"],
            return_features=True)
        return enc, out_lengths, frame_mask, feats

    def __call__(self, params, key, features, lengths=None):
        return self.apply(params, key, features, lengths)


def conformer_wav2vec2_pretrain_model(
        mask_prob: float = 0.065, mask_span: int = 10,
        **kwargs) -> ConformerWav2Vec2PretrainModel:
    """Generic constructor — encoder kwargs pass through to
    :class:`ConformerWav2Vec2`."""
    return ConformerWav2Vec2PretrainModel(
        ConformerWav2Vec2(**kwargs), mask_prob=mask_prob,
        mask_span=mask_span)


def conformer_wav2vec2_pretrain_base(
        **kwargs) -> ConformerWav2Vec2PretrainModel:
    """Pretraining wrapper at the base scale (64-dim features,
    12 layers × 256)."""
    return conformer_wav2vec2_pretrain_model(**kwargs)


def conformer_wav2vec2_pretrain_large(
        **kwargs) -> ConformerWav2Vec2PretrainModel:
    """Pretraining wrapper at the large scale (12 layers × 768,
    8 heads) [family pinned; hyperparameters UNVERIFIED — mount
    empty]."""
    kwargs.setdefault("d_model", 768)
    kwargs.setdefault("num_heads", 8)
    return conformer_wav2vec2_pretrain_model(**kwargs)
