"""HuBERT masked-prediction pretraining (Hsu et al. 2021).

Not in the reference (SURVEY §2 — torchaudio-contrib has no model
zoo); mirrors torchaudio's ``models.HuBERTPretrainModel`` capability:
a ``Wav2Vec2`` encoder run with span-masked projected features (a
learned mask token replaces masked frames), a final projection, and
cosine-similarity logits against learned per-cluster label embeddings;
the loss is cross-entropy against offline cluster assignments
(k-means on MFCC or earlier-iteration features), evaluated separately
over masked and unmasked frames, plus an L2 feature penalty on the
extractor output.

TPU-first notes: span masking is sampled with one Bernoulli draw per
frame followed by a ``reduce_window`` max dilation — no host loop, no
dynamic shapes, vmappable over batch; everything downstream is the
encoder's existing GEMM path, and the logit step is one ``(B·T, F) ×
(F, C)`` matmul on normalized vectors.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .wav2vec2 import Wav2Vec2

__all__ = ["span_mask", "HuBERTPretrainModel"]


def span_mask(key, batch_size: int, num_frames: int, lengths=None,
              mask_prob: float = 0.065, mask_span: int = 10):
    """Sample HuBERT/wav2vec2-style span masks ``(B, T) bool``.

    Each valid frame is a span *start* with probability ``mask_prob``;
    a start at ``s`` masks ``[s, s + mask_span)``.  Expected coverage
    is ≈ ``mask_prob * mask_span`` (the defaults give ~49 % after
    overlap, matching HuBERT's p=0.08/l=10 ballpark).  Starts are only
    sampled where the whole span fits inside ``lengths`` so masks
    never cross into padding.
    """
    starts = jax.random.uniform(key, (batch_size, num_frames))
    starts = starts < mask_prob
    limit = num_frames - mask_span + 1 if lengths is None else \
        jnp.asarray(lengths, jnp.int32)[:, None] - mask_span + 1
    starts = starts & (jnp.arange(num_frames)[None] < limit)
    # dilate: frame t is masked iff a start lies in (t-span, t]
    mask = jax.lax.reduce_window(
        starts.astype(jnp.float32), 0.0, jax.lax.max,
        (1, mask_span), (1, 1), ((0, 0), (mask_span - 1, 0)))
    return mask > 0.0


class HuBERTPretrainModel:
    """``apply(params, key, waveforms, lengths=None, frame_mask=None)``
    → ``(logits (B, T', C), frame_mask (B, T'), out_lengths, features)``;
    ``loss(params, key, waveforms, labels, lengths=None, ...)`` →
    scalar masked-prediction objective.

    ``labels (B, T')`` are the offline cluster assignments aligned to
    the encoder frame rate (ignore index < 0 allowed, e.g. for
    padding).  ``num_classes`` is the cluster count (100 for the
    MFCC-kmeans first iteration, 500 for later iterations in the
    paper's recipe).
    """

    def __init__(self, encoder: Wav2Vec2, num_classes: int,
                 final_dim: int = 256, mask_prob: float = 0.065,
                 mask_span: int = 10, temperature: float = 0.1,
                 masked_weight: float = 1.0,
                 unmasked_weight: float = 0.0,
                 feature_penalty: float = 10.0):
        if encoder.aux_out is not None:
            raise ValueError("pretraining encoder must have aux_out="
                             "None (the aux head is for fine-tuning)")
        self.encoder = encoder
        self.num_classes = num_classes
        self.final_dim = final_dim
        self.mask_prob = mask_prob
        self.mask_span = mask_span
        self.tau = temperature
        self.w_m = masked_weight
        self.w_u = unmasked_weight
        self.w_f = feature_penalty

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        d, f = self.encoder.d_model, self.final_dim
        s = math.sqrt(6.0 / (d + f))
        return {
            "encoder": self.encoder.init(k1),
            "mask_emb": jax.random.uniform(k2, (d,), jnp.float32,
                                           -0.1, 0.1),
            "final_proj": {"w": jax.random.uniform(
                k3, (d, f), jnp.float32, -s, s),
                "b": jnp.zeros((f,))},
            "label_emb": 0.02 * jax.random.normal(
                k4, (self.num_classes, f)),
        }

    def apply(self, params, key, waveforms, lengths=None,
              frame_mask=None):
        """Masked forward.  ``frame_mask`` overrides the sampled mask
        (pass the same mask to compare runs); ``key`` may be ``None``
        iff ``frame_mask`` is given."""
        B = waveforms.shape[0]
        t_out = int(self.encoder.output_length(waveforms.shape[1]))
        out_lengths = None if lengths is None else \
            self.encoder.output_length(jnp.asarray(lengths, jnp.int32))
        if frame_mask is None:
            if key is None:
                raise ValueError("need key when frame_mask is None")
            frame_mask = span_mask(key, B, t_out, out_lengths,
                                   self.mask_prob, self.mask_span)
        x, out_lengths, feats = self.encoder.apply(
            params["encoder"], waveforms, lengths,
            frame_mask=frame_mask, mask_embedding=params["mask_emb"],
            return_features=True)
        proj = x @ params["final_proj"]["w"] + params["final_proj"]["b"]
        # cosine-similarity logits against label embeddings
        proj = proj / (jnp.linalg.norm(proj, axis=-1,
                                       keepdims=True) + 1e-8)
        emb = params["label_emb"]
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True)
                     + 1e-8)
        logits = proj @ emb.T / self.tau           # (B, T', C)
        return logits, frame_mask, out_lengths, feats

    def loss(self, params, key, waveforms, labels, lengths=None,
             frame_mask=None):
        """Scalar objective: ``w_m``·CE(masked) + ``w_u``·CE(unmasked)
        + ``w_f``·mean(features²).  ``labels < 0`` are ignored."""
        logits, frame_mask, out_lengths, feats = self.apply(
            params, key, waveforms, lengths, frame_mask)
        labels = jnp.asarray(labels, jnp.int32)
        valid = labels >= 0
        if out_lengths is not None:
            valid = valid & (jnp.arange(logits.shape[1])[None]
                             < out_lengths[:, None])
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(
            logp, jnp.clip(labels, 0)[..., None], axis=-1)[..., 0]

        def _mean(mask):
            w = (mask & valid).astype(jnp.float32)
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        out = self.w_m * _mean(frame_mask)
        if self.w_u:
            out = out + self.w_u * _mean(~frame_mask)
        if self.w_f:
            if out_lengths is None:
                pen = jnp.mean(feats ** 2)
            else:  # average over valid frames only (padding-invariant)
                vf = (jnp.arange(feats.shape[1])[None]
                      < out_lengths[:, None]).astype(feats.dtype)
                pen = jnp.sum(feats ** 2 * vf[..., None]) \
                    / (jnp.maximum(jnp.sum(vf), 1.0) * feats.shape[-1])
            out = out + self.w_f * pen
        return out
