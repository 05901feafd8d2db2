"""Emformer-encoder HuBERT variant (streaming self-supervised features).

Not in the reference (SURVEY §2 — no model zoo); mirrors torchaudio's
``prototype.models.emformer_hubert_model/base`` capability [ref-recon:
torchaudio/prototype/models/_emformer_hubert.py — UNVERIFIED, mount
empty]: acoustic FEATURES in (log-mel/fbank, ``(B, T, F)``), a frame
stacker + linear projection front end, and an :class:`.emformer.Emformer`
encoder — so the same model serves full-utterance pretraining
(:class:`.hubert.HuBERTPretrainModel` composes unchanged, pass features
where it says waveforms) AND low-latency chunkwise streaming feature
extraction via ``init_state``/``infer`` (streaming ≡ full is inherited
from the Emformer contract and pinned by test).  Exact torchaudio
hyperparameters are unverifiable against the empty mount; what this
class pins is the architecture family and the SSL contract.

Length/lookahead contract: a clip of ``T`` feature frames stacks to
``T // stride`` encoder frames, of which the LAST ``right_context``
are that clip's lookahead tail — ``output_length(T)`` is therefore
``T // stride - right_context``.  The same formula applies per sample
in a padded batch (every sample owns its own tail); it is monotone and
shape-static, so padded batches and traced lengths both work.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ._common import _dense, _ln
from .emformer import Emformer

__all__ = ["EmformerHuBERT", "emformer_hubert_model",
           "emformer_hubert_base"]


class EmformerHuBERT:
    """``apply(params, features (B, T, feature_dim), lengths=None)``
    → ``(encodings (B, T // stride - right_context, d_model) [or
    logits if aux_out], out_lengths)``.

    Duck-typed to the :class:`.wav2vec2.Wav2Vec2` SSL surface
    (``frame_mask=`` / ``mask_embedding=`` / ``return_features=True``,
    ``output_length``, ``d_model``, ``aux_out``) so
    :class:`.hubert.HuBERTPretrainModel` composes unchanged.
    """

    def __init__(self, feature_dim: int = 80, stride: int = 4,
                 d_model: int = 768, num_heads: int = 8,
                 ffn_dim: int = 2048, num_layers: int = 12,
                 segment_length: int = 4,
                 left_context_length: int = 30,
                 right_context_length: int = 1,
                 max_memory_size: int = 4,
                 aux_out: Optional[int] = None):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.feature_dim = feature_dim
        self.stride = stride
        self.d_model = d_model
        self.aux_out = aux_out
        self.encoder = Emformer(
            input_dim=d_model, num_heads=num_heads, ffn_dim=ffn_dim,
            num_layers=num_layers, segment_length=segment_length,
            left_context_length=left_context_length,
            right_context_length=right_context_length,
            max_memory_size=max_memory_size)
        self._config = (feature_dim, stride, d_model, num_heads,
                        ffn_dim, num_layers, segment_length,
                        left_context_length, right_context_length,
                        max_memory_size, aux_out)

    # -- SSL surface -----------------------------------------------
    def output_length(self, length):
        """Valid encoder frames for a feature-frame count (the last
        ``right_context`` stacked frames are the lookahead tail)."""
        r = self.encoder.R
        if isinstance(length, (int,)):
            return max(length // self.stride - r, 0)
        return jnp.maximum(
            jnp.asarray(length, jnp.int32) // self.stride - r, 0)

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

    def _stack_project(self, params, features):
        """(B, T, F) → stacked (B, T // stride, F * stride) features
        and their LN+projection (B, T // stride, d_model)."""
        features = jnp.asarray(features)
        if features.ndim != 3 or features.shape[-1] != self.feature_dim:
            raise ValueError(
                f"features must be (batch, time, {self.feature_dim})")
        b, t, f = features.shape
        tr = t // self.stride
        feats = features[:, :tr * self.stride].reshape(
            b, tr, f * self.stride)
        x = (_ln(feats, params["proj_ln"]) @ params["proj"]["w"]
             + params["proj"]["b"])
        return feats, x

    def apply(self, params, features, lengths=None, *,
              frame_mask=None, mask_embedding=None,
              return_features=False):
        feats, x = self._stack_project(params, features)
        b, tr, _ = x.shape
        t_out = tr - self.encoder.R
        if t_out < 1:
            raise ValueError(
                "need at least (right_context + 1) * stride feature "
                "frames")
        out_lengths = jnp.full((b,), t_out, jnp.int32)
        if lengths is not None:
            out_lengths = self.output_length(lengths)
        if frame_mask is not None:
            if mask_embedding is None:
                raise ValueError("frame_mask needs mask_embedding")
            if frame_mask.shape[1] != t_out:
                raise ValueError(
                    f"frame_mask covers the {t_out} utterance frames, "
                    f"got {frame_mask.shape[1]}")
            pad = jnp.zeros((b, self.encoder.R), bool)
            full = jnp.concatenate([frame_mask, pad], axis=1)
            x = jnp.where(full[..., None], mask_embedding, x)
        x, out_lengths = self.encoder.apply(
            params["encoder"], x, lengths=out_lengths)
        if self.aux_out is not None:
            x = x @ params["aux"]["w"] + params["aux"]["b"]
        if return_features:
            return x, out_lengths, feats[:, :t_out]
        return x, out_lengths

    def __call__(self, params, features, lengths=None):
        return self.apply(params, features, lengths)

    # -- streaming --------------------------------------------------
    def init_state(self, batch_size: int):
        """Zeroed streaming state (the Emformer's)."""
        return self.encoder.init_state(batch_size)

    def infer(self, params, chunk, state, utt_lengths=None,
              rc_lengths=None):
        """One streaming step over ``(segment_length + right_context)
        * stride`` NEW feature frames (lookahead included); returns
        ``(encodings (B, segment_length, d_model), out_lengths,
        state)``.  Chaining ``infer`` over a clip's chunks reproduces
        ``apply`` exactly (Emformer streaming contract)."""
        enc = self.encoder
        want = (enc.S + enc.R) * self.stride
        chunk = jnp.asarray(chunk)
        if chunk.ndim != 3 or chunk.shape[1] != want:
            raise ValueError(
                f"chunk must be (batch, {want}, {self.feature_dim})")
        _, x = self._stack_project(params, chunk)
        out, out_len, state = enc.infer(
            params["encoder"], x, state,
            utt_lengths=utt_lengths, rc_lengths=rc_lengths)
        if self.aux_out is not None:
            out = out @ params["aux"]["w"] + params["aux"]["b"]
        return out, out_len, state


def emformer_hubert_model(**kwargs) -> EmformerHuBERT:
    """Generic constructor (torchaudio's ``emformer_hubert_model``) —
    all :class:`EmformerHuBERT` kwargs pass through."""
    return EmformerHuBERT(**kwargs)


def emformer_hubert_base(aux_out: Optional[int] = None,
                         **kwargs) -> EmformerHuBERT:
    """Streaming-HuBERT base scale: 80-dim fbank in, 4-frame stacking,
    12 Emformer layers × 768 wide [family pinned; hyperparameters
    UNVERIFIED — mount empty]."""
    kwargs.setdefault("feature_dim", 80)
    kwargs.setdefault("stride", 4)
    kwargs.setdefault("d_model", 768)
    kwargs.setdefault("num_layers", 12)
    return EmformerHuBERT(aux_out=aux_out, **kwargs)
