"""Named model factories (torchaudio's ``models.*_base``-style
constructors).

Not in the reference (SURVEY §2); mirrors torchaudio's factory
surface so bundle-style code ports name-for-name [ref-recon:
torchaudio/models/* factory functions — UNVERIFIED, mount empty].
Each returns a configured pure-functional model object
(``init``/``apply``); parameter counts follow the published
configurations where the underlying class exposes the knob.
"""
from __future__ import annotations

from typing import Optional, Sequence

from .tasnet import ConvTasNet
from .hdemucs import HDemucs
from .emformer import Emformer
from .rnnt import RNNT
from .squim import SquimObjective, SquimSubjective
from .wav2vec2 import Wav2Vec2, wav2vec2_base, wav2vec2_large, \
    hubert_base, hubert_large, hubert_xlarge
from .hubert import HuBERTPretrainModel
from .hifigan import HiFiGANVocoder

__all__ = [
    "conv_tasnet_base",
    "hdemucs_low", "hdemucs_medium", "hdemucs_high",
    "emformer_rnnt_model", "emformer_rnnt_base",
    "squim_objective_base", "squim_subjective_base",
    "wav2vec2_model", "hifigan_vocoder",
    "hubert_pretrain_base", "hubert_pretrain_large",
    "hubert_pretrain_xlarge",
]


def conv_tasnet_base(num_sources: int = 2) -> ConvTasNet:
    """Published ConvTasNet base configuration (N=512, L=16, B=128,
    H=512, P=3, X=8, R=3)."""
    return ConvTasNet(num_sources=num_sources)


def hdemucs_low(sources: Sequence[str] = ("drums", "bass", "other",
                                          "vocals")) -> HDemucs:
    """HDemucs sized for ~8 kHz material (nfft 1024)."""
    return HDemucs(sources=sources, nfft=1024)


def hdemucs_medium(sources: Sequence[str] = ("drums", "bass", "other",
                                             "vocals")) -> HDemucs:
    """HDemucs sized for ~16 kHz material (nfft 2048)."""
    return HDemucs(sources=sources, nfft=2048)


def hdemucs_high(sources: Sequence[str] = ("drums", "bass", "other",
                                           "vocals")) -> HDemucs:
    """HDemucs sized for 44.1/48 kHz material (nfft 4096)."""
    return HDemucs(sources=sources, nfft=4096)


def emformer_rnnt_model(*, input_dim: int, encoding_dim: int = 0,
                        num_symbols: int,
                        segment_length: int,
                        right_context_length: int,
                        left_context_length: int = 30,
                        num_heads: int = 8, ffn_dim: int = 2048,
                        num_layers: int = 20,
                        max_memory_size: int = 4,
                        predictor_embed_dim: int = 512,
                        predictor_hidden_dim: int = 512,
                        predictor_layers: int = 2,
                        joiner_dim: int = 1024) -> RNNT:
    """Emformer-transcriber RNN-T.  The transcriber's output width is
    its ``input_dim`` (this build has no post-encoder projection), so
    ``encoding_dim`` defaults to ``input_dim``; a different value
    raises rather than silently mismatching."""
    if encoding_dim and encoding_dim != input_dim:
        raise ValueError(
            "this Emformer emits input_dim-wide encodings; pass "
            "encoding_dim=input_dim (or 0) — a projection layer is "
            "not part of this build")
    enc = Emformer(input_dim=input_dim, num_heads=num_heads,
                   ffn_dim=ffn_dim, num_layers=num_layers,
                   segment_length=segment_length,
                   left_context_length=left_context_length,
                   right_context_length=right_context_length,
                   max_memory_size=max_memory_size, tanh_on_mem=True)
    return RNNT(enc, num_symbols=num_symbols, encoding_dim=input_dim,
                joiner_dim=joiner_dim,
                predictor_embed_dim=predictor_embed_dim,
                predictor_hidden_dim=predictor_hidden_dim,
                predictor_layers=predictor_layers)


def emformer_rnnt_base(num_symbols: int = 4097) -> RNNT:
    """The LibriSpeech-scale streaming configuration (80-dim log-mel,
    segment 16, right context 4, 20 Emformer layers)."""
    return emformer_rnnt_model(
        input_dim=80, num_symbols=num_symbols, segment_length=16,
        right_context_length=4)


def squim_objective_base() -> SquimObjective:
    return SquimObjective()


def squim_subjective_base() -> SquimSubjective:
    return SquimSubjective()


def wav2vec2_model(**kwargs) -> Wav2Vec2:
    """Generic constructor (torchaudio's ``wav2vec2_model``) — all
    :class:`Wav2Vec2` kwargs pass through."""
    return Wav2Vec2(**kwargs)


def hifigan_vocoder(**kwargs) -> HiFiGANVocoder:
    """Generic constructor (torchaudio's ``hifigan_vocoder``) — all
    :class:`HiFiGANVocoder` kwargs pass through."""
    return HiFiGANVocoder(**kwargs)


def _pretrain(encoder: Wav2Vec2, num_classes: int
              ) -> HuBERTPretrainModel:
    return HuBERTPretrainModel(encoder, num_classes=num_classes)


def hubert_pretrain_base(num_classes: int = 100
                         ) -> HuBERTPretrainModel:
    """HuBERT pretraining head over the BASE encoder (first-iteration
    MFCC k-means classes default)."""
    return _pretrain(hubert_base(), num_classes)


def hubert_pretrain_large(num_classes: int = 500
                          ) -> HuBERTPretrainModel:
    return _pretrain(hubert_large(), num_classes)


def hubert_pretrain_xlarge(num_classes: int = 500
                           ) -> HuBERTPretrainModel:
    return _pretrain(hubert_xlarge(), num_classes)
