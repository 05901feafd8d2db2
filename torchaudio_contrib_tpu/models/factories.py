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
from .hdemucs_ta import HDemucsTA
from .conformer import ConformerTranscriber
from .emformer import Emformer, EmformerTranscriber
from .rnnt import RNNT, LayerNormLSTMPredictor
from .squim import SquimObjective, SquimObjectiveTA, SquimSubjective
from .wav2vec2 import Wav2Vec2, wav2vec2_base, wav2vec2_large, \
    hubert_base, hubert_large, hubert_xlarge
from .hubert import HuBERTPretrainModel
from .hifigan import HiFiGANVocoder

__all__ = [
    "conv_tasnet_base",
    "hdemucs_low", "hdemucs_medium", "hdemucs_high",
    "emformer_rnnt_model", "emformer_rnnt_base",
    "conformer_rnnt_model", "conformer_rnnt_base",
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
                                          "vocals"), compat=None):
    """HDemucs sized for ~8 kHz material (nfft 1024).
    ``compat="torchaudio"`` returns the checkpoint-compatible
    :class:`HDemucsTA` (published demucs-v3 layout, depth 5)."""
    if compat == "torchaudio":
        return HDemucsTA(sources=sources, nfft=1024, depth=5)
    return HDemucs(sources=sources, nfft=1024)


def hdemucs_medium(sources: Sequence[str] = ("drums", "bass", "other",
                                             "vocals"), compat=None):
    """HDemucs sized for ~16 kHz material (nfft 2048).
    ``compat="torchaudio"`` → checkpoint-compatible HDemucsTA."""
    if compat == "torchaudio":
        return HDemucsTA(sources=sources, nfft=2048, depth=6)
    return HDemucs(sources=sources, nfft=2048)


def hdemucs_high(sources: Sequence[str] = ("drums", "bass", "other",
                                           "vocals"), compat=None):
    """HDemucs sized for 44.1/48 kHz material (nfft 4096).
    ``compat="torchaudio"`` → checkpoint-compatible HDemucsTA (the
    ``HDEMUCS_HIGH_MUSDB*`` layout)."""
    if compat == "torchaudio":
        return HDemucsTA(sources=sources, nfft=4096, depth=6)
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
                        joiner_dim: int = 1024,
                        # torchaudio-layout (weight-compatible) build:
                        time_reduction_input_dim: int = 0,
                        time_reduction_stride: int = 1,
                        transformer_activation: str = "gelu",
                        lstm_layer_norm: bool = False,
                        lstm_layer_norm_epsilon: float = 1e-5
                        ) -> RNNT:
    """Emformer-transcriber RNN-T.

    Two builds:

    * default (``time_reduction_stride == 1``): this package's
      original stack — the Emformer consumes ``input_dim`` features
      directly and emits ``input_dim``-wide encodings (no
      post-encoder projection; ``encoding_dim`` must equal it).
    * torchaudio-compatible (``time_reduction_stride > 1``): the
      published ``emformer_rnnt_base`` layout [ref-recon: torchaudio
      models/rnnt.py ``emformer_rnnt_model`` — UNVERIFIED, mount
      empty] — bias-free input linear → stride-``s`` time reduction →
      compat Emformer → output linear + LayerNorm emitting
      ``encoding_dim``-wide encodings, a layer-norm-LSTM predictor
      and a bias-free-identity ``enc_proj`` (imported as identity);
      ``segment_length``/``right_context_length`` are in input
      (pre-reduction) frames.  Published checkpoints load via
      ``utils.import_torch.import_emformer_rnnt``.
    """
    if time_reduction_stride > 1:
        if not (encoding_dim and time_reduction_input_dim):
            raise ValueError(
                "the torchaudio-compatible build needs encoding_dim "
                "and time_reduction_input_dim")
        enc = EmformerTranscriber(
            input_dim=input_dim, output_dim=encoding_dim,
            segment_length=segment_length,
            right_context_length=right_context_length,
            time_reduction_input_dim=time_reduction_input_dim,
            time_reduction_stride=time_reduction_stride,
            num_heads=num_heads, ffn_dim=ffn_dim,
            num_layers=num_layers,
            left_context_length=left_context_length,
            max_memory_size=max_memory_size,
            activation=transformer_activation, tanh_on_mem=True)
        predictor = LayerNormLSTMPredictor(
            num_symbols, predictor_embed_dim, predictor_hidden_dim,
            encoding_dim, num_layers=predictor_layers,
            layer_norm=lstm_layer_norm,
            layer_norm_eps=lstm_layer_norm_epsilon)
        return RNNT(enc, num_symbols=num_symbols,
                    encoding_dim=encoding_dim,
                    joiner_dim=encoding_dim,
                    joiner_activation="relu", predictor=predictor)
    if encoding_dim and encoding_dim != input_dim:
        raise ValueError(
            "this Emformer emits input_dim-wide encodings; pass "
            "encoding_dim=input_dim (or 0) — a projection layer is "
            "only part of the time_reduction_stride>1 build")
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


def emformer_rnnt_base(num_symbols: int = 4097,
                       compat: Optional[str] = None) -> RNNT:
    """The LibriSpeech-scale streaming configuration (80-dim log-mel,
    segment 16, right context 4, 20 Emformer layers).

    ``compat="torchaudio"`` returns the published weight-compatible
    layout (input linear 80→128, stride-4 time reduction, 512-dim
    compat Emformer, 1024-dim encodings, 3-layer layer-norm-LSTM
    predictor with eps 1e-3) so ``EMFORMER_RNNT_BASE_*`` torch
    checkpoints import exactly."""
    if compat == "torchaudio":
        return emformer_rnnt_model(
            input_dim=80, encoding_dim=1024, num_symbols=num_symbols,
            segment_length=16, right_context_length=4,
            left_context_length=30, num_heads=8, ffn_dim=2048,
            num_layers=20, max_memory_size=0,
            predictor_embed_dim=512, predictor_hidden_dim=512,
            predictor_layers=3, time_reduction_input_dim=128,
            time_reduction_stride=4, transformer_activation="gelu",
            lstm_layer_norm=True, lstm_layer_norm_epsilon=1e-3)
    return emformer_rnnt_model(
        input_dim=80, num_symbols=num_symbols, segment_length=16,
        right_context_length=4)


def conformer_rnnt_model(*, input_dim: int, encoding_dim: int,
                         time_reduction_stride: int,
                         conformer_input_dim: int,
                         conformer_ffn_dim: int,
                         conformer_num_layers: int,
                         conformer_num_heads: int,
                         conformer_depthwise_conv_kernel_size: int,
                         conformer_dropout: float = 0.0,
                         num_symbols: int,
                         symbol_embedding_dim: int,
                         num_lstm_layers: int,
                         lstm_hidden_dim: int,
                         lstm_layer_norm: bool = True,
                         lstm_layer_norm_epsilon: float = 1e-5,
                         lstm_dropout: float = 0.0,
                         joiner_activation: str = "tanh") -> RNNT:
    """Conformer-transcriber RNN-T (torchaudio's prototype
    ``conformer_rnnt_model`` surface [ref-recon: torchaudio
    prototype/models/rnnt.py — UNVERIFIED, mount empty]):
    :class:`~.conformer.ConformerTranscriber` (time reduction →
    Conformer → output projection + LayerNorm) + the layer-norm-LSTM
    predictor + additive joiner.  ``conformer_dropout`` /
    ``lstm_dropout`` are accepted for signature parity and ignored —
    these models are deterministic (no train-mode dropout); the
    regularization levers here are SpecAugment on the features and
    batch via DP.  No published checkpoint exists for this family, so
    the build is behavioral (see ConformerTranscriber's divergence
    notes), not weight-import-targeted."""
    del conformer_dropout, lstm_dropout
    enc = ConformerTranscriber(
        input_dim=input_dim, output_dim=encoding_dim,
        time_reduction_stride=time_reduction_stride,
        conformer_input_dim=conformer_input_dim,
        conformer_ffn_dim=conformer_ffn_dim,
        conformer_num_layers=conformer_num_layers,
        conformer_num_heads=conformer_num_heads,
        conformer_depthwise_conv_kernel_size=(
            conformer_depthwise_conv_kernel_size))
    predictor = LayerNormLSTMPredictor(
        num_symbols, symbol_embedding_dim, lstm_hidden_dim,
        encoding_dim, num_layers=num_lstm_layers,
        layer_norm=lstm_layer_norm,
        layer_norm_eps=lstm_layer_norm_epsilon)
    return RNNT(enc, num_symbols=num_symbols,
                encoding_dim=encoding_dim, joiner_dim=encoding_dim,
                joiner_activation=joiner_activation,
                predictor=predictor)


def conformer_rnnt_base(num_symbols: int = 1024) -> RNNT:
    """The prototype's published base configuration (80-dim features,
    stride-4 reduction, 16×256-dim Conformer, 1024-dim encodings,
    2-layer 512-dim layer-norm-LSTM predictor) [ref-recon: torchaudio
    prototype ``conformer_rnnt_base`` — UNVERIFIED, mount empty]."""
    return conformer_rnnt_model(
        input_dim=80, encoding_dim=1024, time_reduction_stride=4,
        conformer_input_dim=256, conformer_ffn_dim=1024,
        conformer_num_layers=16, conformer_num_heads=4,
        conformer_depthwise_conv_kernel_size=31,
        num_symbols=num_symbols, symbol_embedding_dim=256,
        num_lstm_layers=2, lstm_hidden_dim=512,
        lstm_layer_norm=True, lstm_layer_norm_epsilon=1e-5,
        joiner_activation="tanh")


def squim_objective_base(compat: Optional[str] = None):
    """``compat="torchaudio"`` returns the published weight-compatible
    layout (:class:`SquimObjectiveTA`: relu-conv encoder, canonical
    overlapped DPRNN, transformer+AutoPool branches) so
    ``SQUIM_OBJECTIVE`` torch checkpoints import exactly."""
    if compat == "torchaudio":
        return SquimObjectiveTA()
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
