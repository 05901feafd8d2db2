from .layers import (
    Transform, Pipeline,
    STFT, ISTFT, InverseSpectrogram, ComplexNorm,
    Filterbank, MelFilterbank, BarkFilterbank, ChromaFilterbank,
    ApplyFilterbank,
    AmplitudeToDb, DbToAmplitude,
    MuLawEncoding, MuLawDecoding,
    StretchSpecTime, Resample, GriffinLim,
    Spectrogram, Melspectrogram, FusedMelspectrogram,
    Barkspectrogram, Chromagram,
)
from .frontend import MelFrontendClassifier
from .conformer import Conformer, ConformerTranscriber
from .asr import Wav2Letter, DeepSpeech
from .tasnet import ConvTasNet
from .wavernn import WaveRNN
from .tacotron2 import Tacotron2
from .wav2vec2 import (
    Wav2Vec2, wav2vec2_base, wav2vec2_large, wav2vec2_large_lv60k,
    hubert_base, hubert_large, hubert_xlarge,
    WavLM, wavlm_base, wavlm_large,
    wav2vec2_xlsr_300m, wav2vec2_xlsr_1b, wav2vec2_xlsr_2b,
)
from .hubert import HuBERTPretrainModel, span_mask
from .conformer_w2v2 import (
    ConformerWav2Vec2, conformer_wav2vec2_model,
    conformer_wav2vec2_base,
    ConformerWav2Vec2PretrainModel,
    conformer_wav2vec2_pretrain_model,
    conformer_wav2vec2_pretrain_base,
    conformer_wav2vec2_pretrain_large,
)
from .emformer_hubert import (
    EmformerHuBERT, emformer_hubert_model, emformer_hubert_base,
)
from .hdemucs import HDemucs
from .hdemucs_ta import HDemucsTA
from .squim import SquimObjective, SquimObjectiveTA, SquimSubjective
from .vggish import VGGish, VGGishInputProcessor
from .factories import (
    conv_tasnet_base, hdemucs_low, hdemucs_medium, hdemucs_high,
    emformer_rnnt_model, emformer_rnnt_base,
    conformer_rnnt_model, conformer_rnnt_base,
    squim_objective_base, squim_subjective_base,
    wav2vec2_model, hifigan_vocoder,
    hubert_pretrain_base, hubert_pretrain_large,
    hubert_pretrain_xlarge,
)
from .decoder import (
    CTCDecoderLM, ZeroLM, ARPALM,
    CTCDecoder, CTCDecoderOutput, ctc_decoder,
)
from .hifigan import (
    HiFiGANVocoder,
    hifigan_vocoder_v1, hifigan_vocoder_v2, hifigan_vocoder_v3,
)
from .emformer import Emformer, ConvEmformer, EmformerTranscriber
from .rnnt import RNNT, RNNTPredictor, LayerNormLSTMPredictor, RNNTBeamSearch
from .transforms import (
    MFCC, Loudness, PitchShift, Speed, AddNoise,
    Fade, Vol, FrequencyMasking, TimeMasking,
    Preemphasis, Deemphasis, ComputeDeltas, SlidingWindowCmn,
    SpectralCentroid, MelScale, InverseMelScale,
    PSD, SoudenMVDR, RTFMVDR, Vad,
    Overdrive, Phaser, Flanger, Contrast,
    Lowpass, Highpass, Equalizer, RNNTLoss,
    LFCC, Convolve, FFTConvolve, SpeedPerturbation,
    AmplitudeToDB, MelSpectrogram, TimeStretch, SpecAugment, MVDR,
    BarkScale, InverseBarkScale, BarkSpectrogram,
    ChromaScale, ChromaSpectrogram,
)

# torchaudio's class name for the wav2vec2 encoder
Wav2Vec2Model = Wav2Vec2

__all__ = [
    "Wav2Vec2Model", "AmplitudeToDB", "MelSpectrogram", "TimeStretch",
    "SpecAugment", "MVDR",
    "BarkScale", "InverseBarkScale", "BarkSpectrogram",
    "ChromaScale", "ChromaSpectrogram",
    "Transform", "Pipeline",
    "STFT", "ISTFT", "InverseSpectrogram", "ComplexNorm",
    "Filterbank", "MelFilterbank", "BarkFilterbank",
    "ChromaFilterbank", "ApplyFilterbank",
    "Barkspectrogram", "Chromagram",
    "AmplitudeToDb", "DbToAmplitude",
    "MuLawEncoding", "MuLawDecoding",
    "StretchSpecTime", "Resample", "GriffinLim",
    "Spectrogram", "Melspectrogram", "FusedMelspectrogram",
    "MelFrontendClassifier", "Conformer", "Wav2Letter", "DeepSpeech", "ConvTasNet", "WaveRNN", "Tacotron2", "Wav2Vec2", "Emformer",
    "ConvEmformer", "EmformerTranscriber",
    "RNNT", "RNNTPredictor", "LayerNormLSTMPredictor", "RNNTBeamSearch",
    "wav2vec2_base", "wav2vec2_large", "wav2vec2_large_lv60k",
    "hubert_base", "hubert_large", "hubert_xlarge",
    "WavLM", "wavlm_base", "wavlm_large",
    "wav2vec2_xlsr_300m", "wav2vec2_xlsr_1b", "wav2vec2_xlsr_2b",
    "HuBERTPretrainModel", "span_mask", "HDemucs", "HDemucsTA",
    "ConformerWav2Vec2", "conformer_wav2vec2_model",
    "conformer_wav2vec2_base",
    "ConformerWav2Vec2PretrainModel",
    "conformer_wav2vec2_pretrain_model",
    "conformer_wav2vec2_pretrain_base",
    "conformer_wav2vec2_pretrain_large",
    "EmformerHuBERT", "emformer_hubert_model", "emformer_hubert_base",
    "SquimObjective", "SquimObjectiveTA", "SquimSubjective",
    "HiFiGANVocoder",
    "hifigan_vocoder_v1", "hifigan_vocoder_v2", "hifigan_vocoder_v3",
    "CTCDecoderLM", "ZeroLM", "ARPALM",
    "CTCDecoder", "CTCDecoderOutput", "ctc_decoder",
    "conv_tasnet_base", "hdemucs_low", "hdemucs_medium",
    "hdemucs_high", "emformer_rnnt_model", "emformer_rnnt_base",
    "conformer_rnnt_model", "conformer_rnnt_base", "ConformerTranscriber",
    "squim_objective_base", "squim_subjective_base",
    "VGGish", "VGGishInputProcessor",
    "wav2vec2_model", "hifigan_vocoder",
    "hubert_pretrain_base", "hubert_pretrain_large",
    "hubert_pretrain_xlarge",
    "MFCC", "Loudness", "PitchShift", "Speed", "AddNoise",
    "Fade", "Vol", "FrequencyMasking", "TimeMasking",
    "Preemphasis", "Deemphasis", "ComputeDeltas", "SlidingWindowCmn",
    "SpectralCentroid", "MelScale", "InverseMelScale",
    "PSD", "SoudenMVDR", "RTFMVDR", "Vad",
    "Overdrive", "Phaser", "Flanger", "Contrast",
    "Lowpass", "Highpass", "Equalizer", "RNNTLoss",
    "LFCC", "Convolve", "FFTConvolve", "SpeedPerturbation",
]
