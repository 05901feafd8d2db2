from .layers import (
    Transform, Pipeline,
    STFT, ISTFT, ComplexNorm,
    Filterbank, MelFilterbank, ChromaFilterbank, ApplyFilterbank,
    AmplitudeToDb, DbToAmplitude,
    MuLawEncoding, MuLawDecoding,
    StretchSpecTime, Resample, GriffinLim,
    Spectrogram, Melspectrogram, FusedMelspectrogram,
)
from .frontend import MelFrontendClassifier

__all__ = [
    "Transform", "Pipeline",
    "STFT", "ISTFT", "ComplexNorm",
    "Filterbank", "MelFilterbank", "ChromaFilterbank", "ApplyFilterbank",
    "AmplitudeToDb", "DbToAmplitude",
    "MuLawEncoding", "MuLawDecoding",
    "StretchSpecTime", "Resample", "GriffinLim",
    "Spectrogram", "Melspectrogram", "FusedMelspectrogram",
    "MelFrontendClassifier",
]
