"""``torchaudio.transforms``-shaped namespace.

Migration alias so reference code written as ``import
torchaudio.transforms as T`` ports by changing only the package name
[ref-recon: torchaudio ``transforms/_transforms.py`` public surface —
UNVERIFIED, mount empty].  Every name is the same class as the flat
package export; the torchaudio-argument-spelling variants
(``AmplitudeToDB``, ``MelSpectrogram`` with ``hop = win_length // 2``,
…) are documented in docs/MIGRATION.md.
"""

from .models import (
    Spectrogram, InverseSpectrogram, GriffinLim,
    AmplitudeToDB, MelScale, InverseMelScale, MelSpectrogram,
    MFCC, LFCC,
    MuLawEncoding, MuLawDecoding,
    Resample, ComputeDeltas, TimeStretch, Fade, Vol, Loudness,
    FrequencyMasking, TimeMasking, SpecAugment,
    SlidingWindowCmn, SpectralCentroid, Vad, PitchShift,
    RNNTLoss, PSD, MVDR, RTFMVDR, SoudenMVDR,
    Convolve, FFTConvolve, Speed, SpeedPerturbation, AddNoise,
    Preemphasis, Deemphasis,
)

__all__ = [
    "Spectrogram", "InverseSpectrogram", "GriffinLim",
    "AmplitudeToDB", "MelScale", "InverseMelScale", "MelSpectrogram",
    "MFCC", "LFCC",
    "MuLawEncoding", "MuLawDecoding",
    "Resample", "ComputeDeltas", "TimeStretch", "Fade", "Vol",
    "Loudness", "FrequencyMasking", "TimeMasking", "SpecAugment",
    "SlidingWindowCmn", "SpectralCentroid", "Vad", "PitchShift",
    "RNNTLoss", "PSD", "MVDR", "RTFMVDR", "SoudenMVDR",
    "Convolve", "FFTConvolve", "Speed", "SpeedPerturbation",
    "AddNoise", "Preemphasis", "Deemphasis",
]
