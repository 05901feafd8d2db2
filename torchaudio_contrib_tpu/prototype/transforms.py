"""``torchaudio.prototype.transforms`` namespace alias [ref-recon:
torchaudio prototype transforms surface — UNVERIFIED, mount empty]."""

from ..models import (
    BarkScale, BarkSpectrogram, ChromaScale, ChromaSpectrogram,
    InverseBarkScale,
)

__all__ = [
    "BarkScale", "BarkSpectrogram", "ChromaScale", "ChromaSpectrogram",
    "InverseBarkScale",
]
