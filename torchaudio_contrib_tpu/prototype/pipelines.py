"""``torchaudio.prototype.pipelines`` namespace alias [ref-recon:
torchaudio prototype pipelines surface — UNVERIFIED, mount empty]."""

from ..pipelines import (
    EMFORMER_RNNT_BASE_MUSTC, EMFORMER_RNNT_BASE_TEDLIUM3,
    HIFIGAN_VOCODER_V3_LJSPEECH, VGGISH, VGGishBundle,
)

__all__ = [
    "EMFORMER_RNNT_BASE_MUSTC", "EMFORMER_RNNT_BASE_TEDLIUM3",
    "HIFIGAN_VOCODER_V3_LJSPEECH", "VGGISH", "VGGishBundle",
]
