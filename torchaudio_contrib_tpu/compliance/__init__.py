"""Compatibility feature extractors (`compliance.kaldi` surface)."""
from . import kaldi

__all__ = ["kaldi"]
