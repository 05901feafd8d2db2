"""``torchaudio.prototype``-shaped namespace.

Migration alias for the reference's prototype tree [ref-recon:
torchaudio ``prototype/{functional,transforms,models,pipelines}`` —
UNVERIFIED, mount empty]: the prototype-surface names this package
implements, re-exported at their torchaudio import paths.  All objects
are the same as the flat package exports; implementation provenance
lives with the definitions.
"""

from . import functional, models, pipelines, transforms

__all__ = ["functional", "models", "pipelines", "transforms"]
