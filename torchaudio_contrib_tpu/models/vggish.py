"""VGGish: AudioSet audio-embedding CNN (Hershey et al. 2017).

Not in the reference (SURVEY §2 — torchaudio-contrib has no model zoo);
mirrors torchaudio's ``prototype.pipelines.VGGISH`` capability
[ref-recon: torchaudio/prototype/pipelines/_vggish — UNVERIFIED, mount
empty], whose network is the public ``torchvggish`` port of the TF
original: four VGG conv blocks (64→128→256×2→512×2, all 3×3 SAME +
ReLU, 2×2 max-pool between blocks) over 96×64 log-mel patches, then
three fully-connected layers (12288→4096→4096→128, ReLU after each —
including the final embedding).

TPU-first: activations are NHWC so every conv lands on the MXU without
layout transposes, and the flatten order (H, W, C) is *exactly* the
torch port's ``transpose(1,3);transpose(1,2);view(B,-1)`` ordering —
``utils.import_torch.import_vggish`` therefore maps published
``torchvggish`` checkpoints with plain axis permutations (parity
pinned ≤1e-4 against a torch ``nn.Sequential`` replica in
``tests/test_vggish.py``).

:class:`VGGishInputProcessor` reproduces the model's published
``mel_features`` front end exactly (periodic-Hann magnitude STFT with
no centering, HTK-mel triangle matrix with a zeroed DC row and no
normalization, ``log(mel + 0.01)``, non-overlapping 96-frame patches),
pinned by a literal float64 NumPy oracle in the tests.  It is a single
jittable gather→rFFT→GEMM pipeline, not a per-frame loop.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["VGGish", "VGGishInputProcessor"]

# (cin, cout) per conv, with pools after blocks — torchvggish
# ``features`` Sequential indices 0, 3, 6, 8, 11, 13
_CONVS = ((1, 64), (64, 128), (128, 256), (256, 256), (256, 512),
          (512, 512))
_POOL_AFTER = (0, 1, 3, 5)      # conv indices followed by a 2x2 pool


def _conv2d(key, cin, cout):
    s = math.sqrt(6.0 / (9 * cin + 9 * cout))
    return jax.random.uniform(key, (3, 3, cin, cout), jnp.float32,
                              -s, s)


def _dense(key, cin, cout):
    s = math.sqrt(6.0 / (cin + cout))
    return jax.random.uniform(key, (cin, cout), jnp.float32, -s, s)


class VGGish:
    """``apply(params, x)`` → 128-dim embeddings.  ``x`` is a batch of
    log-mel patches ``(N, 96, 64)`` (or torchaudio's ``(N, 1, 96, 64)``
    NCHW, accepted for drop-in compatibility)."""

    in_frames = 96
    in_bands = 64
    embedding_dim = 128

    def init(self, key):
        keys = iter(jax.random.split(key, len(_CONVS) + 3))
        convs = [{"w": _conv2d(next(keys), cin, cout),
                  "b": jnp.zeros((cout,))} for cin, cout in _CONVS]
        flat = (self.in_frames // 16) * (self.in_bands // 16) * 512
        fcs = [{"w": _dense(next(keys), cin, cout),
                "b": jnp.zeros((cout,))}
               for cin, cout in ((flat, 4096), (4096, 4096),
                                 (4096, 128))]
        return {"convs": convs, "fcs": fcs}

    def apply(self, params, x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 4:                       # (N, 1, 96, 64) NCHW
            if x.shape[1] != 1:
                raise ValueError(
                    f"expected a single input channel, got {x.shape}")
            x = x[:, 0]
        if x.shape[-2:] != (self.in_frames, self.in_bands):
            raise ValueError(
                f"expected (N, {self.in_frames}, {self.in_bands}) "
                f"patches, got {x.shape}")
        x = x[..., None]                      # NHWC, C=1
        for i, p in enumerate(params["convs"]):
            x = jax.lax.conv_general_dilated(
                x, p["w"], window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + p["b"]
            x = jax.nn.relu(x)
            if i in _POOL_AFTER:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                    (1, 2, 2, 1), "VALID")
        # NHWC flatten == torch port's (H, W, C) view ordering
        x = x.reshape(x.shape[0], -1)
        for p in params["fcs"]:
            x = jax.nn.relu(x @ p["w"] + p["b"])
        return x


def _mel_matrix(num_bins: int, sample_rate: float, n_mels: int,
                f_min: float, f_max: float) -> np.ndarray:
    """``mel_features.spectrogram_to_mel_matrix``: HTK mel scale,
    un-normalized triangles over linearly-spaced FFT-bin frequencies,
    DC row zeroed.  float64 build."""
    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    bins_mel = mel(np.linspace(0.0, sample_rate / 2.0, num_bins))
    edges = np.linspace(mel(f_min), mel(f_max), n_mels + 2)
    lo, ce, hi = edges[:-2], edges[1:-1], edges[2:]
    lower = (bins_mel[:, None] - lo[None]) / (ce - lo)[None]
    upper = (hi[None] - bins_mel[:, None]) / (hi - ce)[None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    weights[0, :] = 0.0
    return weights


class VGGishInputProcessor:
    """Waveform (16 kHz) → ``(N, 96, 64)`` log-mel patches for
    :class:`VGGish`.  Accepts ``(T,)`` mono or ``(C, T)``
    (mean-downmixed, the published port's convention); trailing
    samples that don't fill a whole 96-frame patch are dropped,
    matching the published framing."""

    sample_rate = 16000

    def __init__(self):
        sr = self.sample_rate
        self.win = int(round(sr * 0.025))           # 400
        self.hop = int(round(sr * 0.010))           # 160
        self.fft = 2 ** int(np.ceil(np.log2(self.win)))  # 512
        # periodic Hann, float64 build, baked as a float32 constant
        n = np.arange(self.win, dtype=np.float64)
        self._window = jnp.asarray(
            0.5 - 0.5 * np.cos(2.0 * np.pi / self.win * n), jnp.float32)
        self._mel = jnp.asarray(
            _mel_matrix(self.fft // 2 + 1, sr, 64, 125.0, 7500.0),
            jnp.float32)

    def __call__(self, waveform):
        x = jnp.asarray(waveform, jnp.float32)
        if x.ndim == 2:
            x = jnp.mean(x, axis=0)
        if x.ndim != 1:
            raise ValueError(
                f"expected (T,) or (channels, T), got {x.shape}")
        if x.shape[0] < self.win:
            raise ValueError(
                f"need at least {self.win} samples, got {x.shape[0]}")
        # no-center framing: 1 + floor((T - win) / hop) frames
        n_frames = 1 + (x.shape[0] - self.win) // self.hop
        idx = (jnp.arange(n_frames)[:, None] * self.hop
               + jnp.arange(self.win)[None])
        frames = x[idx] * self._window
        mag = jnp.abs(jnp.fft.rfft(frames, self.fft))
        logmel = jnp.log(mag @ self._mel + 0.01)
        n_patches = n_frames // VGGish.in_frames
        if n_patches < 1:
            raise ValueError(
                f"waveform too short: {n_frames} mel frames < "
                f"{VGGish.in_frames} (need ~0.975 s at 16 kHz)")
        return logmel[: n_patches * VGGish.in_frames].reshape(
            n_patches, VGGish.in_frames, VGGish.in_bands)
