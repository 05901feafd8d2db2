"""Trainable audio frontend: STFT→mel→dB → small CNN classifier.

This is the rebuild's flagship model for BASELINE config 3 ("fwd+bwd
gradient pass through STFT→mel→dB into a small CNN classifier"); the
reference has no model zoo — trainable frontends are its stated use case
[SURVEY.md §1 "everything differentiable"].

TPU-first: the whole train step (feature extraction + CNN + loss + grads
+ SGD update) is one jitted program; feature extraction and conv GEMMs
all land on the MXU, and under GSPMD the batch axis shards over the mesh
with XLA inserting the gradient ``psum`` automatically.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .layers import Melspectrogram, AmplitudeToDb, Pipeline

__all__ = ["MelFrontendClassifier"]


def _conv(x, w, b, stride=1):
    # x: (B, H, W, C) ; w: (kh, kw, cin, cout)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + b


class MelFrontendClassifier:
    """Mel-spectrogram frontend + 3-block CNN; pure-functional params.

    ``init(key)`` → params pytree; ``apply(params, waveform)`` → logits;
    ``loss_fn`` / ``train_step`` provided for the benchmark and the
    multi-chip dry run.  Set ``trainable_frontend=True`` to include the
    mel filterbank in the parameter pytree (gradients then flow through
    the full STFT→mel→dB chain into the filterbank — BASELINE config 3).
    """

    def __init__(self, num_classes: int = 10, num_mels: int = 64,
                 sample_rate: float = 16000, fft_length: int = 512,
                 hop_length: int = 128, trainable_frontend: bool = True,
                 channels: Tuple[int, ...] = (32, 64, 128),
                 fused: bool = False, precision: str = "auto"):
        self.num_classes = num_classes
        self.num_mels = num_mels
        self.channels = channels
        self.trainable_frontend = trainable_frontend
        if fused:
            # single-kernel log-mel frontend (TPU fast path; center=False
            # frame semantics — the CNN is pooling-invariant to the frame
            # count).  precision="fast" also runs the backward kernels
            # single-pass for maximum training throughput.
            from .layers import FusedMelspectrogram
            self.frontend = Pipeline(FusedMelspectrogram(
                num_mels=num_mels, sample_rate=sample_rate,
                fft_length=fft_length, hop_length=hop_length,
                trainable=trainable_frontend, precision=precision))
        else:
            self.melspec = Melspectrogram(
                num_mels=num_mels, sample_rate=sample_rate,
                fft_length=fft_length, hop_length=hop_length,
                trainable=trainable_frontend)
            self.to_db = AmplitudeToDb(power=2.0)
            self.frontend = Pipeline(*self.melspec.transforms, self.to_db)

    def init(self, key) -> dict:
        ks = jax.random.split(key, len(self.channels) + 1)
        params = {"conv": [], "head": None}
        cin = 1
        for i, cout in enumerate(self.channels):
            w = jax.random.normal(ks[i], (3, 3, cin, cout), jnp.float32)
            w = w * np.sqrt(2.0 / (9 * cin))
            params["conv"].append({"w": w, "b": jnp.zeros((cout,))})
            cin = cout
        params["head"] = {
            "w": jax.random.normal(ks[-1], (cin, self.num_classes),
                                   jnp.float32) * np.sqrt(1.0 / cin),
            "b": jnp.zeros((self.num_classes,)),
        }
        fe = self.frontend.init_params()
        if fe is not None:
            params["frontend"] = fe
        return params

    def features(self, params: dict, waveform: jnp.ndarray) -> jnp.ndarray:
        """waveform (B, C, T) → log-mel (B, C·mels-as-channels later)."""
        return self.frontend(waveform, params=params.get("frontend"))

    def apply(self, params: dict, waveform: jnp.ndarray) -> jnp.ndarray:
        feats = self.features(params, waveform)      # (B, C, mels, frames)
        x = feats.mean(axis=1, keepdims=True)        # average channels
        x = jnp.transpose(x, (0, 2, 3, 1))           # NHWC
        for i, p in enumerate(params["conv"]):
            x = _conv(x, p["w"], p["b"], stride=2)
            x = jax.nn.relu(x)
        x = x.mean(axis=(1, 2))                      # global average pool
        h = params["head"]
        return x @ h["w"] + h["b"]

    def loss_fn(self, params: dict, waveform: jnp.ndarray,
                labels: jnp.ndarray) -> jnp.ndarray:
        logits = self.apply(params, waveform)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None],
                                             axis=1))

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, params: dict, waveform: jnp.ndarray,
                   labels: jnp.ndarray, lr: float = 1e-3):
        loss, grads = jax.value_and_grad(self.loss_fn)(params, waveform,
                                                       labels)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params,
                                        grads)
        return params, loss
