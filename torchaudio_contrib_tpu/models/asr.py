"""Classic ASR model families: Wav2Letter and DeepSpeech.

Not in the reference (SURVEY §2 — no model zoo); mirror torchaudio's
``models.Wav2Letter`` / ``models.DeepSpeech`` capability as
pure-functional JAX (init/apply param pytrees, the
``MelFrontendClassifier`` idiom).  TPU notes:

* Wav2Letter is a pure conv stack → a dozen MXU convs, one jitted
  program; ``input_type="waveform"`` uses the paper's stride-160
  first conv, ``"power_spectrum"``/``"mfcc"`` take ``num_features``
  channels (pair with ``ops.stft``/``ops.mfcc`` or
  ``compliance.kaldi``).
* DeepSpeech's bidirectional vanilla-RNN layer runs as two
  ``lax.scan`` s (forward + time-reversed); the surrounding
  hardtanh-clipped FC stack is batched GEMMs.  Output is
  ``(B, T, n_class)`` log-softmax-ready activations — feed
  ``ops.ctc_loss`` / ``ops.ctc_greedy_decode``.

Both train end-to-end in ``tests/test_asr_models.py`` (CTC loss
decreases; every leaf receives gradient).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Wav2Letter", "DeepSpeech"]


def _conv_init(key, k, cin, cout):
    s = math.sqrt(6.0 / (k * cin + k * cout))
    return jax.random.uniform(key, (k, cin, cout), jnp.float32, -s, s)


def _dense_init(key, cin, cout):
    s = math.sqrt(6.0 / (cin + cout))
    return jax.random.uniform(key, (cin, cout), jnp.float32, -s, s)


class Wav2Letter:
    """Wav2Letter conv stack (Collobert et al. 2016).

    ``apply(params, x)``: ``x`` is ``(B, time)`` for
    ``input_type="waveform"`` or ``(B, num_features, T)`` for
    ``"power_spectrum"`` / ``"mfcc"``.  Returns ``(B, T', num_classes)``
    frame activations (batch-first, time-major — ready for
    ``ops.ctc_loss``).
    """

    # (kernel, stride, channels) per conv block, after the input conv
    _BODY = [(7, 1, 250)] * 7 + [(32, 1, 2000), (1, 1, 2000)]
    # torchaudio's symmetric Conv1d paddings, in layer order
    # (waveform head 45, 48-conv 23, 7-convs 3, 32-conv 16, 1-convs 0)
    _TORCH_PAD = {250: 45, 48: 23, 7: 3, 32: 16, 1: 0}

    def __init__(self, num_classes: int = 40,
                 input_type: str = "waveform", num_features: int = 1,
                 compat: str = "tpu"):
        if input_type not in ("waveform", "power_spectrum", "mfcc"):
            raise ValueError(f"unknown input_type {input_type!r}")
        if input_type == "waveform" and num_features != 1:
            raise ValueError("waveform input implies num_features=1")
        if compat not in ("tpu", "torchaudio"):
            raise ValueError("compat must be 'tpu' or 'torchaudio', "
                             f"got {compat!r}")
        self.num_classes = num_classes
        self.input_type = input_type
        self.num_features = num_features
        # "tpu" (default): stride-aligned asymmetric SAME padding, raw
        # activations out.  "torchaudio": the published geometry —
        # symmetric paddings 45/23/3/16/0, ReLU after EVERY conv
        # (including the last), log-softmax over classes — exact
        # forward parity with torchaudio.models.Wav2Letter (pinned in
        # tests/test_import_torch_extra.py).
        self.compat = compat
        self._config = (num_classes, input_type, num_features, compat)

    def _arch(self):
        """Static (kernel, stride, cin, cout, padding) per layer."""
        arch = []

        def pad(k):
            if self.compat == "torchaudio":
                p = self._TORCH_PAD[k]
                return (p, p)
            return ((k - 1) // 2, k // 2)

        if self.input_type == "waveform":
            arch.append((250, 160, 1, 250, pad(250)))
            cin = 250
        else:
            cin = self.num_features
        arch.append((48, 2, cin, 250, pad(48)))
        cin = 250
        for k, s, cout in self._BODY:
            arch.append((k, s, cin, cout, pad(k)))
            cin = cout
        arch.append((1, 1, cin, self.num_classes, pad(1)))
        return arch

    def init(self, key):
        arch = self._arch()
        keys = jax.random.split(key, len(arch))
        return {"layers": [
            {"w": _conv_init(kk, k, cin, cout), "b": jnp.zeros((cout,))}
            for kk, (k, s, cin, cout, _) in zip(keys, arch)]}

    def apply(self, params, x):
        x = jnp.asarray(x)
        if self.input_type == "waveform":
            if x.ndim != 2:
                raise ValueError("waveform input must be (batch, time)")
            y = x[..., None]                       # (B, T, 1)
        else:
            if x.ndim != 3 or x.shape[1] != self.num_features:
                raise ValueError(
                    f"input must be (batch, {self.num_features}, time)")
            y = jnp.transpose(x, (0, 2, 1))        # (B, T, F)
        arch = self._arch()
        n = len(arch)
        for i, (p, (k, stride, _, _, pad)) in enumerate(
                zip(params["layers"], arch)):
            y = jax.lax.conv_general_dilated(
                y, p["w"], window_strides=(stride,),
                padding=[pad],
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32) + p["b"]
            if i < n - 1 or self.compat == "torchaudio":
                y = jax.nn.relu(y)
        if self.compat == "torchaudio":
            y = jax.nn.log_softmax(y, axis=-1)
        return y                                   # (B, T', classes)

    def __call__(self, params, x):
        return self.apply(params, x)


class DeepSpeech:
    """DeepSpeech (Hannun et al. 2014): 3 clipped-ReLU FC layers, one
    bidirectional vanilla ReLU-RNN (separate weights per direction,
    directions summed — torchaudio's ``models.DeepSpeech`` semantics,
    forward parity pinned against a torch oracle in
    ``tests/test_import_torch_extra.py``), clipped FC, linear head.

    ``apply(params, x)``: ``x`` ``(B, T, n_feature)`` →
    ``(B, T, n_class)`` raw activations; ``log_probs=True`` applies
    the final log-softmax torchaudio's forward returns.
    """

    def __init__(self, n_feature: int, n_hidden: int = 2048,
                 n_class: int = 40, dropout: float = 0.0):
        self.n_feature = n_feature
        self.n_hidden = n_hidden
        self.n_class = n_class
        self._config = (n_feature, n_hidden, n_class)

    def init(self, key):
        h = self.n_hidden
        keys = iter(jax.random.split(key, 10))

        def rnn_dir():
            return {"wx": _dense_init(next(keys), h, h),
                    "wh": 0.5 * _dense_init(next(keys), h, h),
                    "b": jnp.zeros((h,))}

        return {
            "fc1": {"w": _dense_init(next(keys), self.n_feature, h),
                    "b": jnp.zeros((h,))},
            "fc2": {"w": _dense_init(next(keys), h, h),
                    "b": jnp.zeros((h,))},
            "fc3": {"w": _dense_init(next(keys), h, h),
                    "b": jnp.zeros((h,))},
            "rnn": {"fwd": rnn_dir(), "bwd": rnn_dir()},
            "fc4": {"w": _dense_init(next(keys), h, h),
                    "b": jnp.zeros((h,))},
            "out": {"w": _dense_init(next(keys), h, self.n_class),
                    "b": jnp.zeros((self.n_class,))},
        }

    @staticmethod
    def _clip(x):
        return jnp.clip(x, 0.0, 20.0)              # hardtanh(0, 20)

    def _rnn_dir(self, p, y, reverse):
        xs = jnp.transpose(y @ p["wx"] + p["b"], (1, 0, 2))  # (T, B, H)

        def step(hprev, x_t):
            h = jax.nn.relu(x_t + hprev @ p["wh"])
            return h, h

        b = xs.shape[1]
        h0 = jnp.zeros((b, self.n_hidden), xs.dtype)
        _, hs = jax.lax.scan(step, h0, xs, reverse=reverse)
        return jnp.transpose(hs, (1, 0, 2))

    def apply(self, params, x, log_probs: bool = False):
        x = jnp.asarray(x)
        if x.ndim != 3 or x.shape[-1] != self.n_feature:
            raise ValueError(
                f"x must be (batch, time, {self.n_feature})")
        y = self._clip(x @ params["fc1"]["w"] + params["fc1"]["b"])
        y = self._clip(y @ params["fc2"]["w"] + params["fc2"]["b"])
        y = self._clip(y @ params["fc3"]["w"] + params["fc3"]["b"])
        # bidirectional vanilla ReLU-RNN, summed directions
        y = (self._rnn_dir(params["rnn"]["fwd"], y, False)
             + self._rnn_dir(params["rnn"]["bwd"], y, True))
        y = self._clip(y @ params["fc4"]["w"] + params["fc4"]["b"])
        y = y @ params["out"]["w"] + params["out"]["b"]
        return jax.nn.log_softmax(y, axis=-1) if log_probs else y

    def __call__(self, params, x, log_probs: bool = False):
        return self.apply(params, x, log_probs)
