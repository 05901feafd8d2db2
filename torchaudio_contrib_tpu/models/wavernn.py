"""WaveRNN vocoder (fatchord variant, as torchaudio ships) —
pure-functional JAX.

Not in the reference (SURVEY §2 — no model zoo); mirrors torchaudio's
``models.WaveRNN`` capability: mel-conditioned autoregressive sample
classifier (upsample network + MelResNet conditioning, two GRU layers,
FC head over ``n_classes`` quantization bins).

TPU notes:

* Teacher-forced training is the throughput path: the GRUs' input
  projections for ALL timesteps are hoisted out of the ``lax.scan``
  as one big ``(B·T, 3H)`` GEMM; the scan body is only the ``h·U``
  recurrent GEMM + elementwise gates.  Conditioning (MelResNet +
  upsampling) is convs.
* Norms: torchaudio's MelResNet BatchNorms are carried as FROZEN
  per-channel affines (``y·g + b`` — the inference form; an imported
  checkpoint's running stats fold into ``g``/``b`` exactly, see
  ``utils.import_torch.import_wavernn``).  Mutable running stats are
  excluded by the pure-params contract; training from scratch trains
  the affine directly (round 4 — was layernorm before, which cannot
  represent a trained BN and broke checkpoint import).
* ``infer`` (sample-by-sample generation, torchaudio's name) is one
  ``lax.scan`` over time with categorical sampling — sequential by
  nature; batch clips to fill the chip.  Pinned exactly consistent
  with the teacher-forced ``apply`` (same logits trajectory on the
  generated history).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ._common import _dense, _conv

__all__ = ["WaveRNN"]


def _conv1d(x, w, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, w, (1,), padding, dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)


class WaveRNN:
    """``apply(params, waveform (B, T), specgram (B, n_freq, T_mel))``
    → ``(B, T, n_classes)`` logits for the NEXT sample's class.

    ``T`` must equal ``hop_length · (T_mel − kernel_size + 1)`` (the
    MelResNet eats ``kernel_size − 1`` frames, as in torchaudio).
    """

    def __init__(self, upsample_scales: Sequence[int] = (5, 5, 11),
                 n_classes: int = 256, hop_length: int = 275,
                 n_res_block: int = 10, n_rnn: int = 512,
                 n_fc: int = 512, kernel_size: int = 5,
                 n_freq: int = 128, n_hidden: int = 128,
                 n_output: int = 128):
        if math.prod(upsample_scales) != hop_length:
            raise ValueError("prod(upsample_scales) must equal "
                             "hop_length")
        if n_output % 4:
            raise ValueError("n_output must divide by 4 (aux splits)")
        self.scales = tuple(upsample_scales)
        self.n_classes = n_classes
        self.hop = hop_length
        self.n_res_block = n_res_block
        self.n_rnn = n_rnn
        self.n_fc = n_fc
        self.kernel = kernel_size
        self.n_freq = n_freq
        self.n_hidden = n_hidden
        self.n_output = n_output
        self.n_aux = n_output // 4
        self._config = (self.scales, n_classes, hop_length, n_res_block,
                        n_rnn, n_fc, kernel_size, n_freq, n_hidden,
                        n_output)

    def init(self, key):
        keys = iter(jax.random.split(key, 32 + 2 * self.n_res_block))
        h = self.n_hidden
        ln = lambda c: {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}
        resnet = {
            "conv_in": _conv(next(keys), self.kernel, self.n_freq, h),
            "ln_in": ln(h),
            "blocks": [{"c1": _conv(next(keys), 1, h, h), "n1": ln(h),
                        "c2": _conv(next(keys), 1, h, h), "n2": ln(h)}
                       for _ in range(self.n_res_block)],
            "conv_out": _conv(next(keys), 1, h, self.n_output),
            "out_b": jnp.zeros((self.n_output,)),
        }
        # smoothing convs of the upsample net: fixed-average init
        ups = [jnp.full((2 * s + 1, 1, 1), 1.0 / (2 * s + 1))
               for s in self.scales]
        gru = lambda cin: {"wx": _dense(next(keys), cin, 3 * self.n_rnn),
                           "wh": _dense(next(keys), self.n_rnn,
                                        3 * self.n_rnn),
                           "bx": jnp.zeros((3 * self.n_rnn,)),
                           "bh": jnp.zeros((3 * self.n_rnn,))}
        d_in = 1 + self.n_freq + self.n_aux
        return {
            "resnet": resnet, "upsample": ups,
            "fc_in": {"w": _dense(next(keys), d_in, self.n_rnn),
                      "b": jnp.zeros((self.n_rnn,))},
            "gru1": gru(self.n_rnn),
            "gru2": gru(self.n_rnn + self.n_aux),
            "fc1": {"w": _dense(next(keys), self.n_rnn + self.n_aux,
                                self.n_fc),
                    "b": jnp.zeros((self.n_fc,))},
            "fc2": {"w": _dense(next(keys), self.n_fc + self.n_aux,
                                self.n_fc),
                    "b": jnp.zeros((self.n_fc,))},
            "fc3": {"w": _dense(next(keys), self.n_fc, self.n_classes),
                    "b": jnp.zeros((self.n_classes,))},
        }

    # -- conditioning ------------------------------------------------------
    @staticmethod
    def _affine(x, p):
        """Frozen-BN inference form: per-channel scale + shift."""
        return x * p["g"] + p["b"]

    def _melresnet(self, p, spec):                 # (B, Tm, F) -> (B, T', O)
        y = jax.nn.relu(self._affine(_conv1d(spec, p["conv_in"]),
                                     p["ln_in"]))
        for blk in p["blocks"]:
            z = jax.nn.relu(self._affine(_conv1d(y, blk["c1"], "SAME"),
                                         blk["n1"]))
            z = self._affine(_conv1d(z, blk["c2"], "SAME"), blk["n2"])
            y = y + z
        return _conv1d(y, p["conv_out"]) + p["out_b"]

    def _stretch(self, x, factor):                 # repeat along time
        return jnp.repeat(x, factor, axis=1)

    def _upsample(self, params, spec):
        """(B, Tm, F) → cond (B, T, F), aux (B, T, n_output)."""
        aux = self._melresnet(params["resnet"], spec)
        aux = self._stretch(aux, self.hop)
        y = spec
        for s, w in zip(self.scales, params["upsample"]):
            y = self._smooth(self._stretch(y, s), w)
        trim = (self.kernel - 1) // 2 * self.hop
        y = y[:, trim:y.shape[1] - trim]
        return y, aux

    @staticmethod
    def _smooth(y, w):
        """Depth-shared 1-D average along time: (B, T, F), w (K, 1, 1)."""
        b, t, f = y.shape
        flat = y.transpose(0, 2, 1).reshape(b * f, t, 1)
        out = jax.lax.conv_general_dilated(
            flat, w, (1,), "SAME",
            dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32)
        return out.reshape(b, f, t).transpose(0, 2, 1)

    # -- GRU ---------------------------------------------------------------
    def _gru(self, p, xs):
        """xs (T, B, 3H) precomputed input projections → hs (T, B, H)."""
        hdim = self.n_rnn

        def step(h, x_t):
            gx = x_t + p["bx"]
            gh = h @ p["wh"] + p["bh"]
            r = jax.nn.sigmoid(gx[:, :hdim] + gh[:, :hdim])
            z = jax.nn.sigmoid(gx[:, hdim:2 * hdim]
                               + gh[:, hdim:2 * hdim])
            n = jnp.tanh(gx[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
            h = (1 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((xs.shape[1], hdim), xs.dtype)
        _, hs = jax.lax.scan(step, h0, xs)
        return hs

    def _run_gru(self, p, x):                      # (B, T, Cin)
        xs = jnp.transpose(x @ p["wx"], (1, 0, 2))  # hoisted input GEMM
        return jnp.transpose(self._gru(p, xs), (1, 0, 2))

    # -- forward -----------------------------------------------------------
    def apply(self, params, waveform, specgram):
        waveform = jnp.asarray(waveform)
        specgram = jnp.asarray(specgram)
        if waveform.ndim != 2 or specgram.ndim != 3:
            raise ValueError("waveform (B, T), specgram (B, n_freq, Tm)")
        spec = jnp.transpose(specgram, (0, 2, 1))   # (B, Tm, F)
        cond, aux = self._upsample(params, spec)
        t = waveform.shape[1]
        if cond.shape[1] != t or aux.shape[1] != t:
            raise ValueError(
                f"waveform length {t} != hop*(T_mel-kernel+1) = "
                f"{cond.shape[1]}")
        a = [aux[..., i * self.n_aux:(i + 1) * self.n_aux]
             for i in range(4)]
        x = jnp.concatenate([waveform[..., None], cond, a[0]], -1)
        x = x @ params["fc_in"]["w"] + params["fc_in"]["b"]
        res = x
        x = self._run_gru(params["gru1"], x)
        x = x + res
        res = x
        x = self._run_gru(params["gru2"],
                          jnp.concatenate([x, a[1]], -1))
        x = x + res
        x = jax.nn.relu(jnp.concatenate([x, a[2]], -1)
                        @ params["fc1"]["w"] + params["fc1"]["b"])
        x = jax.nn.relu(jnp.concatenate([x, a[3]], -1)
                        @ params["fc2"]["w"] + params["fc2"]["b"])
        return x @ params["fc3"]["w"] + params["fc3"]["b"]

    # -- inference -----------------------------------------------------------
    def _gru_cell(self, p, h, x):
        """One GRU step with the un-hoisted input projection."""
        hdim = self.n_rnn
        gx = x @ p["wx"] + p["bx"]
        gh = h @ p["wh"] + p["bh"]
        r = jax.nn.sigmoid(gx[:, :hdim] + gh[:, :hdim])
        z = jax.nn.sigmoid(gx[:, hdim:2 * hdim]
                           + gh[:, hdim:2 * hdim])
        n = jnp.tanh(gx[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
        return (1 - z) * n + z * h

    def infer(self, params, specgram, key):
        """Autoregressive generation (torchaudio's ``WaveRNN.infer``):
        ``specgram (B, n_freq, T_mel)`` → waveform ``(B, T)`` with
        ``T = hop·(T_mel − kernel + 1)``, sampled from the per-step
        softmax.  Values are the normalized class centers
        ``2·c/(n_classes−1) − 1`` ∈ [−1, 1]; apply
        ``ops.mu_law_decoding``-style expansion yourself if training
        used companded targets.  One ``lax.scan`` over time (the
        sequential dependency is intrinsic); per-step keys are
        ``jax.random.split`` chained from ``key``.
        """
        specgram = jnp.asarray(specgram)
        if specgram.ndim != 3:
            raise ValueError("specgram must be (B, n_freq, T_mel)")
        spec = jnp.transpose(specgram, (0, 2, 1))
        cond, aux = self._upsample(params, spec)     # (B, T, ·)
        B, T = cond.shape[:2]
        a = [aux[..., i * self.n_aux:(i + 1) * self.n_aux]
             for i in range(4)]
        seq = jnp.moveaxis(
            jnp.concatenate([cond] + a, -1), 1, 0)   # (T, B, F+4a)
        F = cond.shape[-1]
        na = self.n_aux

        def step(carry, in_t):
            h1, h2, prev, k = carry
            cond_t = in_t[:, :F]
            a0 = in_t[:, F:F + na]
            a1 = in_t[:, F + na:F + 2 * na]
            a2 = in_t[:, F + 2 * na:F + 3 * na]
            a3 = in_t[:, F + 3 * na:]
            x = jnp.concatenate([prev[:, None], cond_t, a0], -1)
            x = x @ params["fc_in"]["w"] + params["fc_in"]["b"]
            res = x
            h1 = self._gru_cell(params["gru1"], h1, x)
            x = h1 + res
            res = x
            h2 = self._gru_cell(params["gru2"], h2,
                                jnp.concatenate([x, a1], -1))
            x = h2 + res
            x = jax.nn.relu(jnp.concatenate([x, a2], -1)
                            @ params["fc1"]["w"] + params["fc1"]["b"])
            x = jax.nn.relu(jnp.concatenate([x, a3], -1)
                            @ params["fc2"]["w"] + params["fc2"]["b"])
            logits = x @ params["fc3"]["w"] + params["fc3"]["b"]
            k, sub = jax.random.split(k)
            cls = jax.random.categorical(sub, logits)
            sample = 2.0 * cls.astype(jnp.float32) \
                / (self.n_classes - 1) - 1.0
            return (h1, h2, sample, k), sample

        h0 = jnp.zeros((B, self.n_rnn), jnp.float32)
        init = (h0, h0, jnp.zeros((B,), jnp.float32), key)
        _, samples = jax.lax.scan(step, init, seq)
        return jnp.moveaxis(samples, 0, 1)           # (B, T)

    def __call__(self, params, waveform, specgram):
        return self.apply(params, waveform, specgram)
