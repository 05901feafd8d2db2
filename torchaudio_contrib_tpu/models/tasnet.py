"""ConvTasNet (Luo & Mesgarani 2019) — time-domain source separation.

Not in the reference (SURVEY §2 — no model zoo); implements
torchaudio's ``models.ConvTasNet`` architecture exactly (round 4 —
verified by forward parity against a torch replica built from ``nn``
primitives, ``tests/test_import_torch_extra.py``): learned encoder
(strided 1-D conv, ``padding=stride``, bias-free, NO activation), a
TCN mask estimator (``X`` dilated depthwise blocks × ``R`` repeats,
exponential dilations, GroupNorm(1) == global layernorm ``eps=1e-8``,
separate residual + skip 1×1 convs per block — the LAST block has no
residual path), ``PReLU`` single-parameter activations, sigmoid masks
over ``sources × enc_filters``, and a shared bias-free transposed-conv
decoder.  The network is convs end to end — an ideal MXU fit; one
jitted program, no recurrence anywhere.

Pure-functional ``init``/``apply`` (the ``MelFrontendClassifier``
idiom); trains against ``ops.si_snr`` in ``tests/test_tasnet.py``.
Published torch checkpoints import via
``utils.import_torch.import_conv_tasnet``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["ConvTasNet"]


def _conv_init(key, k, cin, cout):
    s = math.sqrt(6.0 / (k * cin + k * cout))
    return jax.random.uniform(key, (k, cin, cout), jnp.float32, -s, s)


def _glayernorm(x, p):
    """GroupNorm(num_groups=1): stats over (time, channel) per clip,
    per-channel affine — torch's ``GroupNorm(1, C, eps=1e-8)``."""
    mu = jnp.mean(x, (-2, -1), keepdims=True)
    var = jnp.var(x, (-2, -1), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-8) * p["g"] + p["b"]


def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def _conv1x1(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), "VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)
    return y + p["b"]


class ConvTasNet:
    """``apply(params, mix (B, time)) -> (B, num_sources, time)``.

    Defaults follow the paper / torchaudio: ``enc_filters`` N=512,
    ``enc_kernel`` L=16 (stride L/2), bottleneck B=128, hidden H=512,
    TCN kernel P=3, ``num_blocks`` X=8 (dilations 1..2^{X-1}),
    ``num_repeats`` R=3.
    """

    def __init__(self, num_sources: int = 2, enc_kernel: int = 16,
                 enc_filters: int = 512, bottleneck: int = 128,
                 hidden: int = 512, tcn_kernel: int = 3,
                 num_blocks: int = 8, num_repeats: int = 3):
        if enc_kernel % 2:
            raise ValueError("enc_kernel must be even (stride L/2)")
        self.ns = num_sources
        self.L = enc_kernel
        self.N = enc_filters
        self.B = bottleneck
        self.H = hidden
        self.P = tcn_kernel
        self.X = num_blocks
        self.R = num_repeats
        self._config = (num_sources, enc_kernel, enc_filters,
                        bottleneck, hidden, tcn_kernel, num_blocks,
                        num_repeats)

    def init(self, key):
        n_blocks = self.R * self.X
        keys = iter(jax.random.split(key, 4 + n_blocks * 4 + 1))
        ln = lambda c: {"g": jnp.ones((1, c)), "b": jnp.zeros((1, c))}
        blocks = []
        for i in range(n_blocks):
            blk = {
                "in": {"w": _conv_init(next(keys), 1, self.B, self.H),
                       "b": jnp.zeros((self.H,))},
                "a1": jnp.full((1,), 0.25),
                "n1": ln(self.H),
                "dw": {"w": _conv_init(next(keys), self.P, 1, self.H),
                       "b": jnp.zeros((self.H,))},
                "a2": jnp.full((1,), 0.25),
                "n2": ln(self.H),
                "skip": {"w": _conv_init(next(keys), 1, self.H,
                                         self.B),
                         "b": jnp.zeros((self.B,))},
            }
            if i != n_blocks - 1:   # last block: skip path only
                blk["res"] = {"w": _conv_init(next(keys), 1, self.H,
                                              self.B),
                              "b": jnp.zeros((self.B,))}
            else:
                next(keys)
            blocks.append(blk)
        return {
            "enc": _conv_init(next(keys), self.L, 1, self.N),
            "ln_in": ln(self.N),
            "bottleneck": {"w": _conv_init(next(keys), 1, self.N,
                                           self.B),
                           "b": jnp.zeros((self.B,))},
            "blocks": blocks,
            "mask_a": jnp.full((1,), 0.25),
            "mask": {"w": _conv_init(next(keys), 1, self.B,
                                     self.ns * self.N),
                     "b": jnp.zeros((self.ns * self.N,))},
            "dec": _conv_init(next(keys), self.L, 1, self.N),
        }

    def _dw_conv(self, y, p, dilation):
        z = jax.lax.conv_general_dilated(
            y, p["w"], window_strides=(1,),
            padding=[((self.P - 1) * dilation // 2,) * 2],
            rhs_dilation=(dilation,),
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=self.H,
            preferred_element_type=jnp.float32)
        return z + p["b"]

    def apply(self, params, mix):
        mix = jnp.asarray(mix)
        if mix.ndim != 2:
            raise ValueError("mix must be (batch, time)")
        b, t = mix.shape
        stride = self.L // 2
        # torch arithmetic: conv padding=stride both sides; pad the
        # clip to a stride multiple (>= L) so encoder/decoder round-
        # trip restores the length exactly
        pad = (-t) % stride
        if t + pad < self.L:
            pad = self.L - t
        x = jnp.pad(mix, ((0, 0), (0, pad)))[..., None]   # (B, T+, 1)

        # learned encoder (bias-free, NO activation — torch parity)
        feats = jax.lax.conv_general_dilated(
            x, params["enc"], window_strides=(stride,),
            padding=[(stride, stride)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32)           # (B, F, N)

        # TCN mask estimator
        y = _glayernorm(feats, params["ln_in"])
        y = _conv1x1(y, params["bottleneck"])             # (B, F, Bc)
        skip_sum = 0.0
        for i, blk in enumerate(params["blocks"]):
            dilation = 2 ** (i % self.X)
            z = _conv1x1(y, blk["in"])
            z = _glayernorm(_prelu(z, blk["a1"]), blk["n1"])
            z = self._dw_conv(z, blk["dw"], dilation)
            z = _glayernorm(_prelu(z, blk["a2"]), blk["n2"])
            if "res" in blk:
                y = y + _conv1x1(z, blk["res"])
            skip_sum = skip_sum + _conv1x1(z, blk["skip"])

        m = _conv1x1(_prelu(skip_sum, params["mask_a"]),
                     params["mask"])
        masks = jax.nn.sigmoid(
            m.reshape(b, -1, self.ns, self.N))            # (B, F, S, N)

        # masked features → learned decoder (transposed conv,
        # torch padding=stride ⇒ lax lo/hi = L - 1 - stride)
        sep = feats[:, :, None, :] * masks                # (B, F, S, N)
        sep = jnp.transpose(sep, (0, 2, 1, 3)).reshape(
            b * self.ns, -1, self.N)
        tp = self.L - 1 - stride
        wav = jax.lax.conv_transpose(
            sep, params["dec"], strides=(stride,),
            padding=[(tp, tp)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            transpose_kernel=True)                        # (B*S, T+, 1)
        wav = wav[..., 0].reshape(b, self.ns, -1)
        return wav[:, :, :t]

    def __call__(self, params, mix):
        return self.apply(params, mix)
