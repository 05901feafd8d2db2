"""HiFi-GAN vocoder (Kong et al. 2020) — mel → waveform generator.

Not in the reference (SURVEY §2 — no model zoo); mirrors torchaudio's
``prototype.models.HiFiGANVocoder`` capability surface (generator only,
as torchaudio ships it; the GAN discriminators are a training recipe,
not part of the model API).  [ref-recon: torchaudio/prototype/models/
_hifi_gan.py — UNVERIFIED, mount empty]

TPU shape: the whole network is 1-D convs — conv_pre, a stack of
stride-``u`` transposed convs (total upsampling ``prod(rates)``, e.g.
256 = one hop), each followed by a multi-receptive-field fusion (MRF)
module summing parallel dilated ResBlocks, then conv_post → tanh.
Zero recurrence: one jitted program, every FLOP on the MXU.  The
transposed convs use ``lax.conv_transpose`` with the padding solved so
output length is exactly ``frames × prod(rates)`` (the torch
``padding=(k−u)//2`` arithmetic).  Plain convs stand in for torch's
``weight_norm`` wrappers — weight norm is a reparameterized
initialization, not an architecture change; fold-in is the standard
inference form.

Pure-functional ``init``/``apply`` (the ``ConvTasNet`` idiom).
Factories ``hifigan_vocoder_v1/v2/v3`` pin the three published
configurations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "HiFiGANVocoder",
    "hifigan_vocoder_v1", "hifigan_vocoder_v2", "hifigan_vocoder_v3",
]


def _conv(x, w, b, *, dilation=1):
    """'Same' 1-D conv, NTC, odd kernel."""
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)
    return y + b


class HiFiGANVocoder:
    """``apply(params, mel (B, in_channels, frames)) -> (B, 1, frames·U)``
    with ``U = prod(upsample_rates)``; also accepts ``(in_channels,
    frames)`` and returns ``(1, frames·U)``.

    ``resblock_type`` 1 = two convs per dilation (v1/v2), 2 = one conv
    per dilation (v3).  Defaults are the published v1 configuration.
    """

    def __init__(self, in_channels: int = 80,
                 upsample_rates=(8, 8, 2, 2),
                 upsample_initial_channel: int = 512,
                 upsample_kernel_sizes=(16, 16, 4, 4),
                 resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilation_sizes=((1, 3, 5),) * 3,
                 resblock_type: int = 1,
                 lrelu_slope: float = 0.1):
        if len(upsample_rates) != len(upsample_kernel_sizes):
            raise ValueError("need one kernel size per upsample rate")
        if len(resblock_kernel_sizes) != len(resblock_dilation_sizes):
            raise ValueError(
                "need one dilation tuple per resblock kernel size")
        if resblock_type not in (1, 2):
            raise ValueError("resblock_type must be 1 or 2")
        for k, u in zip(upsample_kernel_sizes, upsample_rates):
            if (k - u) % 2:
                raise ValueError(
                    f"upsample kernel {k} minus rate {u} must be even "
                    "(torch padding=(k-u)//2 arithmetic)")
        self.in_channels = in_channels
        self.rates = tuple(upsample_rates)
        self.c0 = upsample_initial_channel
        self.up_kernels = tuple(upsample_kernel_sizes)
        self.rb_kernels = tuple(resblock_kernel_sizes)
        self.rb_dilations = tuple(tuple(d) for d in
                                  resblock_dilation_sizes)
        self.rb_type = resblock_type
        self.slope = lrelu_slope
        self.upsample_factor = 1
        for u in self.rates:
            self.upsample_factor *= u

    # -- params ---------------------------------------------------

    def _w(self, key, k, cin, cout):
        # torch HiFi-GAN init: normal(0, 0.01) on every conv weight
        return 0.01 * jax.random.normal(key, (k, cin, cout),
                                        jnp.float32)

    def init(self, key):
        n_rb_convs = sum(len(d) for d in self.rb_dilations) \
            * (2 if self.rb_type == 1 else 1)
        n = 2 + len(self.rates) * (1 + n_rb_convs)
        keys = iter(jax.random.split(key, n))
        p = {"pre": {"w": self._w(next(keys), 7, self.in_channels,
                                  self.c0),
                     "b": jnp.zeros((self.c0,))},
             "ups": [], "mrf": []}
        c = self.c0
        for k_up in self.up_kernels:
            # transpose_kernel=True TIO: (k, out_of_transpose, in)
            p["ups"].append({"w": self._w(next(keys), k_up, c // 2, c),
                             "b": jnp.zeros((c // 2,))})
            c //= 2
            layer = []
            for k_rb, dils in zip(self.rb_kernels, self.rb_dilations):
                convs = []
                for _ in dils:
                    blk = {"w1": self._w(next(keys), k_rb, c, c),
                           "b1": jnp.zeros((c,))}
                    if self.rb_type == 1:
                        blk["w2"] = self._w(next(keys), k_rb, c, c)
                        blk["b2"] = jnp.zeros((c,))
                    convs.append(blk)
                layer.append(convs)
            p["mrf"].append(layer)
        p["post"] = {"w": self._w(next(keys), 7, c, 1),
                     "b": jnp.zeros((1,))}
        return p

    # -- forward --------------------------------------------------

    def _resblock(self, x, convs, dilations):
        for blk, d in zip(convs, dilations):
            xt = _conv(jax.nn.leaky_relu(x, self.slope),
                       blk["w1"], blk["b1"], dilation=d)
            if self.rb_type == 1:
                xt = _conv(jax.nn.leaky_relu(xt, self.slope),
                           blk["w2"], blk["b2"], dilation=1)
            x = x + xt
        return x

    def apply(self, params, mel):
        mel = jnp.asarray(mel)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        if mel.ndim != 3 or mel.shape[1] != self.in_channels:
            raise ValueError(
                f"mel must be (batch, {self.in_channels}, frames), "
                f"got {mel.shape}")
        x = jnp.transpose(mel, (0, 2, 1))              # NTC
        x = _conv(x, params["pre"]["w"], params["pre"]["b"])
        for up, layer, u, k in zip(params["ups"], params["mrf"],
                                   self.rates, self.up_kernels):
            x = jax.nn.leaky_relu(x, self.slope)
            # out = frames·u  ⇔  lo+hi = u+k−2; torch pad p=(k−u)//2
            # maps to transposed-conv pad k−1−p per side
            pad = k - 1 - (k - u) // 2
            x = jax.lax.conv_transpose(
                x, up["w"], strides=(u,), padding=[(pad, pad)],
                dimension_numbers=("NTC", "TIO", "NTC"),
                transpose_kernel=True) + up["b"]
            acc = 0.0
            for convs, dils in zip(layer, self.rb_dilations):
                acc = acc + self._resblock(x, convs, dils)
            x = acc / len(self.rb_kernels)
        # the published generator's final activation is a BARE
        # F.leaky_relu(x) — torch's default slope 0.01, NOT the 0.1
        # used everywhere else (checkpoint parity depends on it)
        x = jax.nn.leaky_relu(x, 0.01)
        x = jnp.tanh(_conv(x, params["post"]["w"],
                           params["post"]["b"]))
        wav = jnp.transpose(x, (0, 2, 1))              # (B, 1, T)
        return wav[0] if squeeze else wav

    def __call__(self, params, mel):
        return self.apply(params, mel)


def hifigan_vocoder_v1(in_channels: int = 80) -> HiFiGANVocoder:
    """Published v1 config: 256× upsampling, 512 initial channels."""
    return HiFiGANVocoder(in_channels=in_channels)


def hifigan_vocoder_v2(in_channels: int = 80) -> HiFiGANVocoder:
    """v1 topology at 128 initial channels (small/fast variant)."""
    return HiFiGANVocoder(in_channels=in_channels,
                          upsample_initial_channel=128)


def hifigan_vocoder_v3(in_channels: int = 80) -> HiFiGANVocoder:
    """v3: 256× as 8·8·4, ResBlock2 (one conv per dilation)."""
    return HiFiGANVocoder(
        in_channels=in_channels,
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
        resblock_type=2)
