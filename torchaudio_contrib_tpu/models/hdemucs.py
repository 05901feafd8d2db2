"""Hybrid Demucs (v3) music source separation (Défossez, 2021).

Not in the reference (SURVEY §2 — torchaudio-contrib has no model
zoo); mirrors torchaudio's ``models.HDemucs`` capability: a
time-domain U-Net and an STFT-domain (complex-as-channels) U-Net that
merge into shared inner layers and split again on the way out, each
encoder/decoder layer carrying a dilated-conv residual branch
(``DConv``) with a BiLSTM + banded self-attention in the shared
(innermost) layers; the model emits one waveform per source from BOTH
branches (time decoder directly, frequency decoder through an iSTFT)
and sums them.

TPU-first design notes:

* all convolutions are MXU ``conv_general_dilated`` calls with static
  shapes; the frequency branch convolves along the frequency axis only
  (kernel ``(k, 1)``), so freq layers batch over time natively;
* the STFT/iSTFT ride this package's GEMM/FFT paths (`ops.stft`);
  complex-as-channels keeps the network real-valued end to end;
* the DConv BiLSTM is two ``lax.scan``s with hoisted input GEMMs; the
  "local" attention is one banded-mask MHA (static band, no gathers);
* geometry is pinned by construction: ``hop = stride **
  branch_depth`` makes the time-branch length equal the spectrogram
  frame count at the merge point, with one shared padding computation
  (``valid_length``) instead of torch-side cropping.

Normalization uses channel LayerNorm (GroupNorm(1) equivalent)
throughout — demucs' GroupNorm(4) differs only in grouping and
requires running no batch statistics either.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ._common import _dense, _ln, _ln_p

from ..ops.stft import stft as _stft, istft as _istft
from ..ops.windows import hann_window

__all__ = ["HDemucs"]


def _conv_w(key, k, cin, cout):
    s = math.sqrt(6.0 / (k * cin + k * cout))
    return jax.random.uniform(key, (k, cin, cout), jnp.float32, -s, s)


def _gn(x, p):
    """GroupNorm(1) as in demucs: stats over (length, channels)
    jointly — well-defined even for a single channel (a per-channel
    LayerNorm would zero a width-1 DConv compression)."""
    mu = jnp.mean(x, (-2, -1), keepdims=True)
    var = jnp.var(x, (-2, -1), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _conv1d(x, w, stride=1, dilation=1, pad=0):
    """``x (B, L, C)`` NTC conv."""
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)


def _tconv1d(x, w, stride):
    """Transposed conv, ``x (B, L, C)``, kernel ``(k, cin, cout)``;
    output length ``L*stride`` (kernel k >= stride, symmetric crop)."""
    k = w.shape[0]
    y = jax.lax.conv_transpose(
        x, w, (stride,), "VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)
    # full length L*stride + (k - stride); crop (k-stride)//2 each side
    lo = (k - stride) // 2
    return y[:, lo:lo + x.shape[1] * stride]


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class HDemucs:
    """``apply(params, mix (B, audio_channels, T))`` →
    ``(B, n_sources, audio_channels, T)``.

    ``depth`` branch layers (stride 4 each; the frequency branch
    strides along frequency) + ``shared_depth`` shared 1-D layers.
    ``hop = stride**depth`` so the branches align at the merge; the
    input is padded to ``hop * stride**shared_depth`` internally and
    cropped back.  ``nfft//2`` must be divisible by
    ``stride**depth``."""

    def __init__(self, sources: Sequence[str] = ("drums", "bass",
                                                 "other", "vocals"),
                 audio_channels: int = 2, channels: int = 48,
                 growth: float = 2.0, depth: int = 4,
                 shared_depth: int = 2, nfft: int = 4096,
                 kernel: int = 8, stride: int = 4,
                 dconv_depth: int = 2, dconv_comp: int = 4,
                 attn_window: int = 100):
        if kernel < stride or (kernel - stride) % 2:
            raise ValueError("need kernel >= stride with even "
                             "(kernel - stride)")
        self.sources = tuple(sources)
        self.S = len(self.sources)
        self.C = audio_channels
        self.depth = depth
        self.shared = shared_depth
        self.nfft = nfft
        self.K = kernel
        self.st = stride
        self.hop = stride ** depth
        self.F0 = nfft // 2
        if self.F0 % self.hop:
            raise ValueError(f"nfft//2 ({self.F0}) must be divisible "
                             f"by stride**depth ({self.hop})")
        self.Fm = self.F0 // self.hop     # freq bins at merge
        self.dconv_depth = dconv_depth
        self.dconv_comp = dconv_comp
        self.attn_window = attn_window
        # channel plan: layer i outputs ch[i]
        self.ch = [int(round(channels * growth ** i))
                   for i in range(depth + shared_depth)]
        self._win = jnp.asarray(hann_window(nfft))

    # -- parameter construction -------------------------------------
    def _dconv_p(self, key, ch, lstm_attn: bool):
        hid = max(ch // self.dconv_comp, 1)
        keys = iter(jax.random.split(key, 8 * self.dconv_depth))
        blocks = []
        for d in range(self.dconv_depth):
            b = {"w1": _conv_w(next(keys), 3, ch, hid),
                 "n1": _ln_p(hid),
                 "w2": _conv_w(next(keys), 1, hid, 2 * ch),
                 "n2": _ln_p(2 * ch),
                 "scale": jnp.full((ch,), 0.1)}
            if lstm_attn:
                b["lstm"] = {
                    "wi": _dense(next(keys), hid, 8 * hid),
                    "wh": _dense(next(keys), hid, 8 * hid),
                    "bi": jnp.zeros((8 * hid,)),
                    "proj": _dense(next(keys), 2 * hid, hid)}
                b["attn"] = {
                    "wqkv": _dense(next(keys), hid, 3 * hid),
                    "wo": _dense(next(keys), hid, hid),
                    "n": _ln_p(hid)}
            blocks.append(b)
        return blocks

    def _enc_p(self, key, cin, cout, lstm_attn=False):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"w": _conv_w(k1, self.K, cin, cout),
                "n": _ln_p(cout),
                "dconv": self._dconv_p(k2, cout, lstm_attn),
                "wg": _conv_w(k3, 1, cout, 2 * cout),
                "ng": _ln_p(2 * cout)}

    def _dec_p(self, key, cin, cout):
        k1, k2 = jax.random.split(key, 2)
        return {"wg": _conv_w(k1, 1, cin, 2 * cin),
                "ng": _ln_p(2 * cin),
                "w": _conv_w(k2, self.K, cin, cout)}

    def init(self, key):
        d, sh = self.depth, self.shared
        keys = iter(jax.random.split(key, 4 * (d + sh) + 8))
        ch = self.ch
        p = {"enc_t": [], "enc_f": [], "enc_s": [],
             "dec_t": [], "dec_f": [], "dec_s": []}
        cins_t = [self.C] + ch[:d - 1]
        cins_f = [2 * self.C] + ch[:d - 1]
        for i in range(d):
            p["enc_t"].append(self._enc_p(next(keys), cins_t[i], ch[i]))
            p["enc_f"].append(self._enc_p(next(keys), cins_f[i], ch[i]))
        for i in range(sh):
            p["enc_s"].append(self._enc_p(
                next(keys), ch[d - 1 + i], ch[d + i], lstm_attn=True))
        for i in reversed(range(sh)):
            p["dec_s"].append(self._dec_p(
                next(keys), ch[d + i], ch[d - 1 + i]))
        for i in reversed(range(d)):
            cout_t = self.S * self.C if i == 0 else cins_t[i]
            cout_f = self.S * 2 * self.C if i == 0 else cins_f[i]
            p["dec_t"].append(self._dec_p(next(keys), ch[i], cout_t))
            p["dec_f"].append(self._dec_p(next(keys), ch[i], cout_f))
        # frequency positional embedding after freq layer 0
        p["freq_emb"] = 0.2 * jax.random.normal(
            next(keys), (self.F0 // self.st, ch[0]))
        # merge (collapse Fm->1) and unmerge (1->Fm) frequency convs
        p["merge"] = {"w": _conv_w(next(keys), self.Fm,
                                   ch[d - 1], ch[d - 1])}
        p["unmerge"] = {"w": _conv_w(next(keys), self.Fm,
                                     ch[d - 1], ch[d - 1])}
        return p

    # -- DConv residual branch --------------------------------------
    def _bilstm(self, p, x):
        """``x (B, L, H)`` → BiLSTM → (B, L, H); input GEMMs hoisted
        out of the scans."""
        B, L, H = x.shape
        gates_all = x @ p["wi"] + p["bi"]        # (B, L, 8H)
        fwd_in, bwd_in = jnp.split(gates_all, 2, axis=-1)

        def cell(carry, gin, wh):
            h, c = carry
            g = gin + h @ wh
            i, f, o, u = jnp.split(g, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(u)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        z0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
        wh_f, wh_b = jnp.split(p["wh"], 2, axis=-1)
        _, hf = jax.lax.scan(lambda c, g: cell(c, g, wh_f), z0,
                             jnp.swapaxes(fwd_in, 0, 1))
        _, hb = jax.lax.scan(lambda c, g: cell(c, g, wh_b), z0,
                             jnp.swapaxes(bwd_in[:, ::-1], 0, 1))
        h = jnp.concatenate([jnp.swapaxes(hf, 0, 1),
                             jnp.swapaxes(hb, 0, 1)[:, ::-1]], -1)
        return h @ p["proj"]

    def _band_attn(self, p, x):
        """One-head self-attention restricted to a ±window band."""
        B, L, H = x.shape
        y = _ln(x, p["n"])
        q, k, v = jnp.split(y @ p["wqkv"], 3, axis=-1)
        logits = jnp.einsum("bqh,bkh->bqk", q, k) / math.sqrt(H)
        idx = jnp.arange(L)
        band = jnp.abs(idx[:, None] - idx[None, :]) <= self.attn_window
        logits = jnp.where(band[None], logits, -1e9)
        return jnp.einsum("bqk,bkh->bqh",
                          jax.nn.softmax(logits, -1), v) @ p["wo"]

    def _dconv(self, blocks, x):
        """``x (B, L, C)`` residual dilated-conv stack."""
        for d, b in enumerate(blocks):
            y = _conv1d(x, b["w1"], dilation=2 ** d, pad=2 ** d)
            y = jax.nn.gelu(_gn(y, b["n1"]))
            if "lstm" in b:
                y = y + self._bilstm(b["lstm"], y)
            if "attn" in b:
                y = y + self._band_attn(b["attn"], y)
            y = _glu(_gn(_conv1d(y, b["w2"]), b["n2"]))
            x = x + b["scale"] * y
        return x

    # -- encoder / decoder layers -----------------------------------
    def _enc1d(self, p, x):
        """``x (B, L, C)`` → (B, L/stride, C')."""
        pad = (self.K - self.st) // 2
        y = jax.nn.gelu(_ln(_conv1d(x, p["w"], self.st, pad=pad),
                            p["n"]))
        y = self._dconv(p["dconv"], y)
        return _glu(_ln(_conv1d(y, p["wg"]), p["ng"]))

    def _dec1d(self, p, x, skip, last=False):
        y = x + skip
        y = _glu(_ln(_conv1d(y, p["wg"]), p["ng"]))
        y = _tconv1d(y, p["w"], self.st)
        return y if last else jax.nn.gelu(y)

    def _enc2d(self, p, z):
        """Frequency-axis conv: ``z (B, F, L, C)`` → (B, F/st, L, C')
        by folding time into batch."""
        B, F, L, C = z.shape
        y = self._enc1d(p, jnp.swapaxes(z, 1, 2).reshape(B * L, F, C))
        return jnp.swapaxes(y.reshape(B, L, F // self.st, -1), 1, 2)

    def _dec2d(self, p, z, skip, last=False):
        B, F, L, C = z.shape
        x = jnp.swapaxes(z, 1, 2).reshape(B * L, F, C)
        s = jnp.swapaxes(skip, 1, 2).reshape(B * L, F, -1)
        y = self._dec1d(p, x, s, last)
        return jnp.swapaxes(y.reshape(B, L, F * self.st, -1), 1, 2)

    # -- forward ----------------------------------------------------
    def valid_length(self, length: int) -> int:
        unit = self.hop * self.st ** self.shared
        return -(-length // unit) * unit

    def apply(self, params, mix):
        if mix.ndim != 3 or mix.shape[1] != self.C:
            raise ValueError(
                f"mix must be (batch, {self.C}, time), got {mix.shape}")
        B, C, T = mix.shape
        Tp = self.valid_length(T)
        # per-sample standardization (demucs convention) — stats on
        # the ORIGINAL samples, before padding: otherwise the input
        # scale would jump with T mod the padding unit (up to ~sqrt 2)
        mu = jnp.mean(mix, (1, 2), keepdims=True)
        sd = jnp.std(mix, (1, 2), keepdims=True) + 1e-5
        x = jnp.pad((mix - mu) / sd, ((0, 0), (0, 0), (0, Tp - T)))
        L = Tp // self.hop

        # frequency branch input: CaC spectrogram (B, F0, L, 2C)
        z = _stft(x, self.nfft, self.hop, window=self._win,
                  center=True)                   # (B, C, F0+1, L+1)
        z = z[:, :, :self.F0, :L]
        zr = jnp.concatenate([z.real, z.imag], 1)  # (B, 2C, F0, L)
        zin = jnp.transpose(zr, (0, 2, 3, 1))
        # time branch input (B, Tp, C)
        tin = jnp.swapaxes(x, 1, 2)

        skips_t, skips_f = [], []
        for i in range(self.depth):
            tin = self._enc1d(params["enc_t"][i], tin)
            zin = self._enc2d(params["enc_f"][i], zin)
            if i == 0:  # frequency positional embedding
                zin = zin + params["freq_emb"][None, :, None, :]
            skips_t.append(tin)
            skips_f.append(zin)

        # merge: collapse remaining freq bins and sum the branches
        Bz, Fm, Lz, Cz = zin.shape
        zmerged = _conv1d(jnp.swapaxes(zin, 1, 2).reshape(Bz * Lz, Fm, Cz),
                          params["merge"]["w"]).reshape(Bz, Lz, Cz)
        s = tin + zmerged                        # (B, L, ch[d-1])

        skips_s = []
        for i in range(self.shared):
            s = self._enc1d(params["enc_s"][i], s)
            skips_s.append(s)
        for i in range(self.shared):
            s = self._dec1d(params["dec_s"][i], s,
                            skips_s[self.shared - 1 - i])

        # split back: time branch directly, freq branch via unmerge
        xt = s                                       # (B, L, ch[d-1])
        Cz = s.shape[-1]
        zf = _tconv1d(s.reshape(B * L, 1, Cz),
                      params["unmerge"]["w"], self.Fm)
        zf = jnp.swapaxes(zf.reshape(B, L, self.Fm, Cz), 1, 2)

        for j, i in enumerate(reversed(range(self.depth))):
            xt = self._dec1d(params["dec_t"][j], xt, skips_t[i],
                             last=(i == 0))
            zf = self._dec2d(params["dec_f"][j], zf, skips_f[i],
                             last=(i == 0))

        # time-branch waveforms (B, S, C, Tp)
        wav_t = jnp.swapaxes(xt, 1, 2).reshape(B, self.S, C, Tp)
        # freq-branch CaC -> complex spec -> iSTFT
        spec = jnp.transpose(zf, (0, 3, 1, 2)).reshape(
            B, self.S, 2 * C, self.F0, L)
        spec = jax.lax.complex(spec[:, :, :C], spec[:, :, C:])
        spec = jnp.pad(spec, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
        wav_f = _istft(spec, self.hop, window=self._win, center=True,
                       length=Tp, fft_length=self.nfft)
        out = wav_t + wav_f
        out = out * sd[:, None] + mu[:, None]
        return out[..., :T]

    def __call__(self, params, mix):
        return self.apply(params, mix)
