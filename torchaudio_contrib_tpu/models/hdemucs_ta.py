"""Hybrid Demucs v3 — torchaudio-layout, checkpoint-compatible build.

``models/hdemucs.py`` is this package's TPU-first redesign of the
hybrid time/frequency U-Net; it deliberately simplifies the published
geometry, so the released ``HDEMUCS_HIGH_MUSDB*`` weights can never
load into it.  This module is the complement: a structurally exact
reconstruction of torchaudio's ``models.HDemucs`` (itself a port of
demucs v3), layer for layer, so ``utils.import_torch.import_hdemucs``
can ingest the published ``state_dict`` and forward parity holds.
[ref-recon: torchaudio ``models/_hdemucs.py`` — UNVERIFIED, mount
empty; every semantic below is pinned against an ``nn``-primitive
torch replica in ``tests/test_import_hdemucs.py``.]

Reconstructed geometry (``depth`` layers, high model: depth=6,
nfft=4096, channels=48, growth=2):

* frequency branch: complex-as-channels spectrogram ``(B, 2C, F, T)``
  through ``_HEncLayer``s convolving the FREQUENCY axis (kernel
  ``(8, 1)``, stride ``(4, 1)``, pad 2) until ``F`` collapses
  (``freqs <= kernel`` → one unpadded kernel-``freqs`` conv), then
  time-axis layers (kernel 4, stride 2);
* time branch: ``_HEncLayer``s with kernel 8 / stride 4 on the raw
  waveform, one per frequency layer; the LAST one is ``empty`` (conv
  only) and is *injected* into the matching frequency layer's
  pre-activation — the two branches share all deeper layers;
* every non-empty layer: conv → [GroupNorm(4) from ``norm_starts``]
  → GELU → DConv residual stack (dilated 3-convs, GroupNorm(1), GLU,
  LayerScale; + 2-layer BiLSTM (framed beyond 200 steps) and
  LocalState banded-decay attention from ``dconv_lstm``/``dconv_attn``)
  → 1×1 rewrite conv → [GroupNorm(4)] → GLU;
* decoders mirror with transposed convs, 3×3/3 ``rewrite`` GLU convs
  (``context=1``) and U-Net skips; the time-branch decoder start is
  the frequency decoder's pre-transpose activation at ``F == 1``;
* outputs: frequency decoder → CaC mask → normalized iSTFT; time
  decoder → waveform; the model returns their sum, de-standardized.

TPU-first notes: all convs are static-shape ``conv_general_dilated``
MXU calls kept in torch's NCHW/OIHW layouts (the importer is then a
pure renaming — XLA re-lays out for the TPU anyway); the BiLSTMs are
``lax.scan``s with hoisted input GEMMs and the >200-step framing is a
static gather → batch fold (no dynamic shapes); LocalState attention
is three einsums with a static decay kernel; the STFT/iSTFT ride this
package's GEMM/FFT paths with torch's exact ``normalized=True``
reflect-padded semantics.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.stft import stft as _stft, istft as _istft
from ..ops.windows import hann_window

__all__ = ["HDemucsTA"]


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def _conv_p(key, shape):
    """torch conv reset: U(-1/sqrt(fan_in), +) with fan_in = cin*prod(k)."""
    fan_in = shape[1] * math.prod(shape[2:])
    s = 1.0 / math.sqrt(max(fan_in, 1))
    kw, kb = jax.random.split(key)
    return {"w": _uniform(kw, shape, s),
            "b": _uniform(kb, (shape[0],), s)}


def _tconv_p(key, shape):
    """ConvTranspose reset: fan_in uses the OUT-channel dim of the
    ``(in, out, *k)`` torch layout."""
    fan_in = shape[1] * math.prod(shape[2:])
    s = 1.0 / math.sqrt(max(fan_in, 1))
    kw, kb = jax.random.split(key)
    return {"w": _uniform(kw, shape, s),
            "b": _uniform(kb, (shape[1],), s)}


def _dense_p(key, cin, cout):
    s = 1.0 / math.sqrt(cin)
    kw, kb = jax.random.split(key)
    return {"w": _uniform(kw, (cin, cout), s),
            "b": _uniform(kb, (cout,), s)}


def _gn_p(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _gn(x, p, groups):
    """``nn.GroupNorm(groups, C)`` on ``(B, C, *spatial)``."""
    B, C = x.shape[:2]
    xs = x.reshape(B, groups, -1)
    mu = jnp.mean(xs, -1, keepdims=True)
    var = jnp.var(xs, -1, keepdims=True)
    xs = (xs - mu) * jax.lax.rsqrt(var + 1e-5)
    shape = (1, C) + (1,) * (x.ndim - 2)
    return xs.reshape(x.shape) * p["g"].reshape(shape) \
        + p["b"].reshape(shape)


def _glu_ch(x):
    a, b = jnp.split(x, 2, axis=1)
    return a * jax.nn.sigmoid(b)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _as_nd(v, nd):
    return (v,) * nd if isinstance(v, int) else tuple(v)


def _conv(x, p, stride=1, pad=0, dilation=1):
    """torch-layout conv: 1-D ``x (B, C, T)`` + ``w (O, I, k)`` or 2-D
    ``x (B, C, F, T)`` + ``w (O, I, kf, kt)``; ``stride``/``pad`` are
    ints (torch scalar semantics — every spatial dim) or per-axis
    tuples."""
    nd = x.ndim - 2
    dn = ("NCH", "OIH", "NCH") if nd == 1 else ("NCHW", "OIHW", "NCHW")
    y = jax.lax.conv_general_dilated(
        x, p["w"], _as_nd(stride, nd),
        [(pp, pp) for pp in _as_nd(pad, nd)],
        rhs_dilation=_as_nd(dilation, nd), dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return y + p["b"].reshape((1, -1) + (1,) * nd)


def _tconv(x, p, stride):
    """torch ConvTranspose, padding 0: ``w`` kept in torch's
    ``(I, O, *k)``; ``transpose_kernel=True`` with the spec's I/O
    swapped reproduces torch exactly (pinned in
    tests/test_import_hdemucs.py)."""
    nd = x.ndim - 2
    dn = ("NCH", "OIH", "NCH") if nd == 1 else ("NCHW", "OIHW", "NCHW")
    pads = [(kk - 1, kk - 1) for kk in p["w"].shape[2:]]
    y = jax.lax.conv_transpose(
        x, p["w"], _as_nd(stride, nd), pads, dimension_numbers=dn,
        transpose_kernel=True)
    return y + p["b"].reshape((1, -1) + (1,) * nd)


class HDemucsTA:
    """torchaudio-compatible Hybrid Demucs.

    ``apply(params, mix (B, audio_channels, T))`` →
    ``(B, n_sources, audio_channels, T)``.  Accepts any ``T`` (demucs'
    runtime ceil-padding is reproduced with static shape arithmetic).
    """

    def __init__(self, sources: Sequence[str] = ("drums", "bass",
                                                 "other", "vocals"),
                 audio_channels: int = 2, channels: int = 48,
                 growth: float = 2.0, nfft: int = 4096, depth: int = 6,
                 freq_emb: float = 0.2, emb_scale: int = 10,
                 kernel_size: int = 8, time_stride: int = 2,
                 stride: int = 4, context: int = 1,
                 context_enc: int = 0, norm_starts: int = 4,
                 norm_groups: int = 4, dconv_depth: int = 2,
                 dconv_comp: int = 4, dconv_attn: int = 4,
                 dconv_lstm: int = 4, dconv_init: float = 1e-4,
                 attn_heads: int = 4, attn_ndecay: int = 4,
                 lstm_layers: int = 2,
                 lstm_max_steps: Optional[int] = 200):
        self.sources = tuple(sources)
        self.S = len(self.sources)
        self.C = audio_channels
        self.nfft = nfft
        self.depth = depth
        self.freq_emb_scale = freq_emb
        self.emb_scale = emb_scale
        self.norm_groups = norm_groups
        self.dconv_depth = dconv_depth
        self.dconv_comp = dconv_comp
        self.dconv_init = dconv_init
        self.attn_heads = attn_heads
        self.attn_ndecay = attn_ndecay
        self.lstm_layers = lstm_layers
        self.lstm_max_steps = lstm_max_steps
        self._win = jnp.asarray(hann_window(nfft))

        # --- layer plan (reconstructs the reference's __init__ loop) --
        chin, chin_z = audio_channels, 2 * audio_channels
        chout = chout_z = channels
        freqs = nfft // 2
        enc, tenc, dec, tdec = [], [], [], []
        for index in range(depth):
            lstm = index >= dconv_lstm
            attn = index >= dconv_attn
            norm = index >= norm_starts
            freq = freqs > 1
            stri, ker = stride, kernel_size
            if not freq:
                ker, stri = time_stride * 2, time_stride
            pad, last_freq = True, False
            if freq and freqs <= kernel_size:
                ker, pad, last_freq = freqs, False, True
            enc.append(dict(
                chin=chin_z, chout=chout_z, ker=ker, stride=stri,
                pad=(ker // 4 if pad else 0), freq=freq, norm=norm,
                empty=False, context=context_enc, lstm=lstm, attn=attn))
            if freq:
                tenc.append(dict(
                    chin=chin, chout=chout, ker=kernel_size,
                    stride=stride, pad=kernel_size // 4, freq=False,
                    norm=norm, empty=last_freq, context=context_enc,
                    lstm=lstm, attn=attn))
            if index == 0:
                chin = audio_channels * self.S
                chin_z = 2 * chin
            dec.insert(0, dict(
                chin=chout_z, chout=chin_z, ker=ker, stride=stri,
                pad=(ker // 4 if pad else 0), freq=freq, norm=norm,
                empty=False, last=(index == 0), context=context))
            if freq:
                tdec.insert(0, dict(
                    chin=chout, chout=chin, ker=kernel_size,
                    stride=stride, pad=kernel_size // 4, freq=False,
                    norm=norm, empty=last_freq, last=(index == 0),
                    context=context))
            chin, chin_z = chout, chout_z
            chout = int(growth * chout)
            chout_z = int(growth * chout_z)
            if freq:
                freqs = 1 if freqs <= kernel_size else freqs // stride
            if index == 0:
                self.freq_emb_rows = freqs
                self.freq_emb_dim = chin_z
        self.enc_specs, self.tenc_specs = enc, tenc
        self.dec_specs, self.tdec_specs = dec, tdec

    # -- parameter construction --------------------------------------
    def _dconv_init_p(self, key, spec):
        ch = spec["chout"]
        hid = ch // self.dconv_comp
        blocks = []
        for _ in range(self.dconv_depth):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            b = {"conv1": _conv_p(k1, (hid, ch, 3)),
                 "gn1": _gn_p(hid),
                 "conv2": _conv_p(k2, (2 * ch, hid, 1)),
                 "gn2": _gn_p(2 * ch),
                 "scale": jnp.full((ch,), self.dconv_init)}
            if spec["lstm"]:
                layers = []
                for li in range(self.lstm_layers):
                    cin = hid if li == 0 else 2 * hid
                    k3, kf, kb = jax.random.split(k3, 3)
                    layers.append({
                        "fwd": self._lstm_dir_p(kf, cin, hid),
                        "bwd": self._lstm_dir_p(kb, cin, hid)})
                k3, kp = jax.random.split(k3)
                b["lstm"] = {"l": layers,
                             "proj": _dense_p(kp, 2 * hid, hid)}
            if spec["attn"]:
                ks = jax.random.split(k4, 5)
                b["attn"] = {
                    "content": _dense_p(ks[0], hid, hid),
                    "query": _dense_p(ks[1], hid, hid),
                    "key": _dense_p(ks[2], hid, hid),
                    "qdecay": _dense_p(
                        ks[3], hid, self.attn_heads * self.attn_ndecay),
                    "proj": _dense_p(ks[4], hid, hid)}
            blocks.append(b)
        return blocks

    @staticmethod
    def _lstm_dir_p(key, cin, hid):
        s = 1.0 / math.sqrt(hid)
        k1, k2, k3 = jax.random.split(key, 3)
        return {"wi": _uniform(k1, (cin, 4 * hid), s),
                "wh": _uniform(k2, (hid, 4 * hid), s),
                "b": _uniform(k3, (4 * hid,), s)}

    def _enc_p(self, key, spec):
        k1, k2, k3 = jax.random.split(key, 3)
        co, ci, k = spec["chout"], spec["chin"], spec["ker"]
        shape = (co, ci, k, 1) if spec["freq"] else (co, ci, k)
        p = {"conv": _conv_p(k1, shape)}
        if spec["empty"]:
            return p
        rk = 1 + 2 * spec["context"]
        rshape = (2 * co, co, rk, rk) if spec["freq"] else (2 * co, co, rk)
        p["rewrite"] = _conv_p(k2, rshape)
        if spec["norm"]:
            p["norm1"] = _gn_p(co)
            p["norm2"] = _gn_p(2 * co)
        p["dconv"] = self._dconv_init_p(k3, spec)
        return p

    def _dec_p(self, key, spec):
        k1, k2 = jax.random.split(key)
        ci, co, k = spec["chin"], spec["chout"], spec["ker"]
        tshape = (ci, co, k, 1) if spec["freq"] else (ci, co, k)
        p = {"conv_tr": _tconv_p(k1, tshape)}
        if spec["norm"]:
            p["norm2"] = _gn_p(co)
        if not spec["empty"]:
            rk = 1 + 2 * spec["context"]
            rshape = ((2 * ci, ci, rk, rk) if spec["freq"]
                      else (2 * ci, ci, rk))
            p["rewrite"] = _conv_p(k2, rshape)
            if spec["norm"]:
                p["norm1"] = _gn_p(2 * ci)
        return p

    def init(self, key):
        n = (len(self.enc_specs) + len(self.tenc_specs)
             + len(self.dec_specs) + len(self.tdec_specs) + 1)
        keys = iter(jax.random.split(key, n))
        p = {"freq_emb": {"w": jax.random.normal(
                 next(keys), (self.freq_emb_rows, self.freq_emb_dim))
                 / self.emb_scale},
             "encoder": [self._enc_p(next(keys), s)
                         for s in self.enc_specs],
             "tencoder": [self._enc_p(next(keys), s)
                          for s in self.tenc_specs],
             "decoder": [self._dec_p(next(keys), s)
                         for s in self.dec_specs],
             "tdecoder": [self._dec_p(next(keys), s)
                          for s in self.tdec_specs]}
        return p

    # -- DConv pieces -------------------------------------------------
    def _lstm_dir(self, lp, h):
        """``h (T, N, Cin)`` → (T, N, H); torch gate order i,f,g,o."""
        gates = h @ lp["wi"] + lp["b"]
        H = lp["wh"].shape[0]
        N = h.shape[1]

        def cell(carry, g):
            hh, cc = carry
            g = g + hh @ lp["wh"]
            i, f, gg, o = jnp.split(g, 4, -1)
            cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(gg)
            hh = jax.nn.sigmoid(o) * jnp.tanh(cc)
            return (hh, cc), hh

        z0 = (jnp.zeros((N, H)), jnp.zeros((N, H)))
        _, out = jax.lax.scan(cell, z0, gates)
        return out

    def _blstm(self, p, x):
        """Framed bidirectional LSTM with built-in skip (reference
        ``_BLSTM(max_steps=200, skip=True)``): beyond ``max_steps``
        steps, unfold into 50 %-overlap frames, run batched, stitch
        the center halves."""
        N, C, T = x.shape
        y_in = x
        width = self.lstm_max_steps
        framed = width is not None and T > width
        if framed:
            stride = width // 2
            nf = -(-T // stride)
            tgt = (nf - 1) * stride + width
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, tgt - T)))
            idx = (jnp.arange(nf) * stride)[:, None] \
                + jnp.arange(width)[None]
            frames = xp[:, :, idx]                   # (N, C, nf, width)
            x = jnp.transpose(frames, (0, 2, 1, 3)).reshape(
                N * nf, C, width)
        h = jnp.transpose(x, (2, 0, 1))
        for lp in p["l"]:
            hf = self._lstm_dir(lp["fwd"], h)
            hb = self._lstm_dir(lp["bwd"], h[::-1])[::-1]
            h = jnp.concatenate([hf, hb], -1)
        h = h @ p["proj"]["w"] + p["proj"]["b"]
        x = jnp.transpose(h, (1, 2, 0))
        if framed:
            frames = x.reshape(N, nf, C, width)
            limit = width // 4
            outs = []
            for k in range(nf):
                lo = 0 if k == 0 else limit
                hi = width if k == nf - 1 else width - limit
                outs.append(frames[:, k, :, lo:hi])
            x = jnp.concatenate(outs, -1)[..., :T]
        return x + y_in

    def _local_state(self, p, x):
        """Banded-decay single-layer attention (reference
        ``_LocalState``): content/query/key 1×1 convs, learnable
        per-head distance decays, self-position masked to −100."""
        N, C, T = x.shape
        heads, ndecay = self.attn_heads, self.attn_ndecay

        def c1(name):
            return jnp.einsum("bct,cd->bdt", x, p[name]["w"]) \
                + p[name]["b"][:, None]

        queries = c1("query").reshape(N, heads, -1, T)
        keys = c1("key").reshape(N, heads, -1, T)
        dots = jnp.einsum("bhct,bhcs->bhts", keys, queries) \
            / math.sqrt(keys.shape[2])
        if ndecay:
            decays = jnp.arange(1, ndecay + 1, dtype=x.dtype)
            decay_q = jax.nn.sigmoid(
                c1("qdecay").reshape(N, heads, ndecay, T)) / 2
            pos = jnp.arange(T, dtype=x.dtype)
            delta = jnp.abs(pos[:, None] - pos[None, :])
            decay_kernel = (-decays[:, None, None] * delta
                            / math.sqrt(ndecay))
            dots = dots + jnp.einsum("fts,bhfs->bhts", decay_kernel,
                                     decay_q)
        dots = jnp.where(jnp.eye(T, dtype=bool)[None, None], -100.0,
                         dots)
        weights = jax.nn.softmax(dots, axis=2)
        content = c1("content").reshape(N, heads, -1, T)
        result = jnp.einsum("bhts,bhct->bhcs", weights,
                            content).reshape(N, C, T)
        return x + jnp.einsum("bct,cd->bdt", result, p["proj"]["w"]) \
            + p["proj"]["b"][:, None]

    def _dconv(self, blocks, x):
        """``x (N, C, T)`` residual stack; each block conv3(dilated) →
        GN(1) → GELU → [BLSTM] → [LocalState] → conv1 → GN(1) → GLU →
        LayerScale, added to the input."""
        for d, b in enumerate(blocks):
            dil = 2 ** d
            y = _conv(x, b["conv1"], pad=dil, dilation=dil)
            y = _gelu(_gn(y, b["gn1"], 1))
            if "lstm" in b:
                y = self._blstm(b["lstm"], y)
            if "attn" in b:
                y = self._local_state(b["attn"], y)
            y = _glu_ch(_gn(_conv(y, b["conv2"]), b["gn2"], 1))
            x = x + b["scale"][None, :, None] * y
        return x

    # -- encoder / decoder layers -------------------------------------
    def _norm(self, x, p, spec):
        return _gn(x, p, self.norm_groups) if spec["norm"] else x

    def _enc_layer(self, p, spec, x, inject=None):
        freq = spec["freq"]
        if not freq and x.ndim == 4:
            B = x.shape[0]
            x = x.reshape(B, -1, x.shape[-1])
        if not freq:
            le = x.shape[-1]
            if le % spec["stride"]:
                x = jnp.pad(x, ((0, 0), (0, 0),
                                (0, spec["stride"] - le % spec["stride"])))
        if freq:
            # kernel (k, 1): stride/pad only hit the freq axis
            y = _conv(x, p["conv"], stride=(spec["stride"], 1),
                      pad=(spec["pad"], 0))
        else:
            y = _conv(x, p["conv"], stride=spec["stride"],
                      pad=spec["pad"])
        if spec["empty"]:
            return y
        if inject is not None:
            if inject.ndim == 3 and y.ndim == 4:
                inject = inject[:, :, None]
            y = y + inject
        y = _gelu(self._norm(y, p.get("norm1"), spec))
        if freq:
            B, Cc, Fr, Tt = y.shape
            yd = jnp.transpose(y, (0, 2, 1, 3)).reshape(B * Fr, Cc, Tt)
            yd = self._dconv(p["dconv"], yd)
            y = jnp.transpose(yd.reshape(B, Fr, Cc, Tt), (0, 2, 1, 3))
        else:
            y = self._dconv(p["dconv"], y)
        z = self._norm(_conv(y, p["rewrite"], pad=spec["context"]),
                       p.get("norm2"), spec)
        return _glu_ch(z)

    def _dec_layer(self, p, spec, x, skip, length):
        freq = spec["freq"]
        if freq and x.ndim == 3:
            B, Cc, Tt = x.shape
            x = x.reshape(B, spec["chin"], -1, Tt)
        if not spec["empty"]:
            x = x + skip
            y = _glu_ch(self._norm(
                _conv(x, p["rewrite"], pad=spec["context"]),
                p.get("norm1"), spec))
        else:
            y = x
        z = _tconv(y, p["conv_tr"],
                   (spec["stride"], 1) if freq else spec["stride"])
        z = self._norm(z, p.get("norm2"), spec)
        if freq:
            if spec["pad"]:
                z = z[..., spec["pad"]:-spec["pad"], :]
        else:
            z = z[..., spec["pad"]:spec["pad"] + length]
        if not spec["last"]:
            z = _gelu(z)
        return z, y

    # -- spectral plumbing ---------------------------------------------
    def _spec(self, x):
        """Reference ``_spec``: triple-half-hop reflect pre-pad, torch
        ``stft(normalized=True, center=True, reflect)``, Nyquist row
        dropped, two frames trimmed each side → exactly
        ``ceil(T/hop)`` frames."""
        hl = self.nfft // 4
        T = x.shape[-1]
        le = -(-T // hl)
        pad = hl // 2 * 3
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1)
                    + ((pad, pad + le * hl - T),), mode="reflect")
        z = _stft(x, self.nfft, hl, window=self._win, center=True,
                  pad_mode="reflect", normalized=True)
        return z[..., :-1, 2:2 + le]

    def _ispec(self, z, length):
        """Inverse of ``_spec`` (Nyquist row and edge frames restored
        as zeros, normalized iSTFT, pre-pad cropped)."""
        hl = self.nfft // 4
        pads = ((0, 0),) * (z.ndim - 2) + ((0, 1), (2, 2))
        z = jax.lax.complex(jnp.pad(z.real, pads), jnp.pad(z.imag, pads))
        pad = hl // 2 * 3
        le = hl * (-(-length // hl)) + 2 * pad
        x = _istft(z, hl, window=self._win, center=True,
                   normalized=True, length=le, fft_length=self.nfft)
        return x[..., pad:pad + length]

    # -- forward --------------------------------------------------------
    def apply(self, params, mix):
        if mix.ndim != 3 or mix.shape[1] != self.C:
            raise ValueError(
                f"mix must be (batch, {self.C}, time), got {mix.shape}")
        B, C, T = mix.shape
        z = self._spec(mix)                       # (B, C, F0, Tf)
        # complex-as-channels, per-channel (re, im) interleave
        x = jnp.stack([z.real, z.imag], axis=2).reshape(
            B, 2 * C, *z.shape[-2:])
        mean = jnp.mean(x, (1, 2, 3), keepdims=True)
        std = jnp.std(x, (1, 2, 3), keepdims=True, ddof=1)
        x = (x - mean) / (1e-5 + std)
        xt = mix
        meant = jnp.mean(xt, (1, 2), keepdims=True)
        stdt = jnp.std(xt, (1, 2), keepdims=True, ddof=1)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, spec in enumerate(self.enc_specs):
            lengths.append(x.shape[-1])
            inject = None
            if idx < len(self.tenc_specs):
                lengths_t.append(xt.shape[-1])
                ts = self.tenc_specs[idx]
                xt = self._enc_layer(params["tencoder"][idx], ts, xt)
                if not ts["empty"]:
                    saved_t.append(xt)
                else:
                    inject = xt
            x = self._enc_layer(params["encoder"][idx], spec, x,
                                inject)
            if idx == 0:
                emb = params["freq_emb"]["w"] * self.emb_scale
                x = x + self.freq_emb_scale * emb.T[None, :, :, None]
            saved.append(x)

        for idx, spec in enumerate(self.dec_specs):
            skip = saved.pop(-1)
            x, pre = self._dec_layer(params["decoder"][idx], spec, x,
                                     skip, lengths.pop(-1))
            offset = self.depth - len(self.tdec_specs)
            if idx >= offset:
                ts = self.tdec_specs[idx - offset]
                length_t = lengths_t.pop(-1)
                if ts["empty"]:
                    pre = pre[:, :, 0]
                    xt, _ = self._dec_layer(
                        params["tdecoder"][idx - offset], ts, pre,
                        None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = self._dec_layer(
                        params["tdecoder"][idx - offset], ts, xt,
                        skip_t, length_t)

        S = self.S
        Fq, Tf = z.shape[-2], z.shape[-1]
        # un-standardize on the 5-D (B, S, 2C, F, T) view (std/mean
        # broadcast over sources), THEN unpack the CaC pairs
        x = x.reshape(B, S, 2 * C, Fq, Tf)
        x = x * std[:, None] + mean[:, None]
        x = x.reshape(B, S, C, 2, Fq, Tf)
        zout = jax.lax.complex(x[:, :, :, 0], x[:, :, :, 1])
        xf = self._ispec(zout, T)
        xt = xt.reshape(B, S, C, T)
        xt = xt * stdt[:, None] + meant[:, None]
        return xt + xf

    def __call__(self, params, mix):
        return self.apply(params, mix)
