"""HDemucsTA ≡ a torch ``nn``-primitive replica of torchaudio's
``models.HDemucs`` (demucs v3) — weights flow through
``import_hdemucs``, forward parity ≤1e-4.  [ref-recon: torchaudio
``models/_hdemucs.py`` — UNVERIFIED, mount empty; this replica IS the
oracle the importer is pinned against.]

The tiny config exercises every structural branch: freq layers →
``last_freq`` collapse → time layers, the empty/injected time-branch
layer, GroupNorm from ``norm_starts``, DConv with BiLSTM (framed AND
unframed) + LocalState, odd input lengths (runtime ceil padding), and
the CaC spectral round trip.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn                                   # noqa: E402
import torch.nn.functional as F                         # noqa: E402

from torchaudio_contrib_tpu.models.hdemucs_ta import HDemucsTA  # noqa: E402
from torchaudio_contrib_tpu.models import (  # noqa: E402
    hdemucs_high, hdemucs_low, hdemucs_medium)
from torchaudio_contrib_tpu.utils.import_torch import (  # noqa: E402
    import_hdemucs)


# ------------------------------------------------------------------ #
# torch replica (reconstruction of torchaudio models/_hdemucs.py)    #
# ------------------------------------------------------------------ #

def _unfold(a, kernel_size, stride):
    *shape, length = a.shape
    n_frames = math.ceil(length / stride)
    tgt_length = (n_frames - 1) * stride + kernel_size
    a = F.pad(a, (0, tgt_length - length))
    strides = list(a.stride())
    assert strides[-1] == 1
    return a.as_strided([*shape, n_frames, kernel_size],
                        strides[:-1] + [stride, 1])


class TScaledEmbedding(nn.Module):
    def __init__(self, num, dim, scale=10.0):
        super().__init__()
        self.embedding = nn.Embedding(num, dim)
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


class TLayerScale(nn.Module):
    def __init__(self, channels, init):
        super().__init__()
        self.scale = nn.Parameter(torch.full((channels,), float(init)))

    def forward(self, x):
        return self.scale[:, None] * x


class TBLSTM(nn.Module):
    def __init__(self, dim, layers=2, max_steps=None, skip=True):
        super().__init__()
        self.max_steps = max_steps
        self.lstm = nn.LSTM(bidirectional=True, num_layers=layers,
                            hidden_size=dim, input_size=dim)
        self.linear = nn.Linear(2 * dim, dim)
        self.skip = skip

    def forward(self, x):
        B, C, T = x.shape
        y = x
        framed = False
        if self.max_steps is not None and T > self.max_steps:
            width = self.max_steps
            stride = width // 2
            frames = _unfold(x, width, stride)
            nframes = frames.shape[2]
            framed = True
            x = frames.permute(0, 2, 1, 3).reshape(-1, C, width)
        x = x.permute(2, 0, 1)
        x = self.lstm(x)[0]
        x = self.linear(x)
        x = x.permute(1, 2, 0)
        if framed:
            out = []
            frames = x.reshape(B, -1, C, width)
            limit = stride // 2
            for k in range(nframes):
                if k == 0:
                    out.append(frames[:, k, :, :-limit])
                elif k == nframes - 1:
                    out.append(frames[:, k, :, limit:])
                else:
                    out.append(frames[:, k, :, limit:-limit])
            out = torch.cat(out, -1)
            x = out[..., :T]
        if self.skip:
            x = x + y
        return x


class TLocalState(nn.Module):
    def __init__(self, channels, heads=4, ndecay=4):
        super().__init__()
        self.heads = heads
        self.ndecay = ndecay
        self.content = nn.Conv1d(channels, channels, 1)
        self.query = nn.Conv1d(channels, channels, 1)
        self.key = nn.Conv1d(channels, channels, 1)
        self.query_decay = nn.Conv1d(channels, heads * ndecay, 1)
        self.proj = nn.Conv1d(channels, channels, 1)

    def forward(self, x):
        B, C, T = x.shape
        heads = self.heads
        indexes = torch.arange(T, dtype=x.dtype)
        delta = indexes[:, None] - indexes[None, :]
        queries = self.query(x).view(B, heads, -1, T)
        keys = self.key(x).view(B, heads, -1, T)
        dots = torch.einsum("bhct,bhcs->bhts", keys, queries)
        dots = dots / keys.shape[2] ** 0.5
        if self.ndecay:
            decays = torch.arange(1, self.ndecay + 1, dtype=x.dtype)
            decay_q = self.query_decay(x).view(B, heads, -1, T)
            decay_q = torch.sigmoid(decay_q) / 2
            decay_kernel = (-decays.view(-1, 1, 1) * delta.abs()
                            / self.ndecay ** 0.5)
            dots = dots + torch.einsum("fts,bhfs->bhts", decay_kernel,
                                       decay_q)
        dots.masked_fill_(torch.eye(T, dtype=torch.bool), -100)
        weights = torch.softmax(dots, dim=2)
        content = self.content(x).view(B, heads, -1, T)
        result = torch.einsum("bhts,bhct->bhcs", weights, content)
        return x + self.proj(result.reshape(B, -1, T))


class TDConv(nn.Module):
    def __init__(self, channels, compress=4, depth=2, init=1e-4,
                 attn=False, heads=4, ndecay=4, lstm=False,
                 max_steps=200, kernel=3):
        super().__init__()
        hidden = channels // compress
        self.layers = nn.ModuleList()
        for d in range(depth):
            dilation = 2 ** d
            padding = dilation * (kernel // 2)
            mods = [nn.Conv1d(channels, hidden, kernel,
                              dilation=dilation, padding=padding),
                    nn.GroupNorm(1, hidden), nn.GELU(),
                    nn.Conv1d(hidden, 2 * channels, 1),
                    nn.GroupNorm(1, 2 * channels), nn.GLU(1),
                    TLayerScale(channels, init)]
            if attn:
                mods.insert(3, TLocalState(hidden, heads, ndecay))
            if lstm:
                mods.insert(3, TBLSTM(hidden, layers=2,
                                      max_steps=max_steps, skip=True))
            self.layers.append(nn.Sequential(*mods))

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class THEncLayer(nn.Module):
    def __init__(self, chin, chout, kernel_size=8, stride=4,
                 norm_groups=4, empty=False, freq=True, norm=True,
                 context=0, dconv_kw=None, pad=True):
        super().__init__()
        norm_fn = (lambda d: nn.GroupNorm(norm_groups, d)) if norm \
            else (lambda d: nn.Identity())
        pad_val = kernel_size // 4 if pad else 0
        klass = nn.Conv1d
        self.freq = freq
        self.empty = empty
        self.stride = stride
        if freq:
            kernel_size = [kernel_size, 1]
            stride = [stride, 1]
            pad_val = [pad_val, 0]
            klass = nn.Conv2d
        self.conv = klass(chin, chout, kernel_size, stride, pad_val)
        if empty:
            return
        self.norm1 = norm_fn(chout)
        self.rewrite = klass(chout, 2 * chout, 1 + 2 * context, 1,
                             context)
        self.norm2 = norm_fn(2 * chout)
        self.dconv = TDConv(chout, **(dconv_kw or {}))

    def forward(self, x, inject=None):
        if not self.freq and x.dim() == 4:
            B, C, Fr, T = x.shape
            x = x.view(B, -1, T)
        if not self.freq:
            le = x.shape[-1]
            if le % self.stride:
                x = F.pad(x, (0, self.stride - le % self.stride))
        y = self.conv(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.dim() == 3 and y.dim() == 4:
                inject = inject[:, :, None]
            y = y + inject
        y = F.gelu(self.norm1(y))
        if self.freq:
            B, C, Fr, T = y.shape
            y = y.permute(0, 2, 1, 3).reshape(-1, C, T)
            y = self.dconv(y)
            y = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        else:
            y = self.dconv(y)
        z = self.norm2(self.rewrite(y))
        return F.glu(z, dim=1)


class THDecLayer(nn.Module):
    def __init__(self, chin, chout, last=False, kernel_size=8,
                 stride=4, norm_groups=4, empty=False, freq=True,
                 norm=True, context=1, pad=True):
        super().__init__()
        norm_fn = (lambda d: nn.GroupNorm(norm_groups, d)) if norm \
            else (lambda d: nn.Identity())
        self.pad = kernel_size // 4 if pad else 0
        self.last = last
        self.freq = freq
        self.chin = chin
        self.empty = empty
        klass, klass_tr = nn.Conv1d, nn.ConvTranspose1d
        if freq:
            kernel_size = [kernel_size, 1]
            stride = [stride, 1]
            klass, klass_tr = nn.Conv2d, nn.ConvTranspose2d
        self.conv_tr = klass_tr(chin, chout, kernel_size, stride)
        self.norm2 = norm_fn(chout)
        if not empty:
            self.rewrite = klass(chin, 2 * chin, 1 + 2 * context, 1,
                                 context)
            self.norm1 = norm_fn(2 * chin)

    def forward(self, x, skip, length):
        if self.freq and x.dim() == 3:
            B, C, T = x.shape
            x = x.view(B, self.chin, -1, T)
        if not self.empty:
            x = x + skip
            y = F.glu(self.norm1(self.rewrite(x)), dim=1)
        else:
            y = x
            assert skip is None
        z = self.norm2(self.conv_tr(y))
        if self.freq:
            if self.pad:
                z = z[..., self.pad:-self.pad, :]
        else:
            z = z[..., self.pad:self.pad + length]
            assert z.shape[-1] == length
        if not self.last:
            z = F.gelu(z)
        return z, y


class THDemucs(nn.Module):
    def __init__(self, sources, audio_channels=2, channels=48,
                 growth=2, nfft=4096, depth=6, freq_emb=0.2,
                 emb_scale=10, kernel_size=8, time_stride=2, stride=4,
                 context=1, context_enc=0, norm_starts=4,
                 norm_groups=4, dconv_depth=2, dconv_comp=4,
                 dconv_attn=4, dconv_lstm=4, dconv_init=1e-4,
                 attn_heads=4, attn_ndecay=4, lstm_max_steps=200):
        super().__init__()
        self.sources = sources
        self.audio_channels = audio_channels
        self.nfft = nfft
        self.depth = depth
        self.freq_emb_scale = freq_emb
        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        self.tencoder = nn.ModuleList()
        self.tdecoder = nn.ModuleList()
        chin, chin_z = audio_channels, 2 * audio_channels
        chout = chout_z = channels
        freqs = nfft // 2
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
            kw = dict(kernel_size=ker, stride=stri, freq=freq,
                      pad=pad, norm=norm, norm_groups=norm_groups)
            dkw = dict(lstm=lstm, attn=attn, depth=dconv_depth,
                       compress=dconv_comp, init=dconv_init,
                       heads=attn_heads, ndecay=attn_ndecay,
                       max_steps=lstm_max_steps)
            kwt = dict(kw)
            kwt.update(kernel_size=kernel_size, stride=stride,
                       pad=True, freq=False)
            self.encoder.append(THEncLayer(
                chin_z, chout_z, context=context_enc, dconv_kw=dkw,
                **kw))
            if freq:
                self.tencoder.append(THEncLayer(
                    chin, chout, context=context_enc, empty=last_freq,
                    dconv_kw=dkw, **kwt))
            if index == 0:
                chin = audio_channels * len(sources)
                chin_z = 2 * chin
            self.decoder.insert(0, THDecLayer(
                chout_z, chin_z, last=index == 0, context=context,
                **kw))
            if freq:
                self.tdecoder.insert(0, THDecLayer(
                    chout, chin, empty=last_freq, last=index == 0,
                    context=context, **kwt))
            chin, chin_z = chout, chout_z
            chout = int(growth * chout)
            chout_z = int(growth * chout_z)
            if freq:
                freqs = 1 if freqs <= kernel_size else freqs // stride
            if index == 0 and freq_emb:
                self.freq_emb = TScaledEmbedding(freqs, chin_z,
                                                 scale=emb_scale)

    def _spec(self, x):
        hl = self.nfft // 4
        B, C, T = x.shape
        le = math.ceil(T / hl)
        pad = hl // 2 * 3
        x = F.pad(x, (pad, pad + le * hl - T), mode="reflect")
        z = torch.stft(x.reshape(-1, x.shape[-1]), self.nfft, hl,
                       window=torch.hann_window(self.nfft),
                       win_length=self.nfft, normalized=True,
                       center=True, return_complex=True,
                       pad_mode="reflect")
        z = z.view(B, C, *z.shape[-2:])
        return z[..., :-1, 2:2 + le]

    def _ispec(self, z, length):
        hl = self.nfft // 4
        z = F.pad(z, (0, 0, 0, 1))
        z = F.pad(z, (2, 2))
        pad = hl // 2 * 3
        le = hl * math.ceil(length / hl) + 2 * pad
        shape = z.shape
        x = torch.istft(z.reshape(-1, *shape[-2:]), self.nfft, hl,
                        window=torch.hann_window(self.nfft),
                        win_length=self.nfft, normalized=True,
                        length=le, center=True)
        x = x.view(*shape[:-2], le)
        return x[..., pad:pad + length]

    def forward(self, mix):
        B, C, T = mix.shape
        z = self._spec(mix)
        x = torch.view_as_real(z).permute(0, 1, 4, 2, 3).reshape(
            B, C * 2, *z.shape[-2:])
        mean = x.mean(dim=(1, 2, 3), keepdim=True)
        std = x.std(dim=(1, 2, 3), keepdim=True)
        x = (x - mean) / (1e-5 + std)
        xt = mix
        meant = xt.mean(dim=(1, 2), keepdim=True)
        stdt = xt.std(dim=(1, 2), keepdim=True)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, encode in enumerate(self.encoder):
            lengths.append(x.shape[-1])
            inject = None
            if idx < len(self.tencoder):
                lengths_t.append(xt.shape[-1])
                tenc = self.tencoder[idx]
                xt = tenc(xt)
                if not tenc.empty:
                    saved_t.append(xt)
                else:
                    inject = xt
            x = encode(x, inject)
            if idx == 0 and self.freq_emb is not None:
                frs = torch.arange(x.shape[-2])
                emb = self.freq_emb(frs).t()[None, :, :, None]
                x = x + self.freq_emb_scale * emb
            saved.append(x)

        for idx, decode in enumerate(self.decoder):
            skip = saved.pop(-1)
            x, pre = decode(x, skip, lengths.pop(-1))
            offset = self.depth - len(self.tdecoder)
            if idx >= offset:
                tdec = self.tdecoder[idx - offset]
                length_t = lengths_t.pop(-1)
                if tdec.empty:
                    assert pre.shape[2] == 1, pre.shape
                    pre = pre[:, :, 0]
                    xt, _ = tdec(pre, None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = tdec(xt, skip_t, length_t)

        S = len(self.sources)
        Fq, Tf = z.shape[-2], z.shape[-1]
        x = x.view(B, S, -1, Fq, Tf)
        x = x * std[:, None] + mean[:, None]
        zout = torch.view_as_complex(
            x.view(B, S, -1, 2, Fq, Tf).permute(0, 1, 2, 4, 5, 3)
            .contiguous())
        xf = self._ispec(zout, T)
        xt = xt.view(B, S, -1, T)
        xt = xt * stdt[:, None] + meant[:, None]
        return xt + xf


# ------------------------------------------------------------------ #
# tests                                                              #
# ------------------------------------------------------------------ #

_TINY = dict(sources=("a", "b"), audio_channels=1, channels=4,
             growth=2, nfft=64, depth=4, norm_starts=2, norm_groups=2,
             dconv_lstm=2, dconv_attn=2, kernel_size=8, stride=4,
             time_stride=2, context=1, context_enc=0, dconv_depth=2,
             dconv_comp=4, dconv_init=1e-3, attn_heads=4,
             attn_ndecay=4, lstm_max_steps=16)


def _build_pair():
    torch.manual_seed(0)
    tm = THDemucs(**_TINY).eval()
    jm = HDemucsTA(**_TINY)
    params = import_hdemucs(tm.state_dict(), jm)
    return tm, jm, params


@pytest.mark.parametrize("T", [640, 650])
def test_hdemucs_forward_parity(T):
    """Full-model parity, even (640) and ceil-padded odd (650)
    lengths; T=640 → 40 spectral frames > lstm_max_steps=16, so the
    framed BiLSTM path runs inside the model."""
    tm, jm, params = _build_pair()
    rng = np.random.default_rng(1)
    mix = (rng.standard_normal((2, 1, T)) * 0.3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(mix)).numpy()
    got = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(mix)))
    assert got.shape == want.shape == (2, 2, 1, T)
    scale = max(np.abs(want).max(), 1e-3)
    assert np.abs(got - want).max() / scale < 1e-4, \
        np.abs(got - want).max()


def test_hdemucs_blstm_unframed_parity():
    """Short input (spectral frames <= max_steps) takes the unframed
    BiLSTM path."""
    cfg = dict(_TINY, lstm_max_steps=200)
    torch.manual_seed(0)
    tm = THDemucs(**cfg).eval()
    jm = HDemucsTA(**cfg)
    params = import_hdemucs(tm.state_dict(), jm)
    rng = np.random.default_rng(2)
    mix = (rng.standard_normal((1, 1, 320)) * 0.3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(mix)).numpy()
    got = np.asarray(jm.apply(params, jnp.asarray(mix)))
    scale = max(np.abs(want).max(), 1e-3)
    assert np.abs(got - want).max() / scale < 1e-4


def test_hdemucs_param_count_accounted():
    """Every torch parameter lands in the jax tree: total numel
    matches exactly, modulo the BiLSTM bias pairs the importer sums
    (two torch vectors → one jax vector each)."""
    tm, jm, params = _build_pair()
    t_numel = sum(v.numel() for v in tm.state_dict().values())
    j_numel = sum(int(np.prod(v.shape))
                  for v in jax.tree_util.tree_leaves(params))
    dup_bias = sum(v.numel() for k, v in tm.state_dict().items()
                   if ".lstm.bias_hh_" in k)
    assert t_numel == j_numel + dup_bias, (t_numel, j_numel, dup_bias)


def test_import_rejects_tpu_first_hdemucs():
    from torchaudio_contrib_tpu.models import HDemucs
    legacy = HDemucs(sources=("a", "b"), audio_channels=1, channels=4,
                     depth=2, shared_depth=1, nfft=64)
    with pytest.raises(ValueError, match="HDemucsTA"):
        import_hdemucs({}, legacy)


@pytest.mark.parametrize("factory,nfft,depth,n_freq_layers", [
    (hdemucs_low, 1024, 5, 4),
    (hdemucs_medium, 2048, 6, 5),
    (hdemucs_high, 4096, 6, 5),
])
def test_factory_geometry(factory, nfft, depth, n_freq_layers):
    m = factory(("drums", "bass", "other", "vocals"),
                compat="torchaudio")
    assert isinstance(m, HDemucsTA)
    assert m.nfft == nfft and m.depth == depth
    assert len(m.enc_specs) == depth
    assert len(m.tenc_specs) == n_freq_layers
    assert sum(s["freq"] for s in m.enc_specs) == n_freq_layers
    # exactly one collapse layer, freq path ends at F == 1
    lf = [s for s in m.enc_specs if s["freq"] and s["pad"] == 0]
    assert len(lf) == 1
    assert m.tenc_specs[-1]["empty"]
    assert m.tdec_specs[0]["empty"]
    # channel plan: growth x per layer from `channels`
    assert m.enc_specs[0]["chout"] == 48
    assert m.enc_specs[-1]["chout"] == 48 * 2 ** (depth - 1)
