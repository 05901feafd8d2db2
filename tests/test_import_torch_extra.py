"""Round-4 cross-verification extensions: ConvTasNet forward parity
against a torch replica of the published architecture (torchaudio's
``models.ConvTasNet`` topology and state_dict naming, rebuilt from
``nn`` primitives — torchaudio itself is absent here), through the
``import_conv_tasnet`` converter and the bundle wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn

from torchaudio_contrib_tpu.models import ConvTasNet
from torchaudio_contrib_tpu.utils import import_torch as it


class _TorchConvBlock(nn.Module):
    def __init__(self, io, hidden, kernel, dilation, no_residual):
        super().__init__()
        self.conv_layers = nn.Sequential(
            nn.Conv1d(io, hidden, 1),
            nn.PReLU(),
            nn.GroupNorm(1, hidden, eps=1e-8),
            nn.Conv1d(hidden, hidden, kernel,
                      padding=(kernel - 1) * dilation // 2,
                      dilation=dilation, groups=hidden),
            nn.PReLU(),
            nn.GroupNorm(1, hidden, eps=1e-8),
        )
        self.res_out = (None if no_residual
                        else nn.Conv1d(hidden, io, 1))
        self.skip_out = nn.Conv1d(hidden, io, 1)

    def forward(self, x):
        f = self.conv_layers(x)
        res = None if self.res_out is None else self.res_out(f)
        return res, self.skip_out(f)


class _TorchMaskGenerator(nn.Module):
    def __init__(self, input_dim, num_sources, bottleneck, hidden,
                 kernel, num_blocks, num_repeats):
        super().__init__()
        self.num_sources = num_sources
        self.input_dim = input_dim
        self.input_norm = nn.GroupNorm(1, input_dim, eps=1e-8)
        self.input_conv = nn.Conv1d(input_dim, bottleneck, 1)
        self.conv_layers = nn.ModuleList()
        n = num_repeats * num_blocks
        for i in range(n):
            self.conv_layers.append(_TorchConvBlock(
                bottleneck, hidden, kernel, 2 ** (i % num_blocks),
                no_residual=(i == n - 1)))
        self.output_prelu = nn.PReLU()
        self.output_conv = nn.Conv1d(bottleneck,
                                     input_dim * num_sources, 1)

    def forward(self, feats):
        B = feats.shape[0]
        x = self.input_conv(self.input_norm(feats))
        accum = 0.0
        for layer in self.conv_layers:
            res, skip = layer(x)
            if res is not None:
                x = x + res
            accum = accum + skip
        m = self.output_conv(self.output_prelu(accum))
        return torch.sigmoid(m).view(B, self.num_sources,
                                     self.input_dim, -1)


class _TorchConvTasNet(nn.Module):
    def __init__(self, num_sources=2, enc_kernel=16, enc_filters=64,
                 bottleneck=16, hidden=32, tcn_kernel=3,
                 num_blocks=3, num_repeats=2):
        super().__init__()
        self.L = enc_kernel
        self.stride = enc_kernel // 2
        self.ns = num_sources
        self.encoder = nn.Conv1d(1, enc_filters, enc_kernel,
                                 stride=self.stride,
                                 padding=self.stride, bias=False)
        self.mask_generator = _TorchMaskGenerator(
            enc_filters, num_sources, bottleneck, hidden, tcn_kernel,
            num_blocks, num_repeats)
        self.decoder = nn.ConvTranspose1d(
            enc_filters, 1, enc_kernel, stride=self.stride,
            padding=self.stride, bias=False)

    def forward(self, mix):                 # (B, T)
        B, T = mix.shape
        pad = (-T) % self.stride
        if T + pad < self.L:
            pad = self.L - T
        x = nn.functional.pad(mix, (0, pad)).unsqueeze(1)
        feats = self.encoder(x)             # (B, N, F)
        masks = self.mask_generator(feats)  # (B, S, N, F)
        sep = feats.unsqueeze(1) * masks
        wav = self.decoder(
            sep.reshape(B * self.ns, feats.shape[1], -1))
        return wav.reshape(B, self.ns, -1)[..., :T]


def _pair():
    tm = _TorchConvTasNet().eval()
    # make the PReLU slopes + norms non-default so parity is strict
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, par in tm.named_parameters():
            if "PReLU" in type(par).__name__ or par.numel() == 1:
                par.add_(torch.rand(par.shape, generator=g) * 0.3)
            elif "norm" in name and par.dim() == 1:
                par.add_(torch.randn(par.shape, generator=g) * 0.2)
    ours = ConvTasNet(num_sources=2, enc_kernel=16, enc_filters=64,
                      bottleneck=16, hidden=32, tcn_kernel=3,
                      num_blocks=3, num_repeats=2)
    return tm, ours


def test_conv_tasnet_parity():
    tm, ours = _pair()
    p = it.import_conv_tasnet(tm.state_dict(), ours)
    x = np.random.default_rng(0).standard_normal(
        (2, 4000)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(p, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_tasnet_parity_unaligned_length():
    """Length not a stride multiple: both sides pad identically and
    crop back."""
    tm, ours = _pair()
    p = it.import_conv_tasnet(tm.state_dict(), ours)
    x = np.random.default_rng(1).standard_normal(
        (1, 1003)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(p, x))
    assert got.shape == ref.shape == (1, 2, 1003)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_tasnet_bundle_wiring():
    from torchaudio_contrib_tpu import pipelines as pl
    tm, ours = _pair()
    bundle = pl.SourceSeparationBundle(
        _factory=lambda: ours, sample_rate=8000,
        sources=("a", "b"),
        _torch_importer=pl._import_conv_tasnet)
    model, params = bundle.get_model(torch_checkpoint=tm.state_dict())
    x = np.random.default_rng(2).standard_normal(
        (1, 800)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(model.apply(params, x)),
                               ref, atol=1e-4)
    # HDemucs bundle HAS an importer since round 5 — a garbage
    # checkpoint must still fail LOUDLY (missing-key error naming the
    # first absent weight), never return random weights
    with pytest.raises(KeyError, match="state_dict has no"):
        pl.HDEMUCS_HIGH_MUSDB.get_model(torch_checkpoint={})


# ------------------------------------------------------------------ #
# WaveRNN                                                            #
# ------------------------------------------------------------------ #

class _TorchResBlock(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.resblock_model = nn.Sequential(
            nn.Conv1d(h, h, 1, bias=False), nn.BatchNorm1d(h),
            nn.ReLU(inplace=True),
            nn.Conv1d(h, h, 1, bias=False), nn.BatchNorm1d(h))

    def forward(self, x):
        return self.resblock_model(x) + x


class _TorchMelResNet(nn.Module):
    def __init__(self, n_res, n_freq, n_hidden, n_output, kernel):
        super().__init__()
        self.melresnet_model = nn.Sequential(
            nn.Conv1d(n_freq, n_hidden, kernel, bias=False),
            nn.BatchNorm1d(n_hidden), nn.ReLU(inplace=True),
            *[_TorchResBlock(n_hidden) for _ in range(n_res)],
            nn.Conv1d(n_hidden, n_output, 1))

    def forward(self, x):
        return self.melresnet_model(x)


class _TorchStretch2d(nn.Module):
    def __init__(self, time_scale):
        super().__init__()
        self.s = time_scale

    def forward(self, x):                         # (..., F, T)
        return x.repeat_interleave(self.s, dim=-1)


class _TorchUpsampleNetwork(nn.Module):
    def __init__(self, scales, n_res, n_freq, n_hidden, n_output,
                 kernel):
        super().__init__()
        total = 1
        for s in scales:
            total *= s
        self.indent = (kernel - 1) // 2 * total
        self.resnet = _TorchMelResNet(n_res, n_freq, n_hidden,
                                      n_output, kernel)
        self.resnet_stretch = _TorchStretch2d(total)
        layers = []
        for s in scales:
            conv = nn.Conv2d(1, 1, (1, 2 * s + 1), padding=(0, s),
                             bias=False)
            conv.weight.data.fill_(1.0 / (2 * s + 1))
            layers.extend([_TorchStretch2d(s), conv])
        self.upsample_layers = nn.Sequential(*layers)

    def forward(self, spec):                      # (B, F, Tm)
        aux = self.resnet(spec).unsqueeze(1)
        aux = self.resnet_stretch(aux).squeeze(1)
        up = self.upsample_layers(spec.unsqueeze(1)).squeeze(1)
        return up[:, :, self.indent:-self.indent], aux


class _TorchWaveRNN(nn.Module):
    def __init__(self, scales=(2, 2), n_classes=32, hop=4, n_res=2,
                 n_rnn=16, n_fc=16, kernel=3, n_freq=8, n_hidden=8,
                 n_output=8):
        super().__init__()
        self.n_aux = n_output // 4
        self.upsample = _TorchUpsampleNetwork(scales, n_res, n_freq,
                                              n_hidden, n_output,
                                              kernel)
        self.fc = nn.Linear(n_freq + self.n_aux + 1, n_rnn)
        self.rnn1 = nn.GRU(n_rnn, n_rnn, batch_first=True)
        self.rnn2 = nn.GRU(n_rnn + self.n_aux, n_rnn,
                           batch_first=True)
        self.fc1 = nn.Linear(n_rnn + self.n_aux, n_fc)
        self.fc2 = nn.Linear(n_fc + self.n_aux, n_fc)
        self.fc3 = nn.Linear(n_fc, n_classes)

    def forward(self, waveform, spec):            # (B,T), (B,F,Tm)
        up, aux = self.upsample(spec)
        up = up.transpose(1, 2)
        aux = aux.transpose(1, 2)
        na = self.n_aux
        a = [aux[..., i * na:(i + 1) * na] for i in range(4)]
        x = torch.cat([waveform.unsqueeze(-1), up, a[0]], -1)
        x = self.fc(x)
        res = x
        x, _ = self.rnn1(x)
        x = x + res
        res = x
        x, _ = self.rnn2(torch.cat([x, a[1]], -1))
        x = x + res
        x = torch.relu(self.fc1(torch.cat([x, a[2]], -1)))
        x = torch.relu(self.fc2(torch.cat([x, a[3]], -1)))
        return self.fc3(x)


# ------------------------------------------------------------------ #
# Tacotron2                                                          #
# ------------------------------------------------------------------ #

class _TorchLocationAttention(nn.Module):
    def __init__(self, dec, enc, att, filters, kernel):
        super().__init__()
        self.query_layer = nn.Linear(dec, att, bias=False)
        self.memory_layer = nn.Linear(enc, att, bias=False)
        self.v = nn.Linear(att, 1, bias=False)
        self.location_layer = nn.Module()
        self.location_layer.location_conv = nn.Conv1d(
            2, filters, kernel, padding=(kernel - 1) // 2, bias=False)
        self.location_layer.location_dense = nn.Linear(filters, att,
                                                       bias=False)

    def forward(self, query, memory, proc_memory, weights_cat):
        loc = self.location_layer.location_conv(weights_cat)
        loc = self.location_layer.location_dense(loc.transpose(1, 2))
        e = self.v(torch.tanh(
            self.query_layer(query.unsqueeze(1)) + proc_memory + loc))
        w = torch.softmax(e.squeeze(-1), -1)
        ctx = torch.bmm(w.unsqueeze(1), memory).squeeze(1)
        return ctx, w


class _TorchTacotron2(nn.Module):
    """torchaudio-layout teacher-forced Tacotron2 (NVIDIA topology),
    full-length tokens (the packed-LSTM/pad-masking machinery is
    exercised separately in tests/test_tacotron2.py); prenet dropout
    off for determinism (torchaudio keeps it on even in eval — our
    model's documented deviation)."""

    def __init__(self, n_symbols=20, n_mels=8, embed=16, enc=16,
                 att=12, filters=4, att_kernel=7, dec=20, prenet=12,
                 post=12, post_k=5, enc_k=5, n_enc=2, n_post=3):
        super().__init__()
        self.n_mels, self.dec, self.enc = n_mels, dec, enc
        self.embedding = nn.Embedding(n_symbols, embed)
        self.encoder = nn.Module()
        self.encoder.convolutions = nn.ModuleList(
            nn.Sequential(
                nn.Conv1d(embed if i == 0 else enc, enc, enc_k,
                          padding=(enc_k - 1) // 2),
                nn.BatchNorm1d(enc))
            for i in range(n_enc))
        self.encoder.lstm = nn.LSTM(enc, enc // 2, batch_first=True,
                                    bidirectional=True)
        self.decoder = nn.Module()
        self.decoder.prenet = nn.Module()
        self.decoder.prenet.layers = nn.ModuleList(
            [nn.Linear(n_mels, prenet, bias=False),
             nn.Linear(prenet, prenet, bias=False)])
        self.decoder.attention_rnn = nn.LSTMCell(prenet + enc, dec)
        self.decoder.attention_layer = _TorchLocationAttention(
            dec, enc, att, filters, att_kernel)
        self.decoder.decoder_rnn = nn.LSTMCell(dec + enc, dec)
        self.decoder.linear_projection = nn.Linear(dec + enc, n_mels)
        self.decoder.gate_layer = nn.Linear(dec + enc, 1)
        self.postnet = nn.Module()
        chans = [n_mels] + [post] * (n_post - 1) + [n_mels]
        self.postnet.convolutions = nn.ModuleList(
            nn.Sequential(
                nn.Conv1d(chans[i], chans[i + 1], post_k,
                          padding=(post_k - 1) // 2),
                nn.BatchNorm1d(chans[i + 1]))
            for i in range(n_post))

    def forward(self, tokens, mels):          # (B, S), (B, M, T)
        x = self.embedding(tokens).transpose(1, 2)
        for c in self.encoder.convolutions:
            x = torch.relu(c(x))
        memory, _ = self.encoder.lstm(x.transpose(1, 2))
        proc_mem = self.decoder.attention_layer.memory_layer(memory)
        B, S, _ = memory.shape
        T = mels.shape[2]
        go = torch.zeros(B, 1, self.n_mels)
        pre = torch.cat([go, mels.transpose(1, 2)[:, :-1]], 1)
        for lyr in self.decoder.prenet.layers:
            pre = torch.relu(lyr(pre))
        h_a = torch.zeros(B, self.dec)
        c_a, h_d, c_d = h_a.clone(), h_a.clone(), h_a.clone()
        ctx = torch.zeros(B, self.enc)
        att_w = torch.zeros(B, S)
        att_cum = torch.zeros(B, S)
        outs, stops, alis = [], [], []
        for t in range(T):
            h_a, c_a = self.decoder.attention_rnn(
                torch.cat([pre[:, t], ctx], -1), (h_a, c_a))
            cat_w = torch.stack([att_w, att_cum], 1)   # (B, 2, S)
            ctx, att_w = self.decoder.attention_layer(
                h_a, memory, proc_mem, cat_w)
            att_cum = att_cum + att_w
            h_d, c_d = self.decoder.decoder_rnn(
                torch.cat([h_a, ctx], -1), (h_d, c_d))
            hc = torch.cat([h_d, ctx], -1)
            outs.append(self.decoder.linear_projection(hc))
            stops.append(self.decoder.gate_layer(hc).squeeze(-1))
            alis.append(att_w)
        mel = torch.stack(outs, 2)                     # (B, M, T)
        y = mel
        n = len(self.postnet.convolutions)
        for i, c in enumerate(self.postnet.convolutions):
            y = c(y)
            if i < n - 1:
                y = torch.tanh(y)
        return (mel, mel + y, torch.stack(stops, 1),
                torch.stack(alis, 1))


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(torch.randn(buf.shape, generator=g) * 0.3)
            elif name.endswith("running_var"):
                buf.mul_(torch.rand(buf.shape, generator=g) + 0.5)


def test_tacotron2_parity():
    """Teacher-forced full-model parity vs the torch replica — pins
    the embedding→conv/BN→biLSTM encoder, the decoder step order
    (attention LSTM → location attention on (prev, cum) weights →
    decoder LSTM → projections), LSTMCell gate order, and the
    BatchNorm→frozen-affine folding across encoder AND postnet."""
    from torchaudio_contrib_tpu.models import Tacotron2
    tm = _TorchTacotron2().eval()
    _randomize_bn(tm)
    ours = Tacotron2(n_symbols=20, n_mels=8, embed_dim=16,
                     encoder_dim=16, attention_dim=12,
                     attention_filters=4, attention_kernel=7,
                     decoder_dim=20, prenet_dim=12, postnet_dim=12,
                     postnet_kernel=5, encoder_kernel=5,
                     n_encoder_convs=2, n_postnet_convs=3)
    p = it.import_tacotron2(tm.state_dict(), ours)
    rng = np.random.default_rng(0)
    B, S, T = 2, 5, 6
    tokens = rng.integers(0, 20, (B, S))
    mels = rng.standard_normal((B, 8, T)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(tokens), torch.from_numpy(mels))
    got = ours.apply(p, tokens, np.full((B,), S, np.int32), mels)
    for name, r, g in zip(("mel", "post", "stop", "ali"), ref, got):
        r = r.numpy()
        g = np.asarray(g)
        assert g.shape == r.shape, name
        np.testing.assert_allclose(g, r, atol=2e-4, err_msg=name)


def test_tacotron2_bundle_wiring():
    from torchaudio_contrib_tpu import pipelines as pl
    bundle = pl.TACOTRON2_WAVERNN_CHAR_LJSPEECH
    # a fabricated full-size state_dict round-trips through the
    # importer and runs (smoke — real parity is test_tacotron2_parity)
    model = bundle.get_tacotron2(key=jax.random.PRNGKey(0))[0]
    tm = _TorchTacotron2(
        n_symbols=model.n_symbols, n_mels=80, embed=512, enc=512,
        att=128, filters=32, att_kernel=31, dec=1024, prenet=256,
        post=512, post_k=5, enc_k=5, n_enc=3, n_post=5)
    _, params = bundle.get_tacotron2(torch_checkpoint=tm.state_dict())
    assert params["embedding"].shape == (model.n_symbols, 512)


def test_wavernn_parity():
    """Teacher-forced logits parity vs the torch replica — pins GRU
    gate order + the separate-bias n-gate convention, the upsample
    trim arithmetic, aux splits, and the BatchNorm→frozen-affine
    folding (running stats randomized to make folding non-trivial)."""
    from torchaudio_contrib_tpu.models import WaveRNN
    tm = _TorchWaveRNN().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(torch.randn(buf.shape, generator=g) * 0.3)
            elif name.endswith("running_var"):
                buf.mul_(torch.rand(buf.shape, generator=g) + 0.5)
    ours = WaveRNN(upsample_scales=(2, 2), n_classes=32, hop_length=4,
                   n_res_block=2, n_rnn=16, n_fc=16, kernel_size=3,
                   n_freq=8, n_hidden=8, n_output=8)
    p = it.import_wavernn(tm.state_dict(), ours)
    rng = np.random.default_rng(0)
    Tm = 9
    T = 4 * (Tm - 3 + 1)
    spec = rng.standard_normal((2, 8, Tm)).astype(np.float32)
    wav = rng.standard_normal((2, T)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav), torch.from_numpy(spec)).numpy()
    got = np.asarray(ours.apply(p, wav, spec))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


# ------------------------------------------------------------------ #
# Conformer                                                          #
# ------------------------------------------------------------------ #

class _TorchFFNModule(nn.Module):
    """torchaudio ``conformer._FeedForwardModule`` replica (module
    path + Sequential indices match, so state_dict names do too)."""

    def __init__(self, d, ffn):
        super().__init__()
        self.sequential = nn.Sequential(
            nn.LayerNorm(d), nn.Linear(d, ffn), nn.SiLU(),
            nn.Dropout(0.0), nn.Linear(ffn, d), nn.Dropout(0.0))

    def forward(self, x):
        return self.sequential(x)


class _TorchConvModule(nn.Module):
    """torchaudio ``conformer._ConvolutionModule`` replica
    (BatchNorm1d variant, i.e. ``use_group_norm=False``)."""

    def __init__(self, d, k):
        super().__init__()
        self.layer_norm = nn.LayerNorm(d)
        self.sequential = nn.Sequential(
            nn.Conv1d(d, 2 * d, 1), nn.GLU(dim=1),
            nn.Conv1d(d, d, k, padding=(k - 1) // 2, groups=d),
            nn.BatchNorm1d(d), nn.SiLU(), nn.Conv1d(d, d, 1),
            nn.Dropout(0.0))

    def forward(self, x):                      # (B, T, D)
        x = self.layer_norm(x)
        x = self.sequential(x.transpose(1, 2))
        return x.transpose(1, 2)


class _TorchConformerLayer(nn.Module):
    def __init__(self, d, heads, ffn, k, convolution_first=False):
        super().__init__()
        self.ffn1 = _TorchFFNModule(d, ffn)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.self_attn = nn.MultiheadAttention(d, heads,
                                               batch_first=True)
        self.conv_module = _TorchConvModule(d, k)
        self.ffn2 = _TorchFFNModule(d, ffn)
        self.final_layer_norm = nn.LayerNorm(d)
        self.convolution_first = convolution_first

    def forward(self, x):
        x = x + 0.5 * self.ffn1(x)
        if self.convolution_first:
            x = x + self.conv_module(x)
        y = self.self_attn_layer_norm(x)
        y, _ = self.self_attn(y, y, y, need_weights=False)
        x = x + y
        if not self.convolution_first:
            x = x + self.conv_module(x)
        x = x + 0.5 * self.ffn2(x)
        return self.final_layer_norm(x)


class _TorchConformer(nn.Module):
    def __init__(self, d=16, heads=2, ffn=32, layers=2, k=7,
                 convolution_first=False):
        super().__init__()
        self.conformer_layers = nn.ModuleList(
            [_TorchConformerLayer(d, heads, ffn, k, convolution_first)
             for _ in range(layers)])

    def forward(self, x):
        for layer in self.conformer_layers:
            x = layer(x)
        return x


def _conformer_pair(convolution_first=False):
    from torchaudio_contrib_tpu.models import Conformer
    torch.manual_seed(3)
    tm = _TorchConformer(convolution_first=convolution_first).eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(torch.randn(buf.shape, generator=g) * 0.3)
            elif name.endswith("running_var"):
                buf.mul_(torch.rand(buf.shape, generator=g) + 0.5)
    ours = Conformer(input_dim=16, d_model=16, num_layers=2,
                     num_heads=2, ff_ratio=2, conv_kernel=7,
                     max_distance=4, conv_norm="affine",
                     convolution_first=convolution_first)
    return tm, ours


def test_conformer_parity():
    """Forward parity vs the torch replica of torchaudio's Conformer —
    pins the fused in_proj q/k/v block order + bias, the GLU channel
    split, depthwise tap layout, BatchNorm→frozen-affine folding, the
    half-FFN residuals, and that the zero rel table is exactly plain
    MHA."""
    tm, ours = _conformer_pair()
    p = it.import_conformer(tm.state_dict(), ours)
    assert float(jnp.sum(jnp.abs(p["layers"][0]["attn"]["rel"]))) == 0
    x = np.random.default_rng(2).standard_normal(
        (2, 12, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(p, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conformer_parity_convolution_first():
    tm, ours = _conformer_pair(convolution_first=True)
    p = it.import_conformer(tm.state_dict(), ours)
    x = np.random.default_rng(4).standard_normal(
        (1, 9, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours.apply(p, x)), ref,
                               atol=1e-4)


def test_conformer_import_validation():
    from torchaudio_contrib_tpu.models import Conformer
    tm, _ = _conformer_pair()
    ln_model = Conformer(input_dim=16, d_model=16, num_layers=2,
                         num_heads=2, ff_ratio=2, conv_kernel=7)
    with pytest.raises(ValueError, match="conv_norm"):
        it.import_conformer(tm.state_dict(), ln_model)
    proj_model = Conformer(input_dim=8, d_model=16, num_layers=2,
                           num_heads=2, ff_ratio=2, conv_kernel=7,
                           conv_norm="affine")
    with pytest.raises(ValueError, match="input projection"):
        it.import_conformer(tm.state_dict(), proj_model)


# ------------------------------------------------------------------ #
# Wav2Letter / DeepSpeech                                            #
# ------------------------------------------------------------------ #

def _torch_wav2letter(num_classes, input_type, num_features):
    """torchaudio ``models.Wav2Letter`` replica: one conv+ReLU stack,
    log-softmax over classes (dim=1 in torch's (B, C, T) layout)."""
    acoustic_in = 250 if input_type == "waveform" else num_features
    body = [nn.Conv1d(acoustic_in, 250, 48, 2, 23), nn.ReLU()]
    for _ in range(7):
        body += [nn.Conv1d(250, 250, 7, 1, 3), nn.ReLU()]
    body += [nn.Conv1d(250, 2000, 32, 1, 16), nn.ReLU(),
             nn.Conv1d(2000, 2000, 1, 1, 0), nn.ReLU(),
             nn.Conv1d(2000, num_classes, 1, 1, 0), nn.ReLU()]
    acoustic = nn.Sequential(*body)

    class _W2L(nn.Module):
        def __init__(self):
            super().__init__()
            if input_type == "waveform":
                head = nn.Sequential(
                    nn.Conv1d(num_features, 250, 250, 160, 45),
                    nn.ReLU())
                self.acoustic_model = nn.Sequential(head, acoustic)
            else:
                self.acoustic_model = acoustic

        def forward(self, x):
            return torch.nn.functional.log_softmax(
                self.acoustic_model(x), dim=1)

    return _W2L().eval()


def test_wav2letter_parity_waveform():
    from torchaudio_contrib_tpu.models import Wav2Letter
    torch.manual_seed(5)
    tm = _torch_wav2letter(12, "waveform", 1)
    ours = Wav2Letter(num_classes=12, input_type="waveform",
                      compat="torchaudio")
    p = it.import_wav2letter(tm.state_dict(), ours)
    x = np.random.default_rng(5).standard_normal(
        (2, 2048)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)[:, None, :]).numpy()  # (B, C, T)
    got = np.asarray(ours.apply(p, x))                     # (B, T, C)
    assert got.shape == (ref.shape[0], ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 1)),
                               atol=1e-4)


def test_wav2letter_parity_mfcc():
    from torchaudio_contrib_tpu.models import Wav2Letter
    torch.manual_seed(6)
    tm = _torch_wav2letter(8, "mfcc", 13)
    ours = Wav2Letter(num_classes=8, input_type="mfcc",
                      num_features=13, compat="torchaudio")
    p = it.import_wav2letter(tm.state_dict(), ours)
    x = np.random.default_rng(6).standard_normal(
        (2, 13, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours.apply(p, x)),
                               np.transpose(ref, (0, 2, 1)), atol=1e-4)


def test_wav2letter_import_requires_compat():
    from torchaudio_contrib_tpu.models import Wav2Letter
    tm = _torch_wav2letter(8, "mfcc", 13)
    with pytest.raises(ValueError, match="compat"):
        it.import_wav2letter(
            tm.state_dict(),
            Wav2Letter(num_classes=8, input_type="mfcc",
                       num_features=13))


class _TorchFullyConnected(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.fc = nn.Linear(cin, cout)

    def forward(self, x):
        return torch.nn.functional.hardtanh(
            torch.nn.functional.relu(self.fc(x)), 0.0, 20.0)


class _TorchDeepSpeech(nn.Module):
    """torchaudio ``models.DeepSpeech`` replica — the RNN is a REAL
    ``nn.RNN`` (relu nonlinearity, bidirectional), so the recurrence
    itself is a true torch oracle, not a reconstruction."""

    def __init__(self, n_feature=10, n_hidden=24, n_class=7):
        super().__init__()
        self.n_hidden = n_hidden
        self.fc1 = _TorchFullyConnected(n_feature, n_hidden)
        self.fc2 = _TorchFullyConnected(n_hidden, n_hidden)
        self.fc3 = _TorchFullyConnected(n_hidden, n_hidden)
        self.bi_rnn = nn.RNN(n_hidden, n_hidden, num_layers=1,
                             nonlinearity="relu", bidirectional=True)
        self.fc4 = _TorchFullyConnected(n_hidden, n_hidden)
        self.out = nn.Linear(n_hidden, n_class)

    def forward(self, x):                          # (B, T, F)
        x = self.fc3(self.fc2(self.fc1(x)))
        x = x.transpose(0, 1)                      # (T, B, H)
        x, _ = self.bi_rnn(x)
        x = x[:, :, :self.n_hidden] + x[:, :, self.n_hidden:]
        x = self.fc4(x)
        x = self.out(x)
        x = torch.nn.functional.log_softmax(x, dim=2)
        return x.transpose(0, 1)                   # (B, T, C)


def test_deepspeech_parity():
    from torchaudio_contrib_tpu.models import DeepSpeech
    torch.manual_seed(7)
    tm = _TorchDeepSpeech().eval()
    ours = DeepSpeech(n_feature=10, n_hidden=24, n_class=7)
    p = it.import_deepspeech(tm.state_dict(), ours)
    x = np.random.default_rng(7).standard_normal(
        (3, 17, 10)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(p, x, log_probs=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
