"""Round-4 cross-verification extensions: ConvTasNet forward parity
against a torch replica of the published architecture (torchaudio's
``models.ConvTasNet`` topology and state_dict naming, rebuilt from
``nn`` primitives — torchaudio itself is absent here), through the
``import_conv_tasnet`` converter and the bundle wiring."""
import numpy as np
import pytest

import jax

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
    # HDemucs bundle has no importer: loud
    with pytest.raises(NotImplementedError):
        pl.HDEMUCS_HIGH_MUSDB.get_model(torch_checkpoint={})
