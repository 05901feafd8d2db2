"""Torch-replica parity for ``import_squim_objective``.

Builds a torch ``nn``-primitive replica of torchaudio's
``SquimObjective`` layout ([ref-recon: torchaudio
models/squim/objective.py — UNVERIFIED, mount empty; torchaudio is
not installed here]), exports its ``state_dict`` under the torchaudio
key names, imports it through
``utils.import_torch.import_squim_objective`` and pins forward parity
of the three metric heads at ≤1e-4.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torchaudio_contrib_tpu.models import SquimObjectiveTA  # noqa: E402
from torchaudio_contrib_tpu.utils.import_torch import (  # noqa: E402
    import_squim_objective)

# small but non-degenerate geometry (chunk odd, like the published 71)
CFG = dict(feat_dim=12, win_len=16, d_model=12, nhead=2,
           hidden_dim=10, num_blocks=2, chunk_size=7)


class _Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1d = nn.Conv1d(1, CFG["feat_dim"], CFG["win_len"],
                                stride=CFG["win_len"] // 2, bias=False)

    def forward(self, x):
        return torch.relu(self.conv1d(x.unsqueeze(1)))


class _SingleRNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.rnn = nn.LSTM(CFG["feat_dim"], CFG["hidden_dim"], 1,
                           batch_first=True, bidirectional=True)
        self.proj = nn.Linear(2 * CFG["hidden_dim"], CFG["feat_dim"])

    def forward(self, x):
        out, _ = self.rnn(x)
        return self.proj(out)


class _DPRNN(nn.Module):
    def __init__(self):
        super().__init__()
        n, F = CFG["num_blocks"], CFG["feat_dim"]
        self.row_rnn = nn.ModuleList([_SingleRNN() for _ in range(n)])
        self.col_rnn = nn.ModuleList([_SingleRNN() for _ in range(n)])
        self.row_norm = nn.ModuleList(
            [nn.GroupNorm(1, F, eps=1e-8) for _ in range(n)])
        self.col_norm = nn.ModuleList(
            [nn.GroupNorm(1, F, eps=1e-8) for _ in range(n)])
        self.conv = nn.Sequential(
            nn.Conv2d(F, CFG["d_model"], 1), nn.PReLU())

    def _split(self, x):
        """x (B, F, T) → (B, F, K, n_chunks), 50 % overlap."""
        B, F, T = x.shape
        K = CFG["chunk_size"]
        s = K // 2
        rest = K - (s + T % K) % K
        x = torch.nn.functional.pad(x, (s, rest + s))
        total = x.shape[2]
        n = (total - s) // K
        seg1 = x[:, :, :total - s].reshape(B, F, n, K)
        seg2 = x[:, :, s:].reshape(B, F, n, K)
        out = torch.cat([seg1, seg2], 3).view(B, F, 2 * n, K)
        return out.transpose(2, 3).contiguous(), rest

    def _merge(self, x, rest):
        B, F, K, n2 = x.shape
        s = K // 2
        x = x.transpose(2, 3).contiguous().view(B, F, -1, 2 * K)
        x1 = x[:, :, :, :K].contiguous().view(B, F, -1)[:, :, s:]
        x2 = x[:, :, :, K:].contiguous().view(B, F, -1)[:, :, :-s]
        out = x1 + x2
        return out[:, :, :out.shape[2] - rest]

    def forward(self, x):
        z, rest = self._split(x)               # (B, F, K, N)
        B, F, K, N = z.shape
        for i in range(CFG["num_blocks"]):
            row_in = z.permute(0, 3, 2, 1).reshape(B * N, K, F)
            row = self.row_rnn[i](row_in)
            row = row.view(B, N, K, F).permute(0, 3, 2, 1)
            z = z + self.row_norm[i](row)
            col_in = z.permute(0, 2, 3, 1).reshape(B * K, N, F)
            col = self.col_rnn[i](col_in)
            col = col.view(B, K, N, F).permute(0, 3, 1, 2)
            z = z + self.col_norm[i](col)
        z = self.conv(z)
        return self._merge(z, rest)            # (B, d_model, T)


class _AutoPool(nn.Module):
    def __init__(self):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1))

    def forward(self, x):
        w = torch.softmax(x * self.alpha, dim=1)
        return torch.sum(x * w, dim=1)


class _RangeSigmoid(nn.Module):
    def __init__(self, lo=0.0, hi=1.0):
        super().__init__()
        self.lo, self.hi = lo, hi

    def forward(self, x):
        return torch.sigmoid(x) * (self.hi - self.lo) + self.lo


def _branch(metric):
    d = CFG["d_model"]
    layer1 = nn.TransformerEncoderLayer(
        d, CFG["nhead"], dim_feedforward=4 * d, dropout=0.0,
        batch_first=True)
    head = [nn.Linear(d, d), nn.PReLU(), nn.Linear(d, 1)]
    if metric == "stoi":
        head.append(_RangeSigmoid(0.0, 1.0))
    elif metric == "pesq":
        head.append(_RangeSigmoid(1.0, 4.5))
    return nn.Sequential(layer1, _AutoPool(), nn.Sequential(*head))


class _SquimObjectiveReplica(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()
        self.dprnn = _DPRNN()
        self.branches = nn.ModuleList(
            [_branch(m) for m in ("stoi", "pesq", "si_sdr")])

    def forward(self, x):
        rms = torch.sqrt(torch.mean(x ** 2, dim=1, keepdim=True))
        x = x / (rms * 20.0 + 1e-8)
        z = self.dprnn(self.encoder(x)).permute(0, 2, 1)
        return [b(z).squeeze(1) for b in self.branches]


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    replica = _SquimObjectiveReplica().eval()
    model = SquimObjectiveTA(**CFG)
    params = import_squim_objective(replica.state_dict(), model)
    return replica, model, params


def test_forward_parity(pair):
    replica, model, params = pair
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((3, 400)) * 0.3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in replica(torch.from_numpy(wav))]
    got = model.apply(params, jnp.asarray(wav))
    assert len(got) == 3
    for g, w, name in zip(got, want, model.METRICS):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-4,
                                   err_msg=name)


def test_ranges_and_jit(pair):
    replica, model, params = pair
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 300)), jnp.float32)
    stoi, pesq, _ = jax.jit(model.apply)(params, wav)
    assert float(stoi.min()) > 0.0 and float(stoi.max()) < 1.0
    assert float(pesq.min()) > 1.0 and float(pesq.max()) < 4.5


def test_wrong_model_rejected(pair):
    replica, _, _ = pair
    from torchaudio_contrib_tpu.models import SquimObjective
    with pytest.raises(ValueError, match="torchaudio-compatible"):
        import_squim_objective(replica.state_dict(), SquimObjective())


def test_chunk_roundtrip():
    """_merge(_split(x)) == 2·x: the two interleaved 50 %-overlap
    views each cover every position exactly once and the canonical
    DPRNN merge overlap-adds without averaging (the learned layers
    absorb the factor)."""
    model = SquimObjectiveTA(**CFG)
    rng = np.random.default_rng(2)
    for T in (5, 7, 13, 28, 35):
        x = jnp.asarray(rng.standard_normal((2, T, CFG["feat_dim"])),
                        jnp.float32)
        z, rest = model._split(x)
        y = model._merge(z, rest)
        assert y.shape == x.shape
        np.testing.assert_allclose(np.asarray(y), 2 * np.asarray(x),
                                   atol=1e-6)
