"""VGGish: torch nn.Sequential replica forward parity through
``import_vggish``, a literal float64 NumPy ``mel_features`` oracle for
the input processor, and the prototype VGGISH bundle wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.models import VGGish, VGGishInputProcessor
from torchaudio_contrib_tpu import pipelines as P


def _torch_vggish():
    torch = pytest.importorskip("torch")
    from torch import nn

    class _T(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
            )
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, 128), nn.ReLU(True),
            )

        def forward(self, x):
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    torch.manual_seed(0)
    return _T()


def test_vggish_torch_replica_parity():
    torch = pytest.importorskip("torch")
    t = _torch_vggish().eval()
    model = VGGish()
    from torchaudio_contrib_tpu.utils.import_torch import import_vggish
    params = import_vggish(t.state_dict(), model)
    x = np.random.default_rng(0).standard_normal(
        (2, 1, 96, 64)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(params, x))
    assert got.shape == (2, 128)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    # NHW input (no channel dim) is the same forward
    got2 = np.asarray(model.apply(params, x[:, 0]))
    np.testing.assert_allclose(got2, got, atol=0, rtol=0)


def test_vggish_import_rejects_bad_shapes():
    torch = pytest.importorskip("torch")
    from torchaudio_contrib_tpu.utils.import_torch import import_vggish
    t = _torch_vggish()
    sd = dict(t.state_dict())
    sd["features.0.weight"] = torch.zeros(64, 2, 3, 3)
    with pytest.raises(ValueError, match="import_vggish"):
        import_vggish(sd, VGGish())


def _oracle_log_mel(x, sr=16000):
    """Literal float64 mel_features: periodic hann, no-center frames,
    |rfft|, HTK-mel triangle matrix with zeroed DC row, log(+0.01)."""
    win, hop, fft = 400, 160, 512
    n_frames = 1 + (len(x) - win) // hop
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi / win * np.arange(win))
    frames = np.stack([x[i * hop: i * hop + win] * window
                       for i in range(n_frames)])
    mag = np.abs(np.fft.rfft(frames, fft))

    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    bins_mel = mel(np.linspace(0.0, sr / 2.0, fft // 2 + 1))
    edges = np.linspace(mel(125.0), mel(7500.0), 66)
    w = np.empty((fft // 2 + 1, 64))
    for i in range(64):
        lo, ce, hi = edges[i], edges[i + 1], edges[i + 2]
        w[:, i] = np.maximum(0.0, np.minimum(
            (bins_mel - lo) / (ce - lo), (hi - bins_mel) / (hi - ce)))
    w[0, :] = 0.0
    return np.log(mag @ w + 0.01)


def test_input_processor_matches_float64_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(32000).astype(np.float64) * 0.1
    proc = VGGishInputProcessor()
    got = np.asarray(proc(x.astype(np.float32)))
    ref = _oracle_log_mel(x)
    n_frames = 1 + (len(x) - 400) // 160  # 198 → 2 patches of 96
    assert got.shape == (2, 96, 64)
    np.testing.assert_allclose(
        got.reshape(-1, 64), ref[:192], atol=2e-4, rtol=2e-4)
    # stereo downmix == mono mean
    st = np.stack([x, -x * 0.5]).astype(np.float32)
    got_st = np.asarray(proc(st))
    ref_st = _oracle_log_mel(x * 0.25)
    np.testing.assert_allclose(
        got_st.reshape(-1, 64), ref_st[:192], atol=2e-4, rtol=2e-4)


def test_input_processor_validates():
    proc = VGGishInputProcessor()
    with pytest.raises(ValueError, match="at least"):
        proc(np.zeros(100, np.float32))
    with pytest.raises(ValueError, match="too short"):
        proc(np.zeros(2000, np.float32))
    with pytest.raises(ValueError, match="expected"):
        proc(np.zeros((2, 2, 16000), np.float32))


def test_vggish_bundle_end_to_end_jit():
    b = P.VGGISH
    assert b.sample_rate == 16000
    model, params = b.get_model(key=jax.random.PRNGKey(0))
    proc = b.get_input_processor()
    wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)
                 ).astype(np.float32)
    patches = proc(wav)
    emb = jax.jit(model.apply)(params, patches)
    assert emb.shape == (patches.shape[0], 128)
    assert bool(jnp.all(emb >= 0))  # final ReLU
    with pytest.raises(ValueError, match="no pretrained"):
        b.get_model()
