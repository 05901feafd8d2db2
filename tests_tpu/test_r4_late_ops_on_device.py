"""On-device (TPU) checks for the late-round-4 op additions:
``compute_kaldi_pitch``, ``ctc_beam_decode``, ``ray_tracing``, and the
prototype Bark/Chroma transforms.  Same contract as the zoo file —
device result vs the identical computation on the in-process CPU
backend; these catch CPU-green-but-device-broken numerics, not logic
bugs (tests/ owns those)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torchaudio_contrib_tpu as tac


@pytest.fixture(autouse=True)
def _highest_matmul_precision():
    with jax.default_matmul_precision("highest"):
        yield


def _cpu():
    return jax.devices("cpu")[0]


def _on_cpu(f, *args):
    with jax.default_device(_cpu()):
        args = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, _cpu()) if hasattr(a, "shape")
            else a, args)
        return f(*args)


def _close(dev, cpu, tol=2e-3, what=""):
    dev = np.asarray(dev)
    cpu = np.asarray(cpu)
    scale = max(float(np.max(np.abs(cpu))), 1e-6)
    rel = float(np.max(np.abs(dev - cpu))) / scale
    assert np.all(np.isfinite(dev)), f"{what}: non-finite on device"
    assert rel <= tol, f"{what}: device-vs-cpu rel err {rel}"


def test_kaldi_pitch_on_device():
    sr = 16000
    t = np.arange(sr) / sr
    x = np.stack([
        (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32),
        (0.3 * np.sin(2 * np.pi * 260 * t)).astype(np.float32)])
    f = lambda w: tac.compute_kaldi_pitch(w, sr)
    dev = jax.jit(f)(jnp.asarray(x))
    cpu = _on_cpu(f, x)
    # Viterbi state choices are discrete: any state disagreement is a
    # >=0.5 % pitch jump (the geometric grid ratio), so a 1e-4 rel
    # tolerance proves SAME argmins while allowing the backends'
    # ULP-level rf/lag division difference (measured 8e-8 rel)
    _close(dev[..., 1], cpu[..., 1], tol=1e-4,
           what="kaldi-pitch-states")
    _close(dev[..., 0], cpu[..., 0], what="kaldi-pitch-nccf")


def test_ctc_beam_decode_on_device():
    rng = np.random.default_rng(0)
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(3, 20, 12)), jnp.float32)))
    f = lambda x: tac.ops.ctc_beam_decode(x, beam_width=6)
    toks_d, lens_d, sc_d = jax.jit(f)(jnp.asarray(lp))
    toks_c, lens_c, sc_c = _on_cpu(f, lp)
    np.testing.assert_array_equal(np.asarray(toks_d),
                                  np.asarray(toks_c))
    np.testing.assert_array_equal(np.asarray(lens_d),
                                  np.asarray(lens_c))
    _close(sc_d, sc_c, what="ctc-beam-scores")


def test_ray_tracing_on_device():
    room = np.array([5.0, 4.0, 3.0])
    src = np.array([1.0, 2.0, 1.5])
    mics = np.array([[3.5, 2.0, 1.5]])
    f = lambda: tac.ray_tracing(room, src, mics, 2000,
                                absorption=0.2, scattering=0.3,
                                time_thres=0.05,
                                hist_bin_size=0.002)
    dev = jax.jit(f)()
    cpu = _on_cpu(f)
    _close(dev, cpu, what="ray-tracing")
    assert float(np.asarray(dev).sum()) > 0


def test_bark_chroma_transforms_on_device():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4000)), jnp.float32)
    for t in (tac.BarkSpectrogram(n_fft=400, n_barks=24),
              tac.ChromaSpectrogram(n_fft=400)):
        dev = jax.jit(t)(x)
        cpu = _on_cpu(t, x)
        _close(dev, cpu, what=type(t).__name__)
