"""simulate_rir_ism vs a float64 per-image NumPy loop oracle, plus
physical sanity (direct path, absorption monotonicity, symmetry) and
composition with fftconvolve."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac

C = 343.0
SR = 16000.0


def _oracle(room, source, mics, max_order, absorption, t_len, flen):
    """Literal per-image loop (float64), independent index arithmetic."""
    room = np.asarray(room, np.float64)
    source = np.asarray(source, np.float64)
    mics = np.atleast_2d(np.asarray(mics, np.float64))
    alpha = np.asarray(absorption, np.float64)
    if alpha.ndim == 0:
        alpha = np.full(6, float(alpha))
    refl = np.sqrt(1 - alpha)
    half = flen // 2
    rir = np.zeros((len(mics), t_len))
    rng = range(-max_order, max_order + 1)
    for nx in rng:
        for ny in rng:
            for nz in rng:
                for px in (0, 1):
                    for py in (0, 1):
                        for pz in (0, 1):
                            n = np.array([nx, ny, nz])
                            p = np.array([px, py, pz])
                            if (np.abs(n - p).sum()
                                    + np.abs(n).sum()) > max_order:
                                continue
                            att = 1.0
                            for d in range(3):
                                att *= (refl[2 * d] ** abs(n[d] - p[d])
                                        * refl[2 * d + 1] ** abs(n[d]))
                            pos = (1 - 2 * p) * source + 2 * n * room
                            for mi, mic in enumerate(mics):
                                dist = max(np.linalg.norm(pos - mic),
                                           1e-3)
                                delay = dist * SR / C
                                a = att / (4 * np.pi * dist)
                                base = int(np.floor(delay))
                                frac = delay - base
                                for k in range(-half, half + 1):
                                    t = base + k
                                    if not 0 <= t < t_len:
                                        continue
                                    arg = k - frac
                                    if abs(arg) > half + 1:
                                        continue
                                    w = 0.5 * (1 + math.cos(
                                        math.pi * arg / (half + 1)))
                                    rir[mi, t] += a * np.sinc(arg) * w
    return rir


def test_matches_loop_oracle_first_order():
    room = [4.0, 5.0, 3.0]
    src = [1.0, 2.0, 1.5]
    mics = [[2.5, 3.5, 1.2], [3.0, 1.0, 2.0]]
    got = np.asarray(tac.simulate_rir_ism(
        room, src, mics, max_order=1, absorption=0.2,
        output_length=1200, delay_filter_length=41))
    ref = _oracle(room, src, mics, 1, 0.2, 1200, 41)
    assert got.shape == (2, 1200)
    assert np.max(np.abs(got - ref)) <= 1e-5


def test_direct_path_only():
    """max_order=0 with p=(0,0,0) is the direct path; the other 7
    zeroth-lattice images are the first-wall mirrors of order 1, so
    they are excluded — a single sinc at dist/c with 1/(4πd) amplitude."""
    src = [1.0, 1.0, 1.0]
    d = 100.0 * C / SR                  # exactly 100 samples of delay
    mic = [[1.0 + d, 1.0, 1.0]]
    rir = np.asarray(tac.simulate_rir_ism(
        [10.0, 10.0, 10.0], src, mic, max_order=0, absorption=0.9,
        output_length=400, delay_filter_length=81))
    peak = 100
    assert int(np.argmax(rir[0])) == peak
    # integer delay ⇒ the center tap is sinc(0)·w(0)·1/(4πd) exactly
    assert abs(rir[0].max() - 1 / (4 * np.pi * d)) <= 1e-4
    # energy beyond the direct-path window is negligible
    assert np.abs(rir[0][peak + 60:]).max() <= 1e-6


def test_absorption_monotonicity_and_tail():
    room = [4.0, 3.0, 2.5]
    src = [1.0, 1.5, 1.0]
    mic = [[3.0, 1.0, 1.8]]
    kw = dict(max_order=6, output_length=4000, delay_filter_length=41)
    live = np.asarray(tac.simulate_rir_ism(room, src, mic,
                                           absorption=0.05, **kw))
    dead = np.asarray(tac.simulate_rir_ism(room, src, mic,
                                           absorption=0.7, **kw))
    # reverberant energy decreases with absorption
    tail = slice(1000, None)
    assert np.sum(live[0][tail] ** 2) > 10 * np.sum(dead[0][tail] ** 2)
    # per-wall absorption accepted; bad shapes/values raise
    ok = tac.simulate_rir_ism(room, src, mic,
                              absorption=[0.1] * 6, **kw)
    assert ok.shape == (1, 4000)
    with pytest.raises(ValueError):
        tac.simulate_rir_ism(room, src, mic, absorption=[0.1] * 7, **kw)
    with pytest.raises(ValueError):
        tac.simulate_rir_ism(room, src, mic, absorption=1.0, **kw)
    with pytest.raises(ValueError):
        tac.simulate_rir_ism(room, src, mic, delay_filter_length=80,
                             max_order=1)


def test_symmetric_mics_get_identical_rirs():
    room = [4.0, 4.0, 4.0]
    src = [2.0, 2.0, 2.0]                       # centered
    mics = [[1.0, 2.0, 2.0], [3.0, 2.0, 2.0]]   # mirror pair
    rir = np.asarray(tac.simulate_rir_ism(
        room, src, mics, max_order=2, absorption=0.3,
        output_length=2000, delay_filter_length=41))
    np.testing.assert_allclose(rir[0], rir[1], atol=1e-5)


def test_reverb_composition_with_fftconvolve():
    rng = np.random.default_rng(0)
    dry = jnp.asarray(rng.standard_normal(4000).astype(np.float32))
    rir = tac.simulate_rir_ism([5.0, 4.0, 3.0], [1.0, 1.0, 1.0],
                               [[4.0, 3.0, 2.0]], max_order=4,
                               absorption=0.1, output_length=3000,
                               delay_filter_length=41)
    wet = tac.fftconvolve(dry[None], rir, mode="full")
    assert wet.shape == (1, 4000 + 3000 - 1)
    # the tail carries reverberant energy the dry signal doesn't have
    assert float(jnp.sum(wet[0, 4000:] ** 2)) > 0
