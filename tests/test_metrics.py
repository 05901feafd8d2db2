"""frechet_distance vs independent float64 oracles.

Oracle 1: scipy.linalg.sqrtm (Schur-based — a genuinely different
matrix-sqrt algorithm than the eigh route the op uses).
Oracle 2: diagonal-covariance closed form
``||Δμ||² + Σ (√sx − √sy)²``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import frechet_distance


def _rand_gaussian(rng, d):
    mu = rng.normal(size=d)
    a = rng.normal(size=(d, d))
    sigma = a @ a.T + 0.1 * np.eye(d)
    return mu, sigma


def _oracle(mu_x, sigma_x, mu_y, sigma_y):
    import scipy.linalg
    cross = scipy.linalg.sqrtm(sigma_x @ sigma_y)
    if np.iscomplexobj(cross):
        cross = cross.real
    diff = mu_x - mu_y
    return float(diff @ diff + np.trace(sigma_x) + np.trace(sigma_y)
                 - 2.0 * np.trace(cross))


@pytest.mark.parametrize("d", [3, 17])
def test_frechet_vs_scipy_sqrtm(d):
    rng = np.random.default_rng(d)
    mu_x, sigma_x = _rand_gaussian(rng, d)
    mu_y, sigma_y = _rand_gaussian(rng, d)
    got = float(frechet_distance(mu_x, sigma_x, mu_y, sigma_y))
    want = _oracle(mu_x, sigma_x, mu_y, sigma_y)
    assert got == pytest.approx(want, rel=1e-4, abs=1e-4)


def test_frechet_diagonal_closed_form_batched_jit():
    rng = np.random.default_rng(0)
    d, b = 8, 3
    mu_x = rng.normal(size=(b, d))
    mu_y = rng.normal(size=(b, d))
    sx = rng.uniform(0.1, 2.0, size=(b, d))
    sy = rng.uniform(0.1, 2.0, size=(b, d))
    sigma_x = np.einsum("bi,ij->bij", sx, np.eye(d))
    sigma_y = np.einsum("bi,ij->bij", sy, np.eye(d))
    got = jax.jit(frechet_distance)(mu_x, sigma_x, mu_y, sigma_y)
    want = (np.sum((mu_x - mu_y) ** 2, -1)
            + np.sum((np.sqrt(sx) - np.sqrt(sy)) ** 2, -1))
    np.testing.assert_allclose(np.asarray(got), want,
                               rtol=1e-4, atol=1e-5)


def test_frechet_self_is_zero_and_validates():
    rng = np.random.default_rng(1)
    mu, sigma = _rand_gaussian(rng, 6)
    # zero up to float32 cancellation between O(tr Σ)~10 terms
    assert float(frechet_distance(mu, sigma, mu, sigma)) \
        == pytest.approx(0.0, abs=2e-3)
    with pytest.raises(ValueError, match="mismatch"):
        frechet_distance(mu, sigma[:5, :5], mu, sigma)
    # y-side shapes are validated too (no silent broadcast / opaque
    # matmul error)
    with pytest.raises(ValueError, match="y-side"):
        frechet_distance(mu, sigma, mu[:1], sigma)
    with pytest.raises(ValueError, match="y-side"):
        frechet_distance(mu, sigma, mu, np.zeros((6, 5)))


def test_frechet_promotes_mixed_dtypes():
    # float64 inputs drive the promotion chain even when only one
    # operand carries the wider dtype (under default x64=off jax
    # clamps to float32, so assert the numpy-side promotion logic by
    # checking the computation accepts mixed dtypes without error)
    rng = np.random.default_rng(2)
    mu, sigma = _rand_gaussian(rng, 5)
    out = frechet_distance(mu.astype(np.float32), sigma,
                           (mu + 0.1).astype(np.float16), sigma)
    assert np.isfinite(float(out)) and float(out) > 0.0
