"""Wavelet transform tests: golden Haar values, perfect reconstruction,
BayesShrink behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.ops.wavelet import (
    dwt1,
    idwt1,
    dwt2,
    idwt2,
    wavedec2,
    waverec2,
    denoise_wavelet_bayes,
    soft_threshold,
    dwt_max_level,
)


def test_haar_golden_values():
    # pywt.dwt([1,2,3,4], 'haar') golden values.
    ca, cd = dwt1(jnp.array([1.0, 2.0, 3.0, 4.0]), "db1")
    np.testing.assert_allclose(ca, [2.12132034, 4.94974747], atol=1e-6)
    np.testing.assert_allclose(cd, [-0.70710678, -0.70710678], atol=1e-6)


@pytest.mark.parametrize("wavelet", ["db1", "db2", "db4"])
@pytest.mark.parametrize("n", [8, 9, 16, 17, 64, 128])
def test_perfect_reconstruction_1d(wavelet, n, rng):
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ca, cd = dwt1(x, wavelet)
    xr = idwt1(ca, cd, wavelet, n)
    np.testing.assert_allclose(xr, x, atol=2e-5)


@pytest.mark.parametrize("wavelet", ["db1", "db2"])
@pytest.mark.parametrize("shape", [(16, 16), (17, 23), (64, 64)])
def test_perfect_reconstruction_2d(wavelet, shape, rng):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ca, det = dwt2(x, wavelet)
    xr = idwt2(ca, det, wavelet, shape)
    np.testing.assert_allclose(xr, x, atol=2e-5)


@pytest.mark.parametrize("wavelet", ["db1", "db2"])
def test_multilevel_reconstruction(wavelet, rng):
    x = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    coeffs = wavedec2(x, wavelet, levels=3)
    assert len(coeffs) == 4
    xr = waverec2(coeffs, wavelet, (64, 64))
    np.testing.assert_allclose(xr, x, atol=5e-5)


def test_dwt_batched(rng):
    # Leading batch axes pass through.
    x = jnp.asarray(rng.standard_normal((3, 32, 32)), jnp.float32)
    ca, (ch, cv, cd) = dwt2(x, "db2")
    assert ca.shape[0] == 3
    x0_ca, _ = dwt2(x[0], "db2")
    np.testing.assert_allclose(ca[0], x0_ca, atol=1e-6)


def test_dwt_max_level():
    assert dwt_max_level(128, "db1") == 7
    assert dwt_max_level(128, "db2") == 5  # floor(log2(128/3))
    assert dwt_max_level(256, "db1") == 8


def test_soft_threshold():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(
        soft_threshold(x, 1.0), [-1.0, 0.0, 0.0, 0.0, 1.0], atol=1e-7
    )


def test_bayes_denoise_reduces_noise(rng):
    clean = jnp.asarray(
        np.outer(np.sin(np.linspace(0, 3, 64)), np.cos(np.linspace(0, 2, 64))),
        jnp.float32,
    ) * 0.5 + 0.5
    noisy = clean + 0.1 * jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    den = denoise_wavelet_bayes(noisy, 0.1)
    err_before = float(jnp.mean((noisy - clean) ** 2))
    err_after = float(jnp.mean((den - clean) ** 2))
    assert err_after < 0.5 * err_before


def test_bayes_denoise_zero_sigma_is_identityish(rng):
    x = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    den = denoise_wavelet_bayes(x, 0.0)
    np.testing.assert_allclose(den, x, atol=1e-4)
