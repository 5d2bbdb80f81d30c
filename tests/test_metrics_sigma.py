"""PSNR/SSIM and sigma-estimation tests."""

import jax.numpy as jnp
import numpy as np

from pnp_svrg_tpu.ops.metrics import psnr, psnr_rounded, ssim
from pnp_svrg_tpu.ops.sigma import estimate_sigma


def test_psnr_closed_form(rng):
    a = jnp.asarray(rng.uniform(0, 1, (32, 32)), jnp.float32)
    b = jnp.clip(a + 0.1, 0, 1)
    m = float(jnp.mean((a - b) ** 2))
    expected = 10 * np.log10(1.0 / m)
    np.testing.assert_allclose(float(psnr(a, b)), expected, rtol=1e-5)


def test_psnr_rounding(rng):
    a = jnp.asarray(rng.uniform(0, 1, (16, 16)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (16, 16)), jnp.float32)
    v = float(psnr_rounded(a, b))
    assert abs(v - round(v, 2)) < 1e-6


def test_ssim_identical_is_one(rng):
    a = jnp.asarray(rng.uniform(0, 1, (64, 64)), jnp.float32)
    assert float(ssim(a, a)) > 0.9999


def test_ssim_orders_by_distortion(rng):
    a = jnp.asarray(rng.uniform(0, 1, (64, 64)), jnp.float32)
    slight = a + 0.02 * jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    heavy = a + 0.3 * jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    assert float(ssim(a, slight)) > float(ssim(a, heavy))


def test_estimate_sigma_recovers_awgn(rng):
    # A smooth image + known AWGN: the db2-MAD estimator should land within
    # ~15% of the true sigma (the estimator's normal accuracy on smooth data).
    xx, yy = np.meshgrid(np.linspace(0, 1, 128), np.linspace(0, 1, 128))
    clean = (np.sin(3 * xx) * np.cos(2 * yy) * 0.3 + 0.5).astype(np.float32)
    for true_sigma in [0.05, 0.1, 0.2]:
        noisy = clean + true_sigma * rng.standard_normal((128, 128)).astype(
            np.float32
        )
        est = float(estimate_sigma(jnp.asarray(noisy)))
        assert abs(est - true_sigma) / true_sigma < 0.15, (true_sigma, est)


def test_estimate_sigma_constant_image():
    # Float roundoff can leave ~1e-8 detail coefficients; the estimate must
    # be numerically negligible.
    est = float(estimate_sigma(jnp.ones((32, 32))))
    assert est < 1e-6
