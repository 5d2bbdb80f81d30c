"""Denoiser tests: each denoiser reduces noise and respects the sigma
selection contract (sigma_est vs. strength-decay fallback)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.denoisers import TVDenoiser, NLMDenoiser
from pnp_svrg_tpu.denoisers.nlm import nlm_denoise


def _clean(h=64):
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    return jnp.asarray(np.sin(5 * xx) * np.cos(4 * yy) * 0.3 + 0.5, jnp.float32)


@pytest.fixture
def noisy_pair(rng):
    clean = _clean()
    noisy = clean + 0.08 * jnp.asarray(rng.standard_normal(clean.shape), jnp.float32)
    return clean, noisy


def _mse(a, b):
    return float(jnp.mean((a - b) ** 2))


class TestTV:
    def test_reduces_noise(self, noisy_pair):
        clean, noisy = noisy_pair
        den = TVDenoiser(sigma_modifier=1.0)
        out = den.denoise(noisy, 0.08, 1)
        assert _mse(out, clean) < 0.5 * _mse(noisy, clean)

    def test_fallback_strength(self, noisy_pair):
        _, noisy = noisy_pair
        den = TVDenoiser(denoise_strength=0.08, decay=1.0)
        out_fallback = den.denoise(noisy, 0.0, 1)
        out_est = TVDenoiser(sigma_modifier=1.0).denoise(noisy, 0.08, 1)
        np.testing.assert_allclose(out_fallback, out_est, atol=1e-6)

    def test_decay_weakens_over_time(self, noisy_pair):
        _, noisy = noisy_pair
        den = TVDenoiser(denoise_strength=0.2, decay=0.5)
        early = den.denoise(noisy, 0.0, 1)
        late = den.denoise(noisy, 0.0, 10)
        # Later calls shrink less -> closer to input.
        assert _mse(late, noisy) < _mse(early, noisy)


class TestNLM:
    def test_reduces_noise(self, noisy_pair):
        clean, noisy = noisy_pair
        out = nlm_denoise(noisy, h=jnp.asarray(0.08), sigma=jnp.asarray(0.08))
        assert _mse(out, clean) < 0.6 * _mse(noisy, clean)

    def test_zero_h_near_identity(self, noisy_pair):
        _, noisy = noisy_pair
        out = nlm_denoise(noisy, h=jnp.asarray(1e-6), sigma=jnp.asarray(0.0))
        # With h -> 0 only exact self-matches get weight ~1.
        np.testing.assert_allclose(out, noisy, atol=1e-3)

    def test_denoiser_wrapper(self, noisy_pair):
        clean, noisy = noisy_pair
        den = NLMDenoiser(sigma_modifier=1.0)
        out = den.denoise(noisy, 0.08, 1)
        assert _mse(out, clean) < _mse(noisy, clean)

    def test_constant_region_preserved(self):
        x = jnp.ones((32, 32)) * 0.5
        out = nlm_denoise(x, h=jnp.asarray(0.1), sigma=jnp.asarray(0.05))
        np.testing.assert_allclose(out, x, atol=1e-5)
