"""Pallas NLM kernel vs the jnp reference implementation (interpret mode on
CPU; the same kernel compiles with Mosaic on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.denoisers.nlm import nlm_denoise
from pnp_svrg_tpu.ops.pallas.nlm_kernel import nlm_denoise_pallas


@pytest.mark.parametrize("shape", [(32, 32), (48, 40)])
def test_matches_jnp_reference(rng, shape):
    x = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    h = jnp.asarray(0.08)
    sigma = jnp.asarray(0.08)
    ref = nlm_denoise(x, h, sigma)
    out = nlm_denoise_pallas(x, h, sigma, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_batched_matches_jnp_reference_per_lane_params(rng):
    """(B, H, W) batch with per-lane (h, sigma) — the PnP runner's natively
    batched denoiser call — must match the jnp path lane for lane."""
    x = jnp.asarray(rng.uniform(0, 1, (3, 32, 40)), jnp.float32)
    h = jnp.asarray([0.05, 0.08, 0.12])
    sigma = jnp.asarray([0.05, 0.08, 0.02])
    ref = nlm_denoise(x, h, sigma)
    out = nlm_denoise_pallas(x, h, sigma, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_batched_scalar_params_matches_single(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32)), jnp.float32)
    h = jnp.asarray(0.08)
    out_b = nlm_denoise_pallas(x, h, h, interpret=True)
    for i in range(2):
        out_i = nlm_denoise_pallas(x[i], h, h, interpret=True)
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_i),
                                   atol=1e-6)


def test_denoises(rng):
    xx, yy = np.meshgrid(np.linspace(0, 1, 48), np.linspace(0, 1, 48))
    clean = jnp.asarray(np.sin(5 * xx) * np.cos(4 * yy) * 0.3 + 0.5, jnp.float32)
    noisy = clean + 0.08 * jnp.asarray(rng.standard_normal((48, 48)), jnp.float32)
    out = nlm_denoise_pallas(noisy, jnp.asarray(0.08), jnp.asarray(0.08),
                             interpret=True)
    assert float(jnp.mean((out - clean) ** 2)) < 0.6 * float(
        jnp.mean((noisy - clean) ** 2)
    )
