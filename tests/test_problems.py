"""Problem-layer tests: the reference's gradient checkers ported as pytest
properties (finite differences + stochastic unbiasedness, reference
``problems/problem.py:131-175``), plus operator adjointness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.core.problem import snr_to_sigma, sigma_to_snr
from pnp_svrg_tpu.problems import (
    make_csmri,
    make_deblur,
    make_phase_retrieval,
)
from pnp_svrg_tpu.ops.resize import (
    bilinear_gather_params,
    bilinear_apply,
    bilinear_adjoint,
)
from pnp_svrg_tpu.ops.sampling import sample_k_mask, sample_k_indices


def _test_image(h=16, w=16):
    xx, yy = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    img = np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5
    return jnp.asarray(img, jnp.float32)


def _fd_grad_check(problem, key, tol):
    """Finite-difference vs analytic gradient (uses jax.grad of f as the
    high-precision reference instead of the O(N) FD loop)."""
    z = jax.random.uniform(key, (problem.n,))
    analytic = problem.grad_full(z).ravel()
    autodiff = jax.grad(lambda w: problem.f(w))(z)
    np.testing.assert_allclose(analytic, autodiff, atol=tol, rtol=tol)


def _unbiasedness_check(problem, key, mb_all, tol):
    """grad_full(w) == sum_i grad_stoch(w, e_i) / M (reference
    ``problem.py:157-175``) — here verified with the full minibatch at once,
    which equals the sum over singletons by linearity of the operators."""
    z = jax.random.uniform(key, (problem.n,))
    full = problem.grad_full(z).ravel()
    stoch_sum = problem.grad_stoch(z, mb_all).ravel()
    np.testing.assert_allclose(full, stoch_sum / problem_scale(problem), atol=tol)


def problem_scale(problem):
    # grad_full normalizes by M0 (CSMRI) or M (others).
    from pnp_svrg_tpu.problems import CSMRI

    if isinstance(problem, CSMRI):
        return float(problem.m0)
    return float(problem.m)


class TestCSMRI:
    def test_construction(self, key):
        p = make_csmri(key, _test_image(), sample_prob=0.5, snr=10)
        assert p.y.shape == (16, 16)
        assert float(p.m0) == float(jnp.sum(p.mask))
        assert 0.0 <= float(p.x_init.min()) and float(p.x_init.max()) <= 1.0
        # Spectrum zero off-mask.
        assert float(jnp.abs(jnp.where(p.mask == 0, p.y, 0)).max()) == 0.0

    def test_grad_full_matches_autodiff(self, key):
        # The unnormalized-DFT adjoint is N*ifft2, and f normalizes by M=N
        # while grad_full normalizes by M0 (reference quirk, CSMRI.py:61-81),
        # so autodiff(f) == grad_full * M0. Direction is identical.
        p = make_csmri(key, _test_image(), sample_prob=0.5, snr=10)
        z = jax.random.uniform(jax.random.PRNGKey(1), (p.n,))
        analytic = p.grad_full(z).ravel()
        autodiff = jax.grad(lambda w: p.f(w))(z)
        np.testing.assert_allclose(
            analytic * float(p.m0), autodiff, atol=1e-4
        )

    def test_stoch_unbiasedness(self, key):
        p = make_csmri(key, _test_image(), sample_prob=0.5, snr=10)
        z = jax.random.uniform(jax.random.PRNGKey(1), (p.n,))
        full = p.grad_full(z).ravel()
        stoch_all = p.grad_stoch(z, p.mask).ravel()  # all sampled coords
        np.testing.assert_allclose(full, stoch_all / float(p.m0), atol=1e-6)

    def test_select_mb_respects_mask(self, key):
        p = make_csmri(key, _test_image(), sample_prob=0.5, snr=10)
        mb = p.select_mb(jax.random.PRNGKey(2), 20)
        assert float(jnp.sum(mb)) == 20.0
        assert float(jnp.sum(mb * (1 - p.mask))) == 0.0

    def test_snr_sigma_roundtrip(self, key):
        p = make_csmri(key, _test_image(), sample_prob=0.5, snr=10)
        back = float(sigma_to_snr(jnp.asarray(p.sigma), p.y - (p.y - p.mask * jnp.fft.fft2(p.x)), 16, 16))
        # Y0 = mask * fft2(x); regenerate and compare round-trip.
        y0 = p.mask * jnp.fft.fft2(p.x)
        np.testing.assert_allclose(
            float(sigma_to_snr(jnp.asarray(p.sigma), y0, 16, 16)), 10.0, atol=0.2
        )


class TestDeblur:
    @pytest.mark.parametrize("scale", [100, 50])
    def test_grad_full_matches_autodiff(self, key, scale):
        p = make_deblur(key, _test_image(), kernel="Minimal", scale_percent=scale, snr=5)
        _fd_grad_check(p, jax.random.PRNGKey(1), 2e-4)

    def test_stoch_unbiasedness(self, key):
        p = make_deblur(key, _test_image(), kernel="Minimal", scale_percent=50, snr=5)
        z = jax.random.uniform(jax.random.PRNGKey(1), (p.n,))
        full = p.grad_full(z).ravel()
        stoch_all = p.grad_stoch(z, jnp.ones((p.m,))).ravel()
        np.testing.assert_allclose(full, stoch_all / p.m, atol=1e-6)

    def test_forward_identity_kernel_no_downsample(self, key):
        # Identity kernel + scale 100: forward is a scaled permutation of z
        # (the reference's 1/N kernel scaling and sqrt(N) conv factor).
        p = make_deblur(key, _test_image(8, 8), kernel="Identity", scale_percent=100, sigma=0.0)
        z = jax.random.uniform(jax.random.PRNGKey(1), (p.n,))
        out = p.forward(z)
        np.testing.assert_allclose(out, z * (np.sqrt(p.n) / p.n), atol=1e-6)


class TestBilinear:
    def test_adjointness(self, rng):
        h, w, lh, lw = 16, 16, 8, 8
        idx, wts = bilinear_gather_params(h, w, lh, lw)
        x = jnp.asarray(rng.standard_normal(h * w), jnp.float32)
        y = jnp.asarray(rng.standard_normal(lh * lw), jnp.float32)
        ax = bilinear_apply(x, idx, wts)
        aty = bilinear_adjoint(y, idx, wts, h * w)
        np.testing.assert_allclose(
            float(jnp.dot(ax, y)), float(jnp.dot(x, aty)), rtol=1e-5
        )

    def test_identity_when_same_size(self, rng):
        idx, wts = bilinear_gather_params(8, 8, 8, 8)
        x = jnp.asarray(rng.standard_normal(64), jnp.float32)
        np.testing.assert_allclose(bilinear_apply(x, idx, wts), x, atol=1e-7)


class TestPhaseRetrieval:
    def test_grad_full_matches_autodiff(self, key):
        p = make_phase_retrieval(key, _test_image(8, 8), num_meas=256, snr=20)
        _fd_grad_check(p, jax.random.PRNGKey(1), 2e-4)

    def test_stoch_unbiasedness(self, key):
        p = make_phase_retrieval(key, _test_image(8, 8), num_meas=256, snr=20)
        z = jax.random.uniform(jax.random.PRNGKey(1), (p.n,))
        full = p.grad_full(z).ravel()
        stoch_all = p.grad_stoch(z, jnp.arange(p.m)).ravel()
        np.testing.assert_allclose(full, stoch_all / p.m, atol=1e-5, rtol=1e-4)

    def test_spectral_init_correlates(self, key):
        # Spectral init should correlate with ground truth far above chance
        # (reference prints this correlation in PR.py:106).
        img = _test_image(8, 8)
        p = make_phase_retrieval(key, img, num_meas=1280, sigma=0.0)
        xi = p.x_init.ravel()
        x = p.x.ravel()
        corr = float(
            jnp.dot(xi, x) ** 2 / (jnp.sum(xi * xi) * jnp.sum(x * x))
        )
        assert corr > 0.7


class TestSampling:
    def test_exact_count_and_uniqueness(self, key):
        idx = sample_k_indices(key, 100, 30)
        assert len(np.unique(np.asarray(idx))) == 30

    def test_mask_count(self, key):
        m = sample_k_mask(key, (10, 10), 17)
        assert float(jnp.sum(m)) == 17.0

    def test_allowed_restriction(self, key):
        allowed = jnp.zeros(100).at[jnp.arange(0, 100, 2)].set(1)
        idx = sample_k_indices(key, 100, 20, allowed=allowed)
        assert all(i % 2 == 0 for i in np.asarray(idx))

    def test_uniformity(self):
        # Chi-square-ish sanity: each index selected roughly equally often.
        counts = np.zeros(20)
        for s in range(200):
            idx = sample_k_indices(jax.random.PRNGKey(s), 20, 5)
            counts[np.asarray(idx)] += 1
        freq = counts / counts.sum()
        assert freq.max() < 0.10 and freq.min() > 0.02


class TestKeepLowFreq:
    def test_low_freq_block_guaranteed(self):
        import jax, jax.numpy as jnp
        from pnp_svrg_tpu.problems import make_csmri

        img = jnp.asarray(np.random.default_rng(0).uniform(size=(16, 16)), jnp.float32)
        # keep=0 reproduces the plain Bernoulli mask exactly
        p0 = make_csmri(jax.random.PRNGKey(3), img, sample_prob=0.3, snr=10)
        pk = make_csmri(jax.random.PRNGKey(3), img, sample_prob=0.3, snr=10,
                        keep_low_freq=3)
        m0, mk = np.asarray(p0.mask), np.asarray(pk.mask)
        idx = np.r_[0:3, 16 - 2: 16]
        assert (mk[np.ix_(idx, idx)] == 1.0).all()
        # outside the low-frequency block the Bernoulli draw is untouched
        outside = np.ones((16, 16), bool)
        outside[np.ix_(idx, idx)] = False
        np.testing.assert_array_equal(mk[outside], m0[outside])
        assert float(pk.m0) == mk.sum()

    def test_dc_only(self):
        import jax, jax.numpy as jnp
        from pnp_svrg_tpu.problems import make_csmri

        img = jnp.asarray(np.random.default_rng(1).uniform(size=(8, 8)), jnp.float32)
        pk = make_csmri(jax.random.PRNGKey(0), img, sample_prob=0.1, snr=10,
                        keep_low_freq=1)
        assert float(pk.mask[0, 0]) == 1.0


class TestKernelFromImage:
    def test_load_kernel_image_and_make_deblur(self):
        import jax, jax.numpy as jnp
        from pnp_svrg_tpu.problems import make_deblur
        from pnp_svrg_tpu.problems.deblur import load_kernel_image
        from pnp_svrg_tpu.utils.io import resolve_data_path

        path = str(resolve_data_path("kernel25.png"))
        kern = load_kernel_image(path, 16, 16)
        assert kern.shape == (16, 16)
        assert kern.max() > 1.0  # raw PIL pixel values (reference DeblurSR.py:75)

        img = jnp.asarray(np.random.default_rng(0).uniform(size=(16, 16)), jnp.float32)
        prob = make_deblur(jax.random.PRNGKey(0), img, kernel=path, snr=5)
        # the stored kernel is ravel()/N of the raw values (DeblurSR.py:93)
        np.testing.assert_allclose(
            np.asarray(prob.b), kern.ravel() / 256.0, rtol=1e-6
        )
        # the forward model stays finite and the gradients check out
        g = np.asarray(prob.grad_full(prob.x_init))
        assert np.isfinite(g).all()
