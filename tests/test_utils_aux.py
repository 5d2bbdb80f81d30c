"""Auxiliary-subsystem tests: public gradient checkers, Params/Experiment
config tree, logger, phase timers, and training-utils parity functions
(reference training/utilities/{params,log,utils}.py, problem.py:131-175)."""

import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.core import grad_full_check, grad_stoch_check, GradientCheckError
from pnp_svrg_tpu.problems import make_csmri, make_deblur, make_phase_retrieval
from pnp_svrg_tpu.training.utils import (
    batch_psnr,
    batch_ssim,
    l2_reg_normal_ortho,
    adjust_ortho_decay_rate,
    unroll_kernel,
    unroll_kernel_sparse,
)
from pnp_svrg_tpu.utils import (
    AlgorithmConfig,
    ExperimentConfig,
    Params,
    PhaseTimers,
    set_logger,
)


def _img(h=32, w=32):
    xx, yy = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    return jnp.asarray(np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5, jnp.float32)


class TestGradientCheckers:
    @pytest.mark.parametrize("maker", ["csmri", "deblur", "pr"])
    def test_checks_pass_on_real_problems(self, key, maker):
        img = _img()
        if maker == "csmri":
            p = make_csmri(key, img, sample_prob=0.5, snr=10)
        elif maker == "deblur":
            p = make_deblur(key, img, kernel="Minimal", scale_percent=50, snr=5)
        else:
            p = make_phase_retrieval(key, img, num_meas=512, snr=20)
        assert grad_full_check(p, tol=5e-3) < 5e-3
        assert grad_stoch_check(p, tol=1e-4) < 1e-4

    def test_detects_broken_gradient(self, key):
        p = make_csmri(key, _img(), sample_prob=0.5, snr=10)

        class Broken:
            """Problem with a wrongly-scaled gradient."""

            x_init = p.x_init

            def f(self, z):
                return p.f(z)

            def grad_full(self, z):
                return 3.0 * p.grad_full(z)

        with pytest.raises(GradientCheckError):
            grad_full_check(Broken(), tol=1e-3)


class TestParams:
    def test_roundtrip(self, tmp_path):
        p = Params({"lr": 1e-3, "layers": 17})
        path = tmp_path / "p.json"
        p.save(path)
        q = Params(path)
        assert q.lr == 1e-3 and q.layers == 17
        assert q == p
        q.lr = 5e-4
        assert q.dict["lr"] == 5e-4

    def test_update_merges(self, tmp_path):
        a, b = tmp_path / "a.json", tmp_path / "b.json"
        json.dump({"x": 1, "y": 2}, open(a, "w"))
        json.dump({"y": 3, "z": 4}, open(b, "w"))
        p = Params(a)
        p.update(b)
        assert (p.x, p.y, p.z) == (1, 3, 4)


class TestExperimentConfig:
    def test_roundtrip(self, tmp_path):
        cfg = ExperimentConfig(algorithm=AlgorithmConfig(name="saga", eta=0.5))
        path = tmp_path / "exp.json"
        cfg.save(path)
        back = ExperimentConfig.load(path)
        assert back == cfg
        assert back.algorithm.name == "saga"

    def test_rejects_unknown_keys(self):
        with pytest.raises(ValueError, match="unknown"):
            ExperimentConfig.from_dict({"algorithm": {"bogus": 1}})
        with pytest.raises(ValueError, match="unknown config sections"):
            ExperimentConfig.from_dict({"nonsense": {}})


class TestLoggerTimers:
    def test_set_logger_writes_file(self, tmp_path):
        path = tmp_path / "run.log"
        logger = set_logger(path, name="pnp-test")
        logger.info("hello pnp")
        for h in logger.handlers:
            h.flush()
        assert "hello pnp" in path.read_text()
        # idempotent: second call must not duplicate handlers
        n = len(logger.handlers)
        assert len(set_logger(path, name="pnp-test").handlers) == n

    def test_phase_timers_accumulate(self):
        t = PhaseTimers()
        x = jnp.ones((64, 64))
        with t.phase("gradient", fence=x):
            y = x * 2
        with t.phase("denoise"):
            time.sleep(0.01)
        tot = t.totals()
        assert tot["gradient"] >= 0 and tot["denoise"] >= 0.01
        assert t.counts() == {"gradient": 1, "denoise": 1}
        assert "denoise" in t.summary()


class TestTrainingUtils:
    def test_batch_metrics_match_single(self):
        rng = np.random.default_rng(0)
        clean = jnp.asarray(rng.random((3, 32, 32)), jnp.float32)
        noisy = jnp.clip(clean + 0.1 * rng.standard_normal((3, 32, 32)).astype(np.float32), 0, 1)
        bp = float(batch_psnr(noisy, clean))
        bs = float(batch_ssim(noisy, clean))
        from pnp_svrg_tpu.ops.metrics import psnr, ssim

        singles_p = np.mean([float(psnr(clean[i], noisy[i])) for i in range(3)])
        singles_s = np.mean([float(ssim(clean[i], noisy[i])) for i in range(3)])
        np.testing.assert_allclose(bp, singles_p, rtol=1e-5)
        np.testing.assert_allclose(bs, singles_s, rtol=1e-5)

    def test_ortho_reg_zero_for_orthonormal(self):
        # W^T W - I vanishes exactly when W (rows, cols), cols <= rows, has
        # orthonormal columns; random matrices give a strictly positive
        # penalty. (For conv kernels with cols > rows the penalty is a soft
        # floor, never zero — same as the reference regularizer.)
        q, _ = np.linalg.qr(np.random.default_rng(1).standard_normal((64, 8)))
        ortho = {"dense": jnp.asarray(q, jnp.float32)}
        rand = {"dense": jnp.asarray(
            np.random.default_rng(2).standard_normal((64, 8)), jnp.float32
        )}
        import jax

        k = jax.random.PRNGKey(0)
        assert float(l2_reg_normal_ortho(ortho, k)) < 1e-6
        assert float(l2_reg_normal_ortho(rand, k)) > 1e-2
        # a fresh probe key must give a fresh (but similar-scale) estimate
        k2 = jax.random.fold_in(k, 1)
        assert float(l2_reg_normal_ortho(rand, k2)) > 1e-2
        # conv-kernel (4-D) leaves take the flax (kh, kw, c_in, c_out) layout
        conv = {"conv": jnp.asarray(
            np.random.default_rng(3).standard_normal((3, 3, 4, 8)), jnp.float32
        )}
        assert float(l2_reg_normal_ortho(conv, jax.random.PRNGKey(2))) > 0.0

    def test_ortho_decay_schedule(self):
        assert adjust_ortho_decay_rate(5, 1.0) == 1.0
        assert adjust_ortho_decay_rate(15, 1.0) == 1e-3
        assert adjust_ortho_decay_rate(25, 1.0) == 1e-4
        assert adjust_ortho_decay_rate(35, 1.0) == 1e-6
        assert adjust_ortho_decay_rate(45, 1.0) == 0.0

    def test_unroll_kernel_matches_conv(self):
        rng = np.random.default_rng(3)
        n, m, c_out = 8, 3, 2
        kernel = rng.standard_normal((c_out, 1, m, m)).astype(np.float32)
        x = rng.standard_normal((n, n)).astype(np.float32)
        mat = unroll_kernel(kernel, n)
        out_mat = (mat @ x.ravel()).reshape(c_out, n - m + 1, n - m + 1)
        # VALID cross-correlation reference
        from scipy.signal import correlate2d

        for c in range(c_out):
            ref = correlate2d(x, kernel[c, 0], mode="valid")
            np.testing.assert_allclose(out_mat[c], ref, rtol=1e-5, atol=1e-5)
        sp = unroll_kernel_sparse(kernel, n)
        np.testing.assert_allclose(sp.toarray(), mat, rtol=1e-6)
