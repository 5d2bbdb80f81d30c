"""Distributed-layer tests on the 8-device virtual CPU mesh: sharded
gradients match single-device values, batched runner matches per-image runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.denoisers import TVDenoiser
from pnp_svrg_tpu.parallel import (
    make_mesh,
    stack_problems,
    run_batch,
    shard_pr_problem,
    pr_grad_full_sharded,
    sharded_pnp_step,
)
from pnp_svrg_tpu.problems import make_csmri, make_phase_retrieval

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _img(h=16):
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    return jnp.asarray(np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5, jnp.float32)


@needs_8
class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh((8, 1))
        assert m.axis_names == ("batch", "meas")
        m2 = make_mesh((4, 2))
        assert m2.devices.shape == (4, 2)
        with pytest.raises(ValueError):
            make_mesh((3, 2))


@needs_8
class TestShardedPR:
    def test_sharded_grad_matches_local(self, key):
        p = make_phase_retrieval(key, _img(8), num_meas=256, snr=20)
        mesh = make_mesh((1, 8))
        ps = shard_pr_problem(p, mesh)
        z = jax.random.uniform(jax.random.PRNGKey(1), (p.n,))
        g_local = p.grad_full(z)
        g_sharded = pr_grad_full_sharded(ps, z, mesh)
        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_local), atol=2e-5
        )

    def test_sharded_step_runs(self):
        mesh = make_mesh((4, 2))
        bsz, m, n, h, w = 8, 32, 64, 8, 8
        key = jax.random.PRNGKey(0)
        ka, kx = jax.random.split(key)
        a = jax.random.normal(ka, (bsz, m, n))
        x = jax.random.uniform(kx, (bsz, n))
        y = jnp.abs(jnp.einsum("bmn,bn->bm", a, x))
        z0 = jax.random.uniform(jax.random.PRNGKey(1), (bsz, n))
        step = sharded_pnp_step(mesh, TVDenoiser(sigma_modifier=1.0), eta=0.05)
        z1, psnr = step(a, y, x, z0, h, w)
        assert z1.shape == (bsz, n)
        assert np.isfinite(np.asarray(psnr)).all()
        # One gradient step moves toward x on average.
        d0 = float(jnp.mean((z0 - x) ** 2))
        d1 = float(jnp.mean((z1 - x) ** 2))
        assert d1 < d0


@needs_8
class TestBatchedRunner:
    def test_run_batch_matches_individual(self, key):
        # GD is deterministic, so the batched run must match per-image runs.
        probs = [
            make_csmri(jax.random.PRNGKey(i), _img(16), sample_prob=0.5, snr=10)
            for i in range(4)
        ]
        den = TVDenoiser(sigma_modifier=0.7)
        out = run_batch("gd", probs, den, eta=100.0, n_iters=4)
        assert out["final_psnr"].shape == (4,)
        assert out["psnr_per_iter"].shape == (5, 4)
        from pnp_svrg_tpu.algorithms import pnp_gd

        solo = pnp_gd(probs[2], den, eta=100.0, n_iters=4)
        np.testing.assert_allclose(
            float(out["final_psnr"][2]), float(solo["final_psnr"]), atol=1e-3
        )

    def test_batched_stochastic_algorithms_run(self, key):
        probs = [
            make_csmri(jax.random.PRNGKey(i), _img(16), sample_prob=0.5, snr=10)
            for i in range(3)
        ]
        den = TVDenoiser(sigma_modifier=0.7)
        for algo, hp in [
            ("sgd", dict(n_iters=3, mini_batch_size=20)),
            ("svrg", dict(n_outer=2, t2=2, mini_batch_size=20)),
            ("saga", dict(n_iters=3, mini_batch_size=20, hist_size=4)),
            ("sarah", dict(n_outer=2, t2=2, mini_batch_size=20)),
        ]:
            out = run_batch(algo, probs, den, eta=50.0, **hp)
            assert out["final_psnr"].shape == (3,), algo
            assert np.isfinite(np.asarray(out["final_psnr"])).all(), algo

    def test_batched_bm3d_denoiser(self, key):
        from pnp_svrg_tpu.denoisers import BM3DDenoiser
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams

        probs = [
            make_csmri(jax.random.PRNGKey(i), _img(32), sample_prob=0.5, snr=10)
            for i in range(2)
        ]
        den = BM3DDenoiser(sigma_modifier=1.0, params=BM3DParams(search=4))
        out = run_batch("gd", probs, den, eta=200.0, n_iters=3)
        assert np.isfinite(np.asarray(out["final_psnr"])).all()

    def test_run_batch_on_mesh(self, key):
        mesh = make_mesh((8, 1))
        probs = [
            make_csmri(jax.random.PRNGKey(i), _img(16), sample_prob=0.5, snr=10)
            for i in range(8)
        ]
        den = TVDenoiser(sigma_modifier=0.7)
        out = run_batch("gd", probs, den, mesh=mesh, eta=100.0, n_iters=3)
        assert out["final_psnr"].shape == (8,)
        assert np.isfinite(np.asarray(out["final_psnr"])).all()

    @pytest.mark.parametrize("algo,extra", [
        ("svrg", {"n_outer": 2, "t2": 2}),
        ("saga", {"n_iters": 4, "hist_size": 4}),
        ("sarah", {"n_outer": 2, "t2": 2}),
    ])
    def test_variance_reduced_on_mesh_matches_unsharded(self, key, algo, extra):
        # The SVRG snapshot and the SAGA (hist, B, N) history table shard
        # over the mesh batch axis (SURVEY.md §2.10); results must equal the
        # single-device batched run exactly.
        mesh = make_mesh((8, 1))
        probs = [
            make_csmri(jax.random.PRNGKey(i), _img(16), sample_prob=0.5, snr=10)
            for i in range(8)
        ]
        den = TVDenoiser(sigma_modifier=0.7)
        kw = dict(eta=100.0, mini_batch_size=32, key=jax.random.PRNGKey(9), **extra)
        sharded = run_batch(algo, probs, den, mesh=mesh, **kw)
        local = run_batch(algo, probs, den, **kw)
        np.testing.assert_allclose(
            np.asarray(sharded["final_psnr"]),
            np.asarray(local["final_psnr"]),
            atol=1e-4,
        )


class TestInitDistributed:
    def test_noop_without_env(self, monkeypatch):
        # With no coordinator/env configured this must be a silent no-op.
        from pnp_svrg_tpu.parallel import init_distributed

        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        init_distributed()


class TestSpatialSharding:
    """Row-sharded denoising with halo exchange (parallel/spatial.py)."""

    def _mesh(self, n):
        from pnp_svrg_tpu.parallel import make_mesh

        return make_mesh((n, 1), devices=jax.devices()[:n])

    def test_nlm_spatial_matches_single_device(self, rng):
        from pnp_svrg_tpu.denoisers.nlm import nlm_denoise
        from pnp_svrg_tpu.parallel import nlm_denoise_spatial

        img = jnp.asarray(rng.uniform(0, 1, (128, 64)), jnp.float32)
        ref = nlm_denoise(img, 0.1, 0.1)
        out = nlm_denoise_spatial(img, 0.1, 0.1, self._mesh(4))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_bm3d_spatial_matches_single_device(self, rng):
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise
        from pnp_svrg_tpu.parallel import bm3d_denoise_spatial

        p = BM3DParams(search=4)
        img = jnp.asarray(rng.uniform(0, 1, (128, 64)), jnp.float32)
        ref = np.asarray(bm3d_denoise(img, 0.08, params=p))
        out = np.asarray(bm3d_denoise_spatial(img, 0.08, self._mesh(2), params=p))
        np.testing.assert_allclose(out, ref, atol=2e-6)

    def test_halo_too_large_raises(self, rng):
        from pnp_svrg_tpu.parallel import denoise_spatial

        img = jnp.asarray(rng.uniform(0, 1, (32, 64)), jnp.float32)
        with pytest.raises(ValueError, match="too small"):
            denoise_spatial(lambda x: x, img, self._mesh(8), halo=16)


class TestSpatialRunner:
    """The halo path reachable from the public API:
    ``run_batch(..., image_shards=k)`` (parallel/spatial.run_batch_spatial)."""

    def _batched(self, h=32, bsz=4):
        imgs = [
            jnp.asarray(
                np.random.default_rng(i).uniform(size=(h, h)), jnp.float32
            )
            for i in range(bsz)
        ]
        keys = jax.random.split(jax.random.PRNGKey(0), bsz)
        from pnp_svrg_tpu.core.batched import stack_problems

        return stack_problems(
            [make_csmri(k, im, sample_prob=0.5, snr=10) for k, im in zip(keys, imgs)]
        )

    def test_nlm_image_shards_matches_unsharded(self):
        """NLM halo semantics are exact, so the row-sharded loop must
        reproduce the unsharded trajectory."""
        from pnp_svrg_tpu.denoisers import NLMDenoiser

        den = NLMDenoiser(sigma_modifier=1.0)
        batched = self._batched()
        hp = dict(eta=100.0, n_outer=2, t2=2, mini_batch_size=64)
        plain = run_batch("svrg", batched, den, key=jax.random.PRNGKey(3), **hp)
        shard = run_batch(
            "svrg", batched, den, key=jax.random.PRNGKey(3), image_shards=2, **hp
        )
        np.testing.assert_allclose(
            np.asarray(shard["psnr_per_iter"]),
            np.asarray(plain["psnr_per_iter"]),
            atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(shard["z"]), np.asarray(plain["z"]), atol=1e-4
        )

    def test_bm3d_image_shards_close_to_unsharded(self):
        """BM3D reference grids re-anchor per shard (aggregation-weight
        differences only); quality must match within tolerance."""
        from pnp_svrg_tpu.denoisers import BM3DDenoiser
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams

        den = BM3DDenoiser(sigma_modifier=1.0, params=BM3DParams(search=4, block=4))
        batched = self._batched()
        hp = dict(eta=100.0, n_outer=2, t2=2, mini_batch_size=64)
        plain = run_batch("svrg", batched, den, key=jax.random.PRNGKey(3), **hp)
        shard = run_batch(
            "svrg", batched, den, key=jax.random.PRNGKey(3), image_shards=2, **hp
        )
        pf_plain = np.asarray(plain["final_psnr"])
        pf_shard = np.asarray(shard["final_psnr"])
        assert np.isfinite(pf_shard).all()
        np.testing.assert_allclose(pf_shard, pf_plain, atol=0.5)

    def test_unsupported_denoiser_raises(self):
        batched = self._batched()
        with pytest.raises(TypeError, match="no bounded"):
            run_batch(
                "gd", batched, TVDenoiser(sigma_modifier=1.0),
                image_shards=2, eta=10.0, n_iters=1,
            )
