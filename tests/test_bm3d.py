"""BM3D tests: transform orthogonality, block-matching correctness on a
constructed case, and end-to-end denoising quality vs. the simpler denoisers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.denoisers.bm3d import (
    BM3DDenoiser,
    BM3DParams,
    bm3d_denoise,
    bm3d_denoise_batch,
    _box_sum_batch,
    _match_distances,
    _ref_grid,
)
from pnp_svrg_tpu.ops.transforms import dct_matrix, hadamard_matrix, haar_matrix


class TestTransforms:
    @pytest.mark.parametrize("n", [4, 8, 16])
    def test_dct_orthonormal(self, n):
        d = dct_matrix(n)
        np.testing.assert_allclose(d @ d.T, np.eye(n), atol=1e-5)

    @pytest.mark.parametrize("n", [2, 8, 16, 32])
    def test_hadamard_orthonormal(self, n):
        h = hadamard_matrix(n)
        np.testing.assert_allclose(h @ h.T, np.eye(n), atol=1e-6)

    @pytest.mark.parametrize("n", [2, 8, 16])
    def test_haar_orthonormal(self, n):
        h = haar_matrix(n)
        np.testing.assert_allclose(h @ h.T, np.eye(n), atol=1e-6)

    def test_hadamard_power_of_two_only(self):
        with pytest.raises(ValueError):
            hadamard_matrix(12)


class TestMatching:
    def test_box_sum_matches_naive(self, rng):
        v = jnp.asarray(rng.standard_normal((12, 10)), jnp.float32)
        out = _box_sum_batch(v[None], 4)[0]
        naive = np.zeros((9, 7), np.float32)
        vn = np.asarray(v)
        for i in range(9):
            for j in range(7):
                naive[i, j] = vn[i : i + 4, j : j + 4].sum()
        np.testing.assert_allclose(out, naive, atol=1e-4)

    def test_ref_grid_covers_last_block(self):
        g = _ref_grid(128, 8, 4)
        assert g[0] == 0 and g[-1] == 120
        g = _ref_grid(30, 8, 4)
        assert g[-1] == 22  # non-divisible size still covers the edge

    def test_self_distance_zero_and_duplicate_found(self, rng):
        # An image with an exact duplicate patch: distance at the duplicating
        # offset must be ~0.
        img = np.asarray(rng.uniform(0, 1, (32, 32)), np.float32)
        img[16:24, 16:24] = img[0:8, 0:8]  # duplicate patch at offset (16,16)
        rows = np.array([0], np.int32)
        cols = np.array([0], np.int32)
        offsets = np.array([[0, 0], [16, 16], [4, 4]], np.int32)
        d = _match_distances(jnp.asarray(img)[None], rows, cols, offsets, 8)
        d = np.asarray(d)[0, 0, 0, :]  # (B, nR, nC, S) — offset axis last
        assert d[0] < 1e-5  # self
        assert d[1] < 1e-5  # duplicate
        assert d[2] > 1e-3  # generic offset

    def test_out_of_bounds_offsets_are_inf(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (16, 16)), jnp.float32)
        rows = np.array([0], np.int32)
        cols = np.array([0], np.int32)
        offsets = np.array([[-1, 0], [0, -1], [9, 0]], np.int32)
        d = np.asarray(_match_distances(img[None], rows, cols, offsets, 8))[0, 0, 0, :]
        assert np.isinf(d[0]) and np.isinf(d[1]) and np.isinf(d[2])


def _clean(h=64):
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    return jnp.asarray(np.sin(6 * xx) * np.cos(5 * yy) * 0.3 + 0.5, jnp.float32)


SMALL = BM3DParams(search=6, step=4)


class TestDenoise:
    def test_reduces_noise_strongly(self, rng):
        clean = _clean()
        noisy = clean + 0.1 * jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
        out = bm3d_denoise(noisy, 0.1, params=SMALL)
        mse_before = float(jnp.mean((noisy - clean) ** 2))
        mse_after = float(jnp.mean((out - clean) ** 2))
        assert mse_after < 0.25 * mse_before

    def test_two_stages_beat_one(self, rng):
        clean = _clean()
        noisy = clean + 0.1 * jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
        s1 = bm3d_denoise(noisy, 0.1, params=SMALL, stages=1)
        s2 = bm3d_denoise(noisy, 0.1, params=SMALL, stages=2)
        m1 = float(jnp.mean((s1 - clean) ** 2))
        m2 = float(jnp.mean((s2 - clean) ** 2))
        assert m2 <= m1 * 1.05  # Wiener stage shouldn't hurt

    def test_beats_wavelet_on_texture(self, rng):
        # BM3D's self-similarity exploitation should beat BayesShrink on a
        # repetitive texture.
        from pnp_svrg_tpu.ops.wavelet import denoise_wavelet_bayes

        h = 64
        xx, yy = np.meshgrid(np.arange(h), np.arange(h))
        clean = jnp.asarray(0.5 + 0.3 * np.sin(2 * np.pi * xx / 8), jnp.float32)
        noisy = clean + 0.12 * jnp.asarray(rng.standard_normal((h, h)), jnp.float32)
        out_bm3d = bm3d_denoise(noisy, 0.12, params=SMALL)
        out_wav = denoise_wavelet_bayes(noisy, 0.12)
        m_bm3d = float(jnp.mean((out_bm3d - clean) ** 2))
        m_wav = float(jnp.mean((out_wav - clean) ** 2))
        assert m_bm3d < m_wav

    def test_wrapper_contract(self, rng):
        clean = _clean()
        noisy = clean + 0.08 * jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
        den = BM3DDenoiser(sigma_modifier=1.0, params=SMALL)
        out = den.denoise(noisy, 0.08, 1)
        assert float(jnp.mean((out - clean) ** 2)) < float(
            jnp.mean((noisy - clean) ** 2)
        )

    def test_native_batch_matches_single(self, rng):
        clean = _clean(32)
        noisy = jnp.stack(
            [
                clean + 0.1 * jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
                for _ in range(2)
            ]
        )
        out = bm3d_denoise_batch(noisy, 0.1, params=SMALL)
        assert out.shape == (2, 32, 32)
        single = bm3d_denoise(noisy[0], 0.1, params=SMALL)
        np.testing.assert_allclose(out[0], single, atol=1e-5)

    def test_per_image_sigma(self, rng):
        clean = _clean(32)
        noisy = jnp.stack([clean + 0.1 * jnp.asarray(
            rng.standard_normal((32, 32)), jnp.float32) for _ in range(2)])
        out = bm3d_denoise_batch(noisy, jnp.asarray([0.1, 0.0001]), params=SMALL)
        # Tiny sigma on image 1 -> near-identity; real sigma on image 0 smooths.
        d0 = float(jnp.mean((out[0] - noisy[0]) ** 2))
        d1 = float(jnp.mean((out[1] - noisy[1]) ** 2))
        assert d1 < d0


class TestMatchingCostKnobs:
    """Selection-only precision options (BM3DParams.match_dtype / .topk):
    the filtering math is always f32, so outputs must stay equivalent."""

    def _noisy(self, rng, h=48, w=48, sigma=0.1):
        xx, yy = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
        clean = (np.sin(6 * xx) * np.cos(5 * yy) * 0.4 + 0.5).astype(np.float32)
        return clean, clean + sigma * rng.standard_normal((h, w)).astype(np.float32)

    def test_approx_topk_matches_exact_on_cpu(self, rng):
        """approx_min_k lowers to exact selection on CPU, so the output must
        be identical up to distance near-ties (tight tolerance)."""
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise

        clean, noisy = self._noisy(rng)
        ref = np.asarray(bm3d_denoise(jnp.asarray(noisy), 0.1,
                                      params=BM3DParams(search=6)))
        got = np.asarray(bm3d_denoise(jnp.asarray(noisy), 0.1,
                                      params=BM3DParams(search=6, topk="approx")))
        np.testing.assert_allclose(got, ref, atol=1e-3)

    @pytest.mark.parametrize("stride", [4, 8])
    def test_grid_aligned_dense_aggregation_matches_scatter(self, rng, stride):
        """search_step aligned to the reference-grid step routes aggregation
        through the scatter-free dense path (_aggregate_dense); it must match
        the scatter path bit-for-bit up to fp reassociation. Passing
        row_valid_bounds=(0, h) is semantically a no-op (all rows valid) but
        disables the dense path, giving the scatter reference on identical
        strided offsets."""
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise_batch

        clean, noisy = self._noisy(rng)
        x = jnp.stack([jnp.asarray(noisy), jnp.asarray(noisy).T])
        p = BM3DParams(search=8, search_step=stride)
        dense = np.asarray(bm3d_denoise_batch(x, 0.1, params=p))
        scatter = np.asarray(
            bm3d_denoise_batch(x, 0.1, params=p, row_valid_bounds=(0, x.shape[1]))
        )
        np.testing.assert_allclose(dense, scatter, atol=2e-5)
        # and it still clearly denoises
        mse_noisy = float(np.mean((noisy - clean) ** 2))
        mse_got = float(np.mean((dense[0] - clean) ** 2))
        assert mse_got < 0.5 * mse_noisy

    def test_pallas_matcher_selects_same_groups(self, rng):
        """The fused Pallas matcher (interpret mode on CPU) must select the
        identical candidate SET as the XLA matcher for every reference block
        (order may flip at fp near-ties) and the end-to-end denoise must
        match closely."""
        from pnp_svrg_tpu.denoisers.bm3d import (
            BM3DParams, bm3d_denoise_batch, _match_distances, _top_k_offsets,
            _ref_grid,
        )
        from pnp_svrg_tpu.ops.pallas.bm3d_match import bm3d_match_pallas

        clean, noisy = self._noisy(rng)
        x = jnp.stack([jnp.asarray(noisy), jnp.asarray(noisy).T])
        h = w = x.shape[1]
        block, k, r = 8, 16, 6
        rows = _ref_grid(h, block, 4)
        cols = _ref_grid(w, block, 4)
        offsets = np.asarray(
            [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)],
            np.int32,
        )
        ti_xla = np.asarray(
            _top_k_offsets(_match_distances(x, rows, cols, offsets, block), k)
        )
        ti_pal = np.asarray(bm3d_match_pallas(
            x, tuple(rows.tolist()), tuple(cols.tolist()),
            tuple(map(tuple, offsets.tolist())), block, k, interpret=True,
        ))
        set_agree = np.mean([
            len(set(a).intersection(b)) / k
            for a, b in zip(ti_xla.reshape(-1, k), ti_pal.reshape(-1, k))
        ])
        assert set_agree > 0.999, set_agree

        ref = np.asarray(bm3d_denoise_batch(
            x, 0.1, params=BM3DParams(search=r)
        ))
        got = np.asarray(bm3d_denoise_batch(
            x, 0.1, params=BM3DParams(search=r, matcher="pallas_interpret")
        ))
        assert float(np.abs(got - ref).mean()) < 1e-3
        mse_ref = float(np.mean((ref[0] - clean) ** 2))
        mse_got = float(np.mean((got[0] - clean) ** 2))
        assert mse_got < mse_ref * 1.05

    def test_misaligned_stride_falls_back_to_scatter(self, rng):
        """search_step not a multiple of the reference-grid step cannot use
        the dense lattice aggregation — the kernel must fall back to the
        scatter path and still denoise."""
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise

        clean, noisy = self._noisy(rng)
        out = np.asarray(bm3d_denoise(
            jnp.asarray(noisy), 0.1, params=BM3DParams(search=6, search_step=3)
        ))
        mse_noisy = float(np.mean((noisy - clean) ** 2))
        assert float(np.mean((out - clean) ** 2)) < 0.5 * mse_noisy

    def test_matcher_auto_is_xla_on_cpu(self, rng):
        """matcher="auto" must route to the XLA matcher on CPU backends
        (identical output to the explicit xla path)."""
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise

        _, noisy = self._noisy(rng)
        ref = np.asarray(bm3d_denoise(jnp.asarray(noisy), 0.1,
                                      params=BM3DParams(search=6)))
        got = np.asarray(bm3d_denoise(
            jnp.asarray(noisy), 0.1,
            params=BM3DParams(search=6, matcher="auto"),
        ))
        np.testing.assert_array_equal(got, ref)

    def test_pallas_scatter_matches_xla_scatter(self, rng):
        """The VMEM-resident row-RMW scatter kernel (interpret mode) must
        bit-match XLA's .at[].add for arbitrary collision patterns,
        including the padded-chunk tail."""
        from pnp_svrg_tpu.ops.pallas.bm3d_scatter import bm3d_scatter_pallas

        b, p, w, t = 2, 300, 128, 200
        idx = jnp.asarray(rng.integers(0, t, (b, p)), np.int32)
        upd = jnp.asarray(rng.standard_normal((b, p, w)), jnp.float32)
        flat_idx = (idx + (jnp.arange(b) * t)[:, None]).reshape(-1)
        ref = jnp.zeros((b * t, w), jnp.float32).at[flat_idx].add(
            upd.reshape(-1, w)
        ).reshape(b, t, w)
        got = bm3d_scatter_pallas(idx, upd, t, chunk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_bounded_rows_disable_dense_aggregation(self, rng):
        """row_valid_bounds (the spatial-sharding path) must route
        grid-aligned strides through the scatter path with bound-restricted
        matching — output stays finite and denoises inside the bounds."""
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise_batch

        clean, noisy = self._noisy(rng)
        x = jnp.asarray(noisy)[None]
        out = np.asarray(bm3d_denoise_batch(
            x, 0.1, params=BM3DParams(search=8, search_step=4),
            row_valid_bounds=(8, x.shape[1] - 8),
        ))
        assert np.isfinite(out[:, 8:-8]).all()
        mse_noisy = float(np.mean((noisy[8:-8] - clean[8:-8]) ** 2))
        mse_got = float(np.mean((out[0, 8:-8] - clean[8:-8]) ** 2))
        assert mse_got < 0.6 * mse_noisy

    def test_search_step_offsets_include_zero(self):
        """The strided offset set must contain the self-match (0, 0) even
        when search is not a multiple of search_step."""
        import numpy as _np

        for r, ss in [(8, 4), (7, 4), (8, 3), (5, 2)]:
            d1 = (ss * _np.arange(-(r // ss), r // ss + 1))
            assert 0 in d1.tolist()
            assert all(abs(v) <= r for v in d1)

    def test_bf16_matching_quality_preserved(self, rng):
        """bf16 distances may flip near-ties; the denoised output must stay
        close and the denoising quality (MSE vs clean) equivalent."""
        from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise

        clean, noisy = self._noisy(rng)
        ref = np.asarray(bm3d_denoise(jnp.asarray(noisy), 0.1,
                                      params=BM3DParams(search=6)))
        got = np.asarray(bm3d_denoise(
            jnp.asarray(noisy), 0.1,
            params=BM3DParams(search=6, match_dtype="bfloat16"),
        ))
        mse_ref = float(np.mean((ref - clean) ** 2))
        mse_got = float(np.mean((got - clean) ** 2))
        mse_noisy = float(np.mean((noisy - clean) ** 2))
        assert mse_got < 0.5 * mse_noisy  # still clearly denoises
        assert mse_got < mse_ref * 1.05  # quality within 5% of exact
        assert float(np.abs(got - ref).mean()) < 5e-3
