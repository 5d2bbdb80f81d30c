"""Golden-parity tests: the native kernels vs independent direct-definition
oracles of the libraries they replace.

The reference defines denoiser behavior through ``bm3d.bm3d`` (reference
``denoisers/BM3D.py:23``), skimage ``denoise_nl_means`` (``NLM.py:25``),
``denoise_wavelet`` BayesShrink (``TV.py:24``) and ``estimate_sigma``
(``pnp_gd.py:49``), all backed by C/Cython. None of those packages exist on
this platform, so true library-output fixtures cannot be generated here;
instead each claim is pinned against an *independently written* NumPy oracle
— scalar loops implementing the documented algorithm definition directly
(symmetric-extension convolution for PyWavelets, per-pixel patch loops for
NLM, per-reference-block group loops for BM3D) — plus analytic invariants
(Daubechies vanishing moments, DC gain) that hold for the genuine library
conventions. Any drift in the XLA formulations (banded matmuls, shift-space
accumulation, strided convs) breaks these tests even though both sides are
in this repo, because the oracle shares no code or vectorization strategy
with the kernels.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise
from pnp_svrg_tpu.denoisers.nlm import nlm_denoise
from pnp_svrg_tpu.ops.sigma import estimate_sigma
from pnp_svrg_tpu.ops.wavelet import (
    _DB_LO,
    denoise_wavelet_bayes,
    dwt1,
    dwt2,
    dwt_max_level,
)

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# Oracle: PyWavelets-convention DWT via direct convolution loops
# ---------------------------------------------------------------------------


def _filters_np(wavelet):
    lo = np.asarray(_DB_LO[wavelet], np.float64)
    L = len(lo)
    hi = np.asarray([(-1.0) ** (i + 1) * lo[L - 1 - i] for i in range(L)])
    return lo, hi


def dwt1_oracle(x, wavelet):
    """pywt ``dwt(mode='symmetric')``: half-point symmetric extension by
    L-1, full convolution with the decomposition filter, downsample keeping
    every second sample starting at index L-1 of the full convolution —
    written as explicit scalar loops."""
    lo, hi = _filters_np(wavelet)
    L = len(lo)
    n = len(x)
    ext = np.concatenate([x[:L - 1][::-1], x, x[-(L - 1):][::-1]])
    full_len = len(ext) + L - 1
    conv_lo = np.zeros(full_len)
    conv_hi = np.zeros(full_len)
    for m in range(full_len):
        for j in range(L):
            if 0 <= m - j < len(ext):
                conv_lo[m] += lo[j] * ext[m - j]
                conv_hi[m] += hi[j] * ext[m - j]
    out_len = (n + L - 1) // 2
    ca = conv_lo[L - 1 + 1 : L - 1 + 1 + 2 * out_len : 2]
    cd = conv_hi[L - 1 + 1 : L - 1 + 1 + 2 * out_len : 2]
    return ca[:out_len], cd[:out_len]


def dwt2_oracle(img, wavelet):
    """Separable 2-D single-level DWT (pywt ``dwt2`` band order)."""

    def along_rows(a):  # transform axis 0
        cols = [dwt1_oracle(a[:, j], wavelet) for j in range(a.shape[1])]
        lo = np.stack([c[0] for c in cols], axis=1)
        hi = np.stack([c[1] for c in cols], axis=1)
        return lo, hi

    def along_cols(a):  # transform axis 1
        rows = [dwt1_oracle(a[i, :], wavelet) for i in range(a.shape[0])]
        lo = np.stack([r[0] for r in rows], axis=0)
        hi = np.stack([r[1] for r in rows], axis=0)
        return lo, hi

    lo_c, hi_c = along_cols(img)
    ll, lh = along_rows(lo_c)  # lh: highpass along axis 0 of lowpass cols
    hl, hh = along_rows(hi_c)
    # pywt: cH = ('da') detail along axis 0, approx along axis 1, etc.
    return ll, (lh, hl, hh)


@pytest.mark.parametrize("wavelet", ["db1", "db2", "db4"])
@pytest.mark.parametrize("n", [16, 17, 31])
def test_dwt1_matches_direct_convolution_oracle(wavelet, n):
    x = RNG.standard_normal(n)
    ca_o, cd_o = dwt1_oracle(x, wavelet)
    ca, cd = dwt1(jnp.asarray(x, jnp.float32), wavelet)
    np.testing.assert_allclose(np.asarray(ca), ca_o, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cd), cd_o, atol=2e-5)


@pytest.mark.parametrize("wavelet", ["db1", "db2"])
def test_dwt2_matches_oracle(wavelet):
    img = RNG.standard_normal((18, 13))
    ll_o, (lh_o, hl_o, hh_o) = dwt2_oracle(img, wavelet)
    ll, (lh, hl, hh) = dwt2(jnp.asarray(img, jnp.float32), wavelet)
    np.testing.assert_allclose(np.asarray(ll), ll_o, atol=3e-5)
    np.testing.assert_allclose(np.asarray(lh), lh_o, atol=3e-5)
    np.testing.assert_allclose(np.asarray(hl), hl_o, atol=3e-5)
    np.testing.assert_allclose(np.asarray(hh), hh_o, atol=3e-5)


def test_daubechies_analytic_invariants():
    """Library-convention anchors that need no oracle: DC gain sqrt(2) on the
    lowpass, vanishing moments on the highpass (db2 annihilates linears,
    db4 annihilates cubics) away from boundaries."""
    n = 32
    const = jnp.full((n,), 3.25, jnp.float32)
    ca, cd = dwt1(const, "db2")
    np.testing.assert_allclose(np.asarray(ca), 3.25 * math.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-5)

    ramp = jnp.asarray(np.linspace(0.0, 1.0, n), jnp.float32)
    _, cd2 = dwt1(ramp, "db2")
    # interior coefficients vanish (2 vanishing moments); boundary coeffs
    # feel the symmetric extension
    np.testing.assert_allclose(np.asarray(cd2)[1:-1], 0.0, atol=1e-5)

    cubic = jnp.asarray((np.linspace(-1, 1, n) ** 3), jnp.float32)
    _, cd4 = dwt1(cubic, "db4")
    np.testing.assert_allclose(np.asarray(cd4)[3:-3], 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Oracle: skimage estimate_sigma
# ---------------------------------------------------------------------------


def estimate_sigma_oracle(img):
    """skimage ``estimate_sigma``: level-1 db2 diagonal detail, drop exact
    zeros, median(|HH|) / Phi^-1(0.75)."""
    _, (_, _, hh) = dwt2_oracle(np.asarray(img, np.float64), "db2")
    d = np.abs(hh.ravel())
    d = d[d > 0]
    if d.size == 0:
        return 0.0
    return float(np.median(d) / 0.6744897501960817)


def test_estimate_sigma_matches_oracle():
    img = RNG.uniform(size=(24, 24)) + 0.1 * RNG.standard_normal((24, 24))
    got = float(estimate_sigma(jnp.asarray(img, jnp.float32)))
    want = estimate_sigma_oracle(img)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_estimate_sigma_recovers_known_noise():
    clean = np.zeros((128, 128))
    for s in (0.05, 0.1, 0.2):
        noisy = clean + s * RNG.standard_normal(clean.shape)
        got = float(estimate_sigma(jnp.asarray(noisy, jnp.float32)))
        assert abs(got - s) / s < 0.12, (got, s)


def test_estimate_sigma_constant_image_is_zero():
    # f32 db2 filter taps don't cancel to exactly 0, so "exact zeros dropped"
    # leaves O(eps) residuals; the estimate must still be numerically zero.
    assert float(estimate_sigma(jnp.full((16, 16), 0.7))) < 1e-6


# ---------------------------------------------------------------------------
# Oracle: skimage denoise_wavelet (BayesShrink, soft)
# ---------------------------------------------------------------------------


def idwt1_oracle(ca, cd, wavelet, out_len):
    """pywt ``idwt``: zero-upsample, full convolution with reconstruction
    filters (time-reversed decomposition filters), crop L-2 from the head."""
    lo, hi = _filters_np(wavelet)
    rec_lo, rec_hi = lo[::-1], hi[::-1]
    L = len(lo)
    m = len(ca)
    up_a = np.zeros(2 * m)
    up_d = np.zeros(2 * m)
    up_a[::2] = ca
    up_d[::2] = cd
    full_len = 2 * m + L - 1
    y = np.zeros(full_len)
    for mm in range(full_len):
        for j in range(L):
            if 0 <= mm - j < 2 * m:
                y[mm] += rec_lo[j] * up_a[mm - j] + rec_hi[j] * up_d[mm - j]
    return y[L - 2 : L - 2 + out_len]


def idwt2_oracle(ca, details, wavelet, out_shape):
    lh, hl, hh = details

    def inv_rows(lo, hi, out_len):  # inverse along axis 0
        return np.stack(
            [idwt1_oracle(lo[:, j], hi[:, j], wavelet, out_len) for j in range(lo.shape[1])],
            axis=1,
        )

    def inv_cols(lo, hi, out_len):  # inverse along axis 1
        return np.stack(
            [idwt1_oracle(lo[i, :], hi[i, :], wavelet, out_len) for i in range(lo.shape[0])],
            axis=0,
        )

    lo_c = inv_rows(ca, lh, out_shape[0])
    hi_c = inv_rows(hl, hh, out_shape[0])
    return inv_cols(lo_c, hi_c, out_shape[1])


def bayes_denoise_oracle(img, sigma, wavelet="db1", levels=None):
    """skimage ``denoise_wavelet(method='BayesShrink', mode='soft')``:
    per-band threshold sigma^2 / sqrt(max(E[d^2] - sigma^2, eps))."""
    if levels is None:
        levels = max(dwt_max_level(min(img.shape), wavelet) - 3, 1)
    # decompose
    stack, ca = [], np.asarray(img, np.float64)
    shapes = []
    for _ in range(levels):
        shapes.append(ca.shape)
        ca, det = dwt2_oracle(ca, wavelet)
        stack.append(det)
    var = float(sigma) ** 2
    eps = np.finfo(np.float32).eps

    def soft(d):
        dvar = np.mean(d * d)
        t = var / math.sqrt(max(dvar - var, eps))
        return np.sign(d) * np.maximum(np.abs(d) - t, 0.0)

    out = ca
    for det, shape in zip(stack[::-1], shapes[::-1]):
        out = idwt2_oracle(out, tuple(soft(d) for d in det), wavelet, shape)
    return out


@pytest.mark.parametrize("wavelet", ["db1", "db2"])
def test_bayes_wavelet_denoise_matches_oracle(wavelet):
    img = np.clip(
        0.5 + 0.3 * np.sin(np.linspace(0, 6, 32))[:, None]
        + 0.1 * RNG.standard_normal((32, 32)),
        0,
        1,
    )
    sigma = 0.1
    got = np.asarray(
        denoise_wavelet_bayes(jnp.asarray(img, jnp.float32), sigma, wavelet=wavelet)
    )
    want = bayes_denoise_oracle(img, sigma, wavelet=wavelet)
    np.testing.assert_allclose(got, want, atol=5e-5)


# ---------------------------------------------------------------------------
# Oracle: skimage denoise_nl_means (slow mode, uniform patch weights)
# ---------------------------------------------------------------------------


def nlm_oracle(img, h, sigma, p=4, d=5):
    H, W = img.shape
    pr = p // 2
    xp = np.pad(img, pr, mode="reflect")
    area = p * p
    out = np.zeros_like(img)
    for i in range(H):
        for j in range(W):
            wsum = 0.0
            acc = 0.0
            for qi in range(i - d, i + d + 1):
                for qj in range(j - d, j + d + 1):
                    if not (0 <= qi < H and 0 <= qj < W):
                        continue
                    p1 = xp[i : i + p, j : j + p]
                    p2 = xp[qi : qi + p, qj : qj + p]
                    dist = float(np.sum((p1 - p2) ** 2))
                    w = math.exp(
                        -max(dist - 2.0 * sigma * sigma * area, 0.0)
                        / (h * h * area)
                    )
                    wsum += w
                    acc += w * img[qi, qj]
            out[i, j] = acc / wsum
    return out


def test_nlm_matches_per_pixel_oracle():
    img = np.clip(
        0.5
        + 0.25 * np.sin(np.arange(16) / 2)[:, None]
        + 0.1 * RNG.standard_normal((16, 16)),
        0,
        1,
    )
    h, sigma = 0.12, 0.1
    got = np.asarray(nlm_denoise(jnp.asarray(img, jnp.float32), h, sigma))
    want = nlm_oracle(img, h, sigma)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Oracle: BM3D (Dabov et al. two-stage), direct per-reference-block loops
# ---------------------------------------------------------------------------


def _dct_mat_np(n):
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    dmat = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    dmat[0, :] /= math.sqrt(n)
    dmat[1:, :] *= math.sqrt(2.0 / n)
    return dmat


def _hadamard_np(n):
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h / math.sqrt(n)


def _ref_grid_np(size, block, step):
    pts = list(range(0, size - block + 1, step))
    if pts[-1] != size - block:
        pts.append(size - block)
    return pts


def bm3d_oracle(img, sigma, prm: BM3DParams, stages=2):
    img = np.asarray(img, np.float32)
    h, w = img.shape
    b = prm.block
    bb = b * b
    rows = _ref_grid_np(h, b, prm.step)
    cols = _ref_grid_np(w, b, prm.step)
    offsets = [
        (dy, dx)
        for dy in range(-prm.search, prm.search + 1)
        for dx in range(-prm.search, prm.search + 1)
    ]
    d1 = _dct_mat_np(b)
    kaiser = np.outer(np.kaiser(b, prm.kaiser_beta), np.kaiser(b, prm.kaiser_beta))

    def patch(src, i, j):
        return src[i : i + b, j : j + b].astype(np.float32)

    def top_k(dists, k):
        dists = list(dists)
        out = []
        for _ in range(k):
            m = int(np.argmin(dists))
            out.append(m)
            dists[m] = np.inf
        return out

    def match(src, i, j, k):
        dists = []
        for dy, dx in offsets:
            qi, qj = i + dy, j + dx
            if 0 <= qi <= h - b and 0 <= qj <= w - b:
                dists.append(float(np.sum((patch(src, i, j) - patch(src, qi, qj)) ** 2)))
            else:
                dists.append(np.inf)
        sel = top_k(dists, k)
        return [(i + offsets[s][0], j + offsets[s][1]) for s in sel]

    def transform(group, hk):  # group: (K, b, b)
        c2 = np.einsum("ab,kbc,dc->kad", d1, group, d1)  # 2-D DCT per patch
        return np.einsum("gk,kad->gad", hk, c2)

    def itransform(coef, hk):
        g = np.einsum("kg,gad->kad", hk, coef)  # H is symmetric: H^-1 = H
        return np.einsum("ab,kad,dc->kbc", d1, g, d1)  # X = D^T C D

    def run_stage(match_src, filt, k_group):
        hk = _hadamard_np(k_group)
        num = np.zeros((h, w))
        den = np.zeros((h, w))
        for i in rows:
            for j in cols:
                locs = match(match_src, i, j, k_group)
                est_patches, wgt = filt(locs, hk)
                for (qi, qj), ep in zip(locs, est_patches):
                    num[qi : qi + b, qj : qj + b] += wgt * kaiser * ep
                    den[qi : qi + b, qj : qj + b] += wgt * kaiser
        return num / np.maximum(den, 1e-12)

    def ht_filter(locs, hk):
        group = np.stack([patch(img, qi, qj) for qi, qj in locs])
        coef = transform(group, hk)
        keep = np.abs(coef) > prm.lam * sigma
        n_kept = max(int(keep.sum()), 1)
        est = itransform(np.where(keep, coef, 0.0), hk)
        return est, 1.0 / (sigma * sigma * n_kept + 1e-12)

    basic = run_stage(img, ht_filter, prm.group_ht)
    if stages == 1:
        return basic

    def wiener_filter(locs, hk):
        g_basic = np.stack([patch(basic.astype(np.float32), qi, qj) for qi, qj in locs])
        g_noisy = np.stack([patch(img, qi, qj) for qi, qj in locs])
        cb = transform(g_basic, hk)
        cn = transform(g_noisy, hk)
        wien = cb**2 / (cb**2 + sigma * sigma + 1e-12)
        est = itransform(wien * cn, hk)
        return est, 1.0 / (sigma * sigma * float(np.sum(wien**2)) + 1e-12)

    return run_stage(basic.astype(np.float32), wiener_filter, prm.group_wie)


@pytest.mark.parametrize("stages", [1, 2])
def test_bm3d_matches_direct_loop_oracle(stages):
    prm = BM3DParams(block=4, step=2, search=3, group_ht=4, group_wie=4)
    img = np.clip(
        0.5
        + 0.3 * np.sin(np.arange(16) / 3)[:, None] * np.cos(np.arange(16) / 2)
        + 0.08 * RNG.standard_normal((16, 16)),
        0,
        1,
    ).astype(np.float32)
    sigma = 0.08
    got = np.asarray(
        bm3d_denoise(jnp.asarray(img), sigma, params=prm, stages=stages)
    )
    want = bm3d_oracle(img, sigma, prm, stages=stages)
    np.testing.assert_allclose(got, want, atol=2e-3)
