"""Non-local means denoiser, TPU-native shift-and-accumulate formulation.

The reference delegates to scikit-image's Cython ``_nl_means_denoising``
(reference ``denoisers/NLM.py:20-27``; slow mode, patch_size=4,
patch_distance=5). That algorithm is, for every pixel p and every offset d in
the search window, a patch distance

    dist(p, d) = mean_{k in patch} (I[p+k] - I[p+d+k])^2

followed by exponential weighting ``w = exp(-max(dist - 2 sigma^2, 0) / h^2)``
and a weighted average of the shifted center pixels. Re-ordered loops make
this perfectly regular for a vector unit: for each of the (2r+1)^2 shifts,
compute the squared-difference image once, box-filter it with the patch
window, and accumulate weights — no per-pixel data-dependent work. That is
the formulation implemented here (jnp; a Pallas kernel of the same math lives
in ``ops/pallas/nlm_kernel.py``).

Boundary handling matches skimage: the image is reflect-padded by the patch
radius, and patch sums near borders therefore see reflected values.

Note: the reference ``NLMDenoiser.denoise`` has a latent bug — it branches on
an undefined ``self.sigma`` attribute (reference ``NLM.py:24``) and raises
AttributeError unless a caller sets it externally. We implement the clearly
*intended* semantics (same contract as the other classical denoisers): use
``sigma_est`` when positive, else the ``denoise_strength * decay**t``
fallback with h only and sigma=0.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("patch_size", "patch_distance"))
def nlm_denoise(
    image: jnp.ndarray,
    h: jnp.ndarray,
    sigma: jnp.ndarray,
    patch_size: int = 4,
    patch_distance: int = 5,
    row_valid_bounds: tuple | None = None,
) -> jnp.ndarray:
    """Non-local means on a 2-D image (slow/exact mode, uniform patch weights).

    ``h``: filtering strength; ``sigma``: noise sd used for the distance
    offset ``2 sigma^2`` (skimage semantics). ``row_valid_bounds``: optional
    (lo, hi) scalars restricting which ROWS count as in-image candidates —
    used by the row-sharded spatial path (``parallel/spatial.py``) so halo
    rows filled by a global-edge shard are excluded exactly like skimage's
    border truncation; default is the full height.
    """
    x = image.astype(jnp.float32)
    hh, ww = x.shape[-2:]
    nd = x.ndim  # supports (H, W) and batched (..., H, W); h/sigma broadcast
    pr = patch_size // 2  # pad radius for patch sums
    d = patch_distance
    # skimage pads by the patch "offset" with reflect mode.
    pad_cfg = [(0, 0)] * (nd - 2) + [(pr, pr), (pr, pr)]
    xp = jnp.pad(x, pad_cfg, mode="reflect")

    h = jnp.asarray(h, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    expand = (...,) + (None, None)
    inv_h2 = (1.0 / (h * h * patch_size * patch_size))[expand] if h.ndim else 1.0 / (
        h * h * patch_size * patch_size
    )
    # skimage's slow path normalizes patch distance by the patch area; fold
    # that into inv_h2: w = exp(-max(sum_sq/area - 2 s^2, 0)/h^2)
    #                     = exp(-max(sum_sq - 2 s^2 * area, 0)/(h^2 * area)).
    off_val = 2.0 * sigma * sigma * (patch_size * patch_size)
    offset = off_val[expand] if sigma.ndim else off_val

    shifts = [(dy, dx) for dy in range(-d, d + 1) for dx in range(-d, d + 1)]

    def box_filter(v: jnp.ndarray) -> jnp.ndarray:
        """Sum over the patch window via separable reduce_window sums (fast
        TPU window reductions; output pixel (i, j) sums v[i:i+p, j:j+p])."""
        p = patch_size
        win1 = (1,) * (nd - 2) + (p, 1)
        win2 = (1,) * (nd - 2) + (1, p)
        ones = (1,) * nd
        s = jax.lax.reduce_window(v, 0.0, jax.lax.add, win1, ones, "VALID")
        s = jax.lax.reduce_window(s, 0.0, jax.lax.add, win2, ones, "VALID")
        return s[..., :hh, :ww]

    wsum = jnp.zeros_like(x)
    acc = jnp.zeros_like(x)
    for dy, dx in shifts:
        shifted_p = jnp.roll(xp, (-dy, -dx), axis=(-2, -1))
        sq = (xp - shifted_p) ** 2
        dist = box_filter(sq)  # patch-summed squared distance per pixel
        wgt = jnp.exp(-jnp.maximum(dist - offset, 0.0) * inv_h2)
        shifted_center = jnp.roll(x, (-dy, -dx), axis=(-2, -1))
        # Invalidate out-of-bounds shifts (skimage only visits in-range q).
        row = jnp.arange(hh)[:, None]
        col = jnp.arange(ww)[None, :]
        row_lo, row_hi = (0, hh) if row_valid_bounds is None else row_valid_bounds
        valid = (
            (row + dy >= row_lo)
            & (row + dy < row_hi)
            & (col + dx >= 0)
            & (col + dx < ww)
        ).astype(x.dtype)
        wgt = wgt * valid
        wsum = wsum + wgt
        acc = acc + wgt * shifted_center
    return acc / jnp.maximum(wsum, 1e-12)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["denoise_strength", "sigma_modifier", "decay"],
    meta_fields=["patch_size", "patch_distance", "use_pallas"],
)
@dataclasses.dataclass(frozen=True)
class NLMDenoiser:
    """``use_pallas`` routes calls — single (H, W) images AND (B, H, W)
    batches, with per-lane (h, sigma) — through the fused Pallas TPU kernel
    (``ops/pallas/nlm_kernel.py``; bit-identical output, measured faster
    than the XLA graph on v5e — ``data/nlm_pallas_v5e.json``). The default
    ``None`` auto-selects: Pallas on TPU backends, the XLA/jnp path
    elsewhere (the kernel only compiles under Mosaic)."""

    denoise_strength: jnp.ndarray = 0.0
    sigma_modifier: jnp.ndarray = 1.0
    decay: jnp.ndarray = 1.0
    patch_size: int = 4
    patch_distance: int = 5
    use_pallas: bool | None = None

    def _use_pallas(self) -> bool:
        if self.use_pallas is None:
            return jax.default_backend() == "tpu"
        return self.use_pallas

    def denoise(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        sigma_est = jnp.asarray(sigma_est, x.dtype)
        use_est = sigma_est > 0
        h = jnp.where(
            use_est,
            sigma_est * self.sigma_modifier,
            self.denoise_strength * self.decay**t,
        )
        sigma = jnp.where(use_est, sigma_est * self.sigma_modifier, 0.0)
        if self._use_pallas():
            from pnp_svrg_tpu.ops.pallas.nlm_kernel import nlm_denoise_pallas

            return nlm_denoise_pallas(
                x, h, sigma, patch_size=self.patch_size,
                patch_distance=self.patch_distance,
            )
        return nlm_denoise(
            x, h, sigma, patch_size=self.patch_size, patch_distance=self.patch_distance
        )

    def denoise_bounded(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray, t: jnp.ndarray,
        row_valid_bounds: tuple,
    ) -> jnp.ndarray:
        """Denoise with explicit in-image row bounds (the row-sharded
        spatial path, ``parallel/spatial.py``)."""
        sigma_est = jnp.asarray(sigma_est, x.dtype)
        use_est = sigma_est > 0
        h = jnp.where(
            use_est,
            sigma_est * self.sigma_modifier,
            self.denoise_strength * self.decay**t,
        )
        sigma = jnp.where(use_est, sigma_est * self.sigma_modifier, 0.0)
        return nlm_denoise(
            x, h, sigma, patch_size=self.patch_size,
            patch_distance=self.patch_distance,
            row_valid_bounds=row_valid_bounds,
        )

    def spatial_halo(self) -> int:
        """Dependency radius in rows for row-sharded denoising."""
        return self.patch_distance + self.patch_size
