"""Bilinear sampling operator and its exact adjoint.

Native replacement for ``pylops.signalprocessing.Bilinear`` which the
reference uses as the Deblur/SR downsampling operator ``Bop`` and its adjoint
``Bop.H`` (reference ``problems/DeblurSR.py:95-108,129-131,146``). The
operator is represented explicitly as a 4-point gather (indices + weights),
so forward = weighted gather and adjoint = scatter-add — an exact transpose
pair (tested via <Ax, y> == <x, A^T y>), fully static-shape for XLA.

The sample grid reproduces the reference construction exactly, including its
meshgrid axis quirk: row coordinates come from the W-spaced linspace and
column coordinates from the H-spaced one (``DeblurSR.py:101-107`` — the
reference comment "idk why W and H have to be flipped" refers to this).
For square images the two coincide.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = 1e-10


def bilinear_gather_params(
    h: int, w: int, lr_h: int, lr_w: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (idx, weights) for bilinear sampling of an (h*w,) raveled
    image at an (lr_h x lr_w) grid. Identity when shapes match (the reference
    special-cases scale_percent == 100 to ``pylops.Identity``)."""
    m = lr_h * lr_w
    if (lr_h, lr_w) == (h, w):
        idx = np.stack([np.arange(m)] * 4, axis=1).astype(np.int32)
        wts = np.zeros((m, 4), np.float32)
        wts[:, 0] = 1.0
        return jnp.asarray(idx), jnp.asarray(wts)

    pts_h = np.linspace(_EPS, h - (1 + _EPS), lr_h)
    pts_w = np.linspace(_EPS, w - (1 + _EPS), lr_w)
    # Reference quirk: row coords from the W-spaced points, cols from H-spaced.
    rows = np.repeat(pts_w, lr_w) if lr_h == lr_w else np.repeat(
        np.linspace(_EPS, h - (1 + _EPS), lr_h), lr_w
    )
    cols = np.tile(pts_h, lr_h) if lr_h == lr_w else np.tile(
        np.linspace(_EPS, w - (1 + _EPS), lr_w), lr_h
    )

    r0 = np.floor(rows).astype(np.int64)
    c0 = np.floor(cols).astype(np.int64)
    dr = (rows - r0).astype(np.float32)
    dc = (cols - c0).astype(np.float32)
    r1 = np.clip(r0 + 1, 0, h - 1)
    c1 = np.clip(c0 + 1, 0, w - 1)

    idx = np.stack(
        [r0 * w + c0, r0 * w + c1, r1 * w + c0, r1 * w + c1], axis=1
    ).astype(np.int32)
    wts = np.stack(
        [(1 - dr) * (1 - dc), (1 - dr) * dc, dr * (1 - dc), dr * dc], axis=1
    ).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(wts)


def bilinear_apply(v: jnp.ndarray, idx: jnp.ndarray, wts: jnp.ndarray) -> jnp.ndarray:
    """Forward: (N,) -> (M,) weighted 4-point gather."""
    return jnp.sum(v[idx] * wts, axis=1)


def bilinear_adjoint(
    r: jnp.ndarray, idx: jnp.ndarray, wts: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Adjoint: (M,) -> (N,) scatter-add of weighted residuals."""
    contrib = r[:, None] * wts
    return jnp.zeros((n,), r.dtype).at[idx.ravel()].add(contrib.ravel())
