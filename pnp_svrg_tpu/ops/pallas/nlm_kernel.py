"""Non-local means as a single fused Pallas TPU kernel.

Same math as ``denoisers/nlm.py`` (the shift-and-accumulate re-ordering of
skimage's slow-mode NLM, reference ``denoisers/NLM.py:20-27``), but executed
as one VMEM-resident kernel: the reflect-padded image is loaded once, the
(2d+1)^2 shift iterations run as a ``fori_loop`` whose shifts are dynamic
circular rotates (``pltpu.roll`` -> tpu.dynamic_rotate), keeping VMEM
residency to a handful of buffers. (A fully unrolled shift loop overflows
the Mosaic VMEM stack, and dynamic *slices* would need 8/128-aligned
starts; dynamic rotates have neither restriction.)

Patch sums use p-1 shifted adds per axis instead of a window reduction —
for the reference's patch_size=4 that is 6 vector adds per shift.

Batched (B, H, W) input runs as a grid over the batch axis — one image per
grid step, each with its own (h, sigma) pair from SMEM — so the PnP loops'
natively-batched denoiser calls (``core/batched.py``) hit this kernel
without host-side loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nlm_kernel(hs_ref, xp_ref, out_ref, *, hh, ww, pr, patch_size, patch_distance):
    # hs is the full (B, 2) array in SMEM (Mosaic rejects blocked SMEM specs
    # whose trailing dims are neither tile-aligned nor the full array).
    b = pl.program_id(0)
    h_val = hs_ref[b, 0]
    sigma = hs_ref[b, 1]
    p = patch_size
    d = patch_distance
    side = 2 * d + 1
    inv_h2 = 1.0 / (h_val * h_val * p * p)
    offset = 2.0 * sigma * sigma * (p * p)
    ha, wa = xp_ref.shape[-2:]  # tile-aligned canvas

    row = jax.lax.broadcasted_iota(jnp.int32, (ha, wa), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ha, wa), 1)
    xp = xp_ref[0]

    def body(i, carry):
        wsum, acc = carry
        dy = i // side - d
        dx = i % side - d
        # Shift via dynamic circular rotate (Mosaic tpu.dynamic_rotate);
        # wraparound lands only at positions the validity mask removes.
        xs = pltpu.roll(xp, shift=(-dy) % ha, axis=0)
        xs = pltpu.roll(xs, shift=(-dx) % wa, axis=1)
        sq = (xp - xs) ** 2
        # Separable patch sum via p-1 static rotates per axis; every
        # intermediate keeps the aligned (ha, wa) canvas shape.
        srow = sq
        for k in range(1, p):
            srow = srow + pltpu.roll(sq, shift=ha - k, axis=0)
        dist = srow
        for k in range(1, p):
            dist = dist + pltpu.roll(srow, shift=wa - k, axis=1)
        wgt = jnp.exp(-jnp.maximum(dist - offset, 0.0) * inv_h2)
        valid = (
            (row + dy >= 0) & (row + dy < hh) & (col + dx >= 0) & (col + dx < ww)
        )
        wgt = jnp.where(valid, wgt, 0.0)
        # center(i, j) = xs[i + pr, j + pr]
        center = pltpu.roll(pltpu.roll(xs, shift=ha - pr, axis=0),
                            shift=wa - pr, axis=1)
        return wsum + wgt, acc + wgt * center

    wsum0 = jnp.zeros((ha, wa), jnp.float32)
    acc0 = jnp.zeros((ha, wa), jnp.float32)
    wsum, acc = jax.lax.fori_loop(0, side * side, body, (wsum0, acc0))
    out_ref[0] = (acc / jnp.maximum(wsum, 1e-12))[:hh, :ww]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("patch_size", "patch_distance", "interpret")
)
def nlm_denoise_pallas(
    image: jnp.ndarray,
    h: jnp.ndarray,
    sigma: jnp.ndarray,
    patch_size: int = 4,
    patch_distance: int = 5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas NLM of a 2-D image or a (B, H, W) batch; numerically identical
    to ``pnp_svrg_tpu.denoisers.nlm.nlm_denoise`` (tested in interpret mode).

    ``h`` / ``sigma`` may be scalars or (B,) per-lane values (the tuner and
    the batched PnP runner pass per-lane sigma_modifier products).
    """
    x = image.astype(jnp.float32)
    single = x.ndim == 2
    if single:
        x = x[None]
    bsz, hh, ww = x.shape
    pr = patch_size // 2
    hb = jnp.broadcast_to(jnp.asarray(h, jnp.float32).reshape(-1), (bsz,))
    sb = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32).reshape(-1), (bsz,))
    hs = jnp.stack([hb, sb], axis=1)  # (B, 2)
    # Reflect-pad by the patch radius (skimage semantics), then zero-pad up
    # to tile-aligned canvas sizes (sublane 8, lane 128): every kernel
    # intermediate keeps this aligned shape, and circular wraparound only
    # reaches positions the validity mask removes.
    xp = jnp.pad(x, ((0, 0), (pr, pr), (pr, pr)), mode="reflect")
    ha = _ceil_to(hh + 2 * pr + patch_distance, 8)
    wa = _ceil_to(ww + 2 * pr + patch_distance, 128)
    xp = jnp.pad(
        xp, ((0, 0), (0, ha - (hh + 2 * pr)), (0, wa - (ww + 2 * pr)))
    )

    kernel = functools.partial(
        _nlm_kernel,
        hh=hh,
        ww=ww,
        pr=pr,
        patch_size=patch_size,
        patch_distance=patch_distance,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, hh, ww), jnp.float32),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ha, wa), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hh, ww), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hs, xp)
    return out[0] if single else out
