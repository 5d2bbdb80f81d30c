"""Spatial sharding of large-image denoising with halo exchange.

The reference never needs this (largest state is a 256x256 image), but the
framework's scaling story for images that exceed one chip's memory — the
"context parallel" analog identified in SURVEY.md §2.10 — is to shard the
image rows across a mesh axis and exchange boundary halos between neighbor
devices so windowed kernels (NLM patch search, BM3D block matching, convs)
see the rows they need. Collectives are ``ppermute`` ring shifts over ICI
inside ``shard_map``.

Exactness: for a kernel whose output pixel depends on inputs within
``halo`` rows (NLM: patch_distance + patch_size; convs: kernel//2), the
sharded result equals the unsharded one bit-for-bit — global edge shards
reproduce the kernel's reflect padding locally. BM3D's reference-block grid
re-anchors per shard, so seams agree only to aggregation-weight differences
(tested > 50 dB agreement); use halo >= search + block.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from pnp_svrg_tpu.parallel.mesh import BATCH_AXIS, SPATIAL_AXIS


def denoise_spatial(
    denoise_fn,
    image: jnp.ndarray,
    mesh,
    halo: int,
    axis_name: str = BATCH_AXIS,
):
    """Apply ``denoise_fn`` to an (H, W) image row-sharded over ``axis_name``
    of ``mesh``, with ``halo`` rows exchanged between neighbors.

    ``denoise_fn(ext, (lo, hi)) -> ext``-shaped output: ``ext`` is the local
    block with halos attached and ``(lo, hi)`` are the in-image row bounds
    within it (kernels that truncate their candidate window at the image
    border — NLM — use them; kernels that pad can ignore them).

    ``H`` must divide evenly by the axis size, and each local block must be
    at least ``halo`` rows tall. The first/last shards substitute a local
    reflection for the missing neighbor, matching ``jnp.pad(mode="reflect")``
    edge semantics.
    """
    n = mesh.shape[axis_name]
    h_total = image.shape[0]
    if h_total % n:
        raise ValueError(f"image height {h_total} not divisible by {n} shards")
    if h_total // n < halo + 1:
        raise ValueError(
            f"shard height {h_total // n} too small for halo {halo}"
        )

    def local(x_loc):
        idx = jax.lax.axis_index(axis_name)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_above = jax.lax.ppermute(x_loc[-halo:], axis_name, fwd)
        from_below = jax.lax.ppermute(x_loc[:halo], axis_name, bwd)
        # Global edges: reflect own interior rows (rows 1..halo), exactly the
        # pad rows jnp.pad(mode="reflect") would produce at the image border.
        top_reflect = x_loc[1 : halo + 1][::-1]
        bot_reflect = x_loc[-halo - 1 : -1][::-1]
        top = jnp.where(idx == 0, top_reflect, from_above)
        bot = jnp.where(idx == n - 1, bot_reflect, from_below)
        ext = jnp.concatenate([top, x_loc, bot], axis=0)
        # In-image row bounds within ext (halo rows at a global edge are
        # padding, not candidates): kernels that truncate their search at
        # the image border receive these to reproduce it exactly.
        ext_h = x_loc.shape[0] + 2 * halo
        lo = jnp.where(idx == 0, halo, 0)
        hi = jnp.where(idx == n - 1, ext_h - halo, ext_h)
        out = denoise_fn(ext, (lo, hi))
        return out[halo:-halo]

    sharded = jax.device_put(image, NamedSharding(mesh, P(axis_name, None)))
    fn = shard_map(
        local, mesh=mesh, in_specs=P(axis_name, None), out_specs=P(axis_name, None)
    )
    return fn(sharded)


def nlm_denoise_spatial(
    image, h, sigma, mesh, patch_size: int = 4, patch_distance: int = 5,
    axis_name: str = BATCH_AXIS,
):
    """Row-sharded NLM — bit-identical to ``nlm_denoise`` on one device."""
    from pnp_svrg_tpu.denoisers.nlm import nlm_denoise

    halo = patch_distance + patch_size
    return denoise_spatial(
        lambda x, bounds: nlm_denoise(
            x,
            h,
            sigma,
            patch_size=patch_size,
            patch_distance=patch_distance,
            row_valid_bounds=bounds,
        ),
        image,
        mesh,
        halo=halo,
        axis_name=axis_name,
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["inner"],
    meta_fields=["halo", "shards", "axis_name"],
)
@dataclasses.dataclass(frozen=True)
class SpatialTiledDenoiser:
    """Row-tiled denoise step for a PnP loop running under ``shard_map``.

    Each device denoises only its own H/shards row block (plus ``halo``
    dependency rows) of every image in the batch, with the inner denoiser's
    ``row_valid_bounds`` border semantics, then the blocks are reassembled
    with one ``all_gather`` over the ``spatial`` mesh axis. Loop state (the
    image iterate) stays replicated along that axis — images are small; what
    this shards is the denoiser's working set (BM3D patch tables and group
    tensors are ~100x the image) and its compute, the framework's
    context-parallel analog (SURVEY.md §2.10).

    Built by :func:`run_batch_spatial`; inner must provide
    ``denoise_bounded`` and ``spatial_halo`` (BM3D, NLM).
    """

    inner: object
    halo: int = 0
    shards: int = 1
    axis_name: str = SPATIAL_AXIS

    def denoise(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        squeeze = x.ndim == 2
        xb = x[None] if squeeze else x  # (B, H, W), replicated along axis
        h_total = xb.shape[1]
        n, halo = self.shards, self.halo
        rows = h_total // n
        idx = jax.lax.axis_index(self.axis_name)
        # Reflect-pad the full (replicated) image; shard idx's halo-extended
        # block then spans original rows [idx*rows - halo, (idx+1)*rows + halo)
        # with jnp.pad(mode="reflect") semantics at the global edges — the
        # same extended block denoise_spatial builds with ppermute when the
        # image itself is sharded.
        xp = jnp.pad(xb, ((0, 0), (halo, halo), (0, 0)), mode="reflect")
        ext = jax.lax.dynamic_slice_in_dim(xp, idx * rows, rows + 2 * halo, axis=1)
        ext_h = rows + 2 * halo
        lo = jnp.where(idx == 0, halo, 0)
        hi = jnp.where(idx == n - 1, ext_h - halo, ext_h)
        out = self.inner.denoise_bounded(ext, sigma_est, t, (lo, hi))
        out = out[:, halo : halo + rows]
        full = jax.lax.all_gather(out, self.axis_name, axis=1, tiled=True)
        return full[0] if squeeze else full


def run_batch_spatial(fn, batched_problem, denoiser, key, mesh, **hp):
    """Run one PnP scan loop with the denoise step row-sharded over the
    mesh ``spatial`` axis (and images data-parallel over ``batch``).

    The public entry is ``run_batch(..., image_shards=k)``; this is the
    mechanism. Requires a denoiser with ``denoise_bounded``/``spatial_halo``
    (BM3D, NLM — the windowed kernels whose working set dominates memory).
    """
    s = mesh.shape[SPATIAL_AXIS]
    h_total = int(batched_problem.h)
    if h_total % s:
        raise ValueError(f"image height {h_total} not divisible by {s} shards")
    if not hasattr(denoiser, "denoise_bounded"):
        raise TypeError(
            f"{type(denoiser).__name__} has no bounded/row-sharded denoise "
            "path (supported: BM3DDenoiser, NLMDenoiser)"
        )
    halo = denoiser.spatial_halo()
    tiled = SpatialTiledDenoiser(denoiser, halo=halo, shards=s)
    out_keys = ("z", "image", "psnr_per_iter", "final_psnr")

    def local_run(local_tree, k):
        out = fn(local_tree, tiled, key=k, **hp)
        return {kk: out[kk] for kk in out_keys}

    in_specs = jax.tree_util.tree_map(
        lambda leaf: P(BATCH_AXIS, *([None] * (leaf.ndim - 1))), batched_problem
    )
    out_specs = {
        "z": P(BATCH_AXIS, None),
        "image": P(BATCH_AXIS, None, None),
        "psnr_per_iter": P(None, BATCH_AXIS),
        "final_psnr": P(BATCH_AXIS),
    }
    runner = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(in_specs, P()),
        out_specs=out_specs,
        check_vma=False,  # z is replicated along spatial by construction
        # (each denoise ends in an all_gather); the static checker can't see it
    )
    return runner(batched_problem, key)


def bm3d_denoise_spatial(
    image, sigma, mesh, params=None, stages: int = 2,
    axis_name: str = BATCH_AXIS,
):
    """Row-sharded BM3D, bit-identical to the unsharded kernel when the
    image height, the per-shard height, and the halo are all multiples of
    ``params.step`` (so per-shard reference grids coincide with the global
    grid; true for the defaults). Candidate windows and reference blocks in
    halo padding are excluded via ``row_valid_bounds`` exactly like the
    unsharded kernel's border truncation."""
    from pnp_svrg_tpu.denoisers.bm3d import BM3DParams, bm3d_denoise

    p = params or BM3DParams()
    # Each stage's output is exact only (search + block) rows inside the
    # halo, and the Wiener stage re-matches on the stage-1 estimate, so the
    # halo compounds per stage. Round up to the grid step to keep per-shard
    # reference grids aligned with the global one.
    halo = stages * (p.search + p.block)
    halo += (-halo) % p.step
    return denoise_spatial(
        lambda x, bounds: bm3d_denoise(
            x, sigma, params=p, stages=stages, row_valid_bounds=bounds
        ),
        image,
        mesh,
        halo=halo,
        axis_name=axis_name,
    )
