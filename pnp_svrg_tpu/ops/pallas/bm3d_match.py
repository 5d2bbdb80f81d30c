"""Fused BM3D block matching (distances + exact top-K) as one Pallas kernel.

The XLA matching path (``denoisers/bm3d.py _match_distances`` +
``_top_k_offsets``) materializes per-offset squared-difference canvases in
HBM (chunked (B, c, H, W) tensors), writes the full (B, nR, nC, S) distance
tensor, then runs K argmin/mask passes over it — every step an HBM round
trip. The flagship profile (``data/flagship_profile_v5e.json``) shows the
program is latency/occupancy-bound (0.6 % of HBM peak), so this kernel
executes the whole search VMEM-resident, per image:

* the zero-padded f32 canvas is loaded once (``tpu.dynamic_rotate`` has no
  bf16 sublane lowering, so shifts stay f32; ``match_dtype`` casts the
  MATMUL inputs, where the MXU-rate tradeoff actually lives);
* the S offset iterations run as ONE ``fori_loop`` of dynamic circular
  rotates (``pltpu.roll`` — no alignment restrictions), squared difference,
  and TWO small MXU matmuls against banded 0/1 select matrices (box filter
  + reference-grid sampling fused — the XLA path's exact contraction);
* top-K selection is ONLINE: a sorted (K, nR, nC) best-distance/index pair
  is carried through the loop and updated per offset with a vectorized
  insertion (keep / insert / shift-from-k-1, all simultaneous from the old
  arrays). Processing offsets in ascending order with strict-< insertion
  reproduces the XLA path's selection exactly: ascending distance, ties ->
  lowest offset index. (A first version buffered all S distance maps and ran
  K argmin/mask passes; the 16x289 unrolled reduction blew Mosaic's compile
  time past 10 minutes. The online form compiles in seconds and needs no
  scratch.)

Output is (B, K, nR, nC) int32 (transposed to the XLA path's
(B, nR, nC, K) by the caller — a tiny relayout XLA fuses away).

Reference behavior being accelerated: the block-matching step of BM3D
(Dabov et al. 2007) as called by the reference's ``denoisers/BM3D.py:20-25``
via the closed-source C library; here it is the profiled hot core of the
TPU-native shift-space design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _match_kernel(
    off_ref,  # SMEM (S, 2) int32
    xp_ref,  # VMEM (1, Ha, Wa) f32 padded canvas
    selht_ref,  # VMEM (nR, Ha) match-dtype banded rows (pre-transposed)
    selw_ref,  # VMEM (Wa, nC) match-dtype banded cols
    rgrid_ref,  # VMEM (nR, nC) int32 reference-row coordinates
    cgrid_ref,  # VMEM (nR, nC) int32 reference-col coordinates
    outi_ref,  # VMEM (1, K, nR, nC) int32 output
    *,
    n_offsets: int,
    k: int,
    h: int,
    w: int,
    block: int,
):
    ha, wa = xp_ref.shape[-2:]
    nr, nc = rgrid_ref.shape
    xp = xp_ref[0]
    rgrid = rgrid_ref[:]
    cgrid = cgrid_ref[:]
    last_r, last_c = h - block, w - block
    mdt = selw_ref.dtype
    selht = selht_ref[:].astype(jnp.float32)
    selw = selw_ref[:]

    def body(s, carry):
        best_d, best_i = carry  # (K, nR, nC) sorted ascending
        dy = off_ref[s, 0]
        dx = off_ref[s, 1]
        xs = pltpu.roll(xp, shift=(-dy) % ha, axis=0)
        xs = pltpu.roll(xs, shift=(-dx) % wa, axis=1)
        sq = ((xp - xs) ** 2).astype(mdt)
        t = jnp.dot(sq, selw, preferred_element_type=jnp.float32)
        d = jnp.dot(selht, t, preferred_element_type=jnp.float32)  # (nR, nC)
        valid = (
            (rgrid + dy >= 0)
            & (rgrid + dy <= last_r)
            & (cgrid + dx >= 0)
            & (cgrid + dx <= last_c)
        )
        d = jnp.where(valid, d, jnp.inf)[None]  # (1, nR, nC)
        # Vectorized sorted insertion (simultaneous from the OLD arrays):
        #   keep   : best_d[k] <= d            -> slot unchanged
        #   insert : best_d[k] > d >= best_d[k-1] -> new element lands here
        #   shift  : d < best_d[k-1]           -> slot takes old k-1
        # Strict < on insert + ascending offset order == XLA tie semantics.
        prev_d = jnp.concatenate(
            [jnp.full((1, nr, nc), -jnp.inf, jnp.float32), best_d[:-1]], 0
        )
        prev_i = jnp.concatenate(
            [jnp.zeros((1, nr, nc), jnp.int32), best_i[:-1]], 0
        )
        keep = best_d <= d
        ins = prev_d <= d  # (within ~keep): insert here, else shift
        new_d = jnp.where(keep, best_d, jnp.where(ins, d, prev_d))
        new_i = jnp.where(keep, best_i, jnp.where(ins, s, prev_i))
        return new_d, new_i

    best_d0 = jnp.full((k, nr, nc), jnp.inf, jnp.float32)
    best_i0 = jnp.zeros((k, nr, nc), jnp.int32)
    _, best_i = jax.lax.fori_loop(0, n_offsets, body, (best_d0, best_i0))
    outi_ref[0] = best_i


@functools.lru_cache(maxsize=32)
def _band_np(size: int, grid: tuple, block: int) -> np.ndarray:
    s = np.zeros((size, len(grid)), np.float32)
    for i, g in enumerate(grid):
        s[g : g + block, i] = 1.0
    return s


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows", "cols", "offsets", "block", "k", "match_dtype", "interpret"
    ),
)
def bm3d_match_pallas(
    images: jnp.ndarray,
    rows: tuple,
    cols: tuple,
    offsets: tuple,
    block: int,
    k: int,
    match_dtype: str = "float32",
    interpret: bool = False,
) -> jnp.ndarray:
    """Top-K candidate-offset indices for every reference block.

    ``images``: (B, H, W). ``rows``/``cols``/``offsets``: static tuples (the
    reference grid and the (dy, dx) search offsets). Returns (B, nR, nC, k)
    int32 — same layout and selection semantics as the XLA matcher
    (``_match_distances`` + ``_top_k_offsets(method="exact")``).
    """
    x = images.astype(jnp.float32)
    b, h, w = x.shape
    offs = np.asarray(offsets, np.int32).reshape(-1, 2)
    s = len(offs)
    r = int(np.abs(offs).max())
    nr, nc = len(rows), len(cols)
    mdt = jnp.dtype(match_dtype)

    ha = _ceil_to(h + 2 * r, 16)
    wa = _ceil_to(w + 2 * r, 128)
    xp = jnp.pad(x, ((0, 0), (r, r + ha - h - 2 * r),
                     (r, r + wa - w - 2 * r)))  # f32 canvas (see module doc)
    # Banded selects live at canvas coordinates (image origin at +r).
    selht = jnp.asarray(
        _band_np(ha, tuple(int(v) + r for v in rows), block).T, mdt
    )  # (nR, Ha)
    selw = jnp.asarray(
        _band_np(wa, tuple(int(v) + r for v in cols), block), mdt
    )  # (Wa, nC)
    rgrid = jnp.broadcast_to(
        jnp.asarray(rows, jnp.int32)[:, None], (nr, nc)
    )
    cgrid = jnp.broadcast_to(jnp.asarray(cols, jnp.int32)[None, :], (nr, nc))

    kernel = functools.partial(
        _match_kernel, n_offsets=s, k=k, h=h, w=w, block=block
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, k, nr, nc), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ha, wa), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, nr, nc), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(offs), xp, selht, selw, rgrid, cgrid)
    return jnp.transpose(out, (0, 2, 3, 1))
