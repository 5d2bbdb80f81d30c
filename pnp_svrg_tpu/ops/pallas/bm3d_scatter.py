"""BM3D patch-aggregation scatter as a Pallas kernel (VMEM-resident table).

The XLA path scatter-adds (B*P, 2*b*b) update rows into a (B*hh*ww, 2*b*b)
patch-position table in HBM — the single largest identifiable op in the
flagship profile (~2.55 ms/call at batch 13, two calls per denoise;
``data/flagship_profile_v5e.json`` / ``data/flagship_profile_turbo_v5e.json``).
XLA's scatter reaches ~15 % of HBM peak because every update is a
read-modify-write round trip.

This kernel keeps each image's table resident in VMEM (~7.5 MB for 128^2 /
block 8) and streams the updates through a second grid axis: the row loop
does dynamic-sublane read-modify-writes against on-chip memory, and the
table travels to HBM exactly once. Update rows within one reference block's
group hit DISTINCT table rows (distinct chosen offsets), but rows from
different reference blocks may collide — the loop is strictly sequential per
image, which is correct for any collision pattern.

This is the honest-measurement companion to the grid-aligned dense
aggregation (``denoisers/bm3d.py _aggregate_dense``): dense wins when the
search is lattice-aligned; this kernel is the candidate for the
general-offset path. Measured head-to-head by
``tools/measure_bm3d_scatter.py`` -> ``data/bm3d_scatter_v5e.json``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _scatter_kernel(idx_ref, upd_ref, out_ref, *, chunk: int, n_upd: int):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = c * chunk

    def body(i, _):
        p = base + i
        row = idx_ref[b, p]
        out_ref[0, pl.ds(row, 1), :] += upd_ref[0, pl.ds(i, 1), :]
        return 0

    n = jnp.minimum(chunk, n_upd - base)
    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(
    jax.jit, static_argnames=("table_rows", "chunk", "interpret")
)
def bm3d_scatter_pallas(
    idx: jnp.ndarray,
    upd: jnp.ndarray,
    table_rows: int,
    chunk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-image scatter-add: ``table[b, idx[b, p], :] += upd[b, p, :]``.

    ``idx``: (B, P) int32 row indices in [0, table_rows); ``upd``: (B, P, W)
    f32. Returns (B, table_rows, W). The table stays VMEM-resident per image
    while updates stream in chunks (second grid axis revisits the same
    output block).
    """
    b, p, w = upd.shape
    tr = _ceil_to(table_rows, 8)
    pp = _ceil_to(p, chunk)
    if pp != p:
        # pad with no-op rows (index 0, zero update)
        idx = jnp.pad(idx, ((0, 0), (0, pp - p)))
        upd = jnp.pad(upd, ((0, 0), (0, pp - p), (0, 0)))
    n_chunks = pp // chunk

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, chunk=chunk, n_upd=p),
        out_shape=jax.ShapeDtypeStruct((b, tr, w), jnp.float32),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, w), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, w), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx, upd)
    return out[:, :table_rows]
