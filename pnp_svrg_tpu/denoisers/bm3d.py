"""BM3D denoiser, designed from scratch for TPU (pure jnp/XLA).

The reference calls the closed-source compiled-C ``bm3d`` PyPI package
(reference ``denoisers/BM3D.py:20-25``); it is the hottest call in every
benchmark run (SURVEY.md §3.1). This is a ground-up TPU formulation of the
canonical two-stage BM3D algorithm (Dabov et al. 2007): collaborative
filtering of groups of similar patches in a 3-D transform domain, with a
hard-thresholding stage followed by a Wiener stage that uses the stage-1
output as a pilot estimate.

TPU-native design choices (vs. the CPU algorithm's irregular loops):

* **Block matching in shift space.** Instead of per-reference-block searches,
  distances are computed per *offset*: for each of the (2r+1)^2 static search
  offsets d, the squared-difference image against the statically-sliced
  shifted image is contracted with two banded 0/1 matrices (box filter +
  reference-grid sampling fused into MXU matmuls, emitted offset-last so
  top_k needs no relayout). No dynamic rolls, no scan-carried index math,
  no data-dependent control flow anywhere.
* **Fixed group size K via iterative top-k** over the offset axis (the GPU-style
  variant of the paper's tau-thresholded variable-size groups; keeps every
  shape static for XLA).
* **3-D transform as matmuls**: orthonormal 2-D DCT on each patch and an
  orthonormal Walsh-Hadamard transform along the group axis — all MXU work.
* **Aggregation by scatter-add** with per-group weights ``1/(sigma^2 N_kept)``
  (hard) / ``1/(sigma^2 ||W||^2)`` (Wiener) times a 2-D Kaiser window,
  identical weighting to the reference algorithm. With grid-aligned search
  (``search_step`` a multiple of ``step``) the scatter disappears entirely:
  members land on the reference lattice and aggregation becomes a one-hot
  MXU contraction + static clamp-shift matmuls (``_aggregate_dense``).
* **Optional fused Pallas matcher** (``matcher="pallas"``,
  ``ops/pallas/bm3d_match.py``): the whole search VMEM-resident with online
  top-K. Measured slower than the XLA matcher at the full 289-offset search
  but the fastest engine at stride 2 (``data/bm3d_pallas_v5e.json``).
* **Native image batching.** The whole pipeline carries an explicit leading
  batch axis: gathers use flat global indices into (B*P, 64) patch tables and
  aggregation is one flat scatter into (B*H*W,). This is 1-2 orders of
  magnitude faster than ``vmap`` of a single-image kernel, whose batched
  gather/scatter lowerings serialize on TPU.

Everything is shape-static given (B, H, W, params): jit once, shard the batch
axis over the mesh.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pnp_svrg_tpu.ops.transforms import dct_matrix, hadamard_matrix, kaiser2d


@dataclasses.dataclass(frozen=True)
class BM3DParams:
    """Static BM3D configuration (part of the jit cache key)."""

    block: int = 8  # patch edge
    step: int = 4  # reference-block stride
    search: int = 12  # search radius (window (2r+1)^2 offsets)
    group_ht: int = 16  # group size, hard-threshold stage
    group_wie: int = 16  # group size, Wiener stage
    lam: float = 2.7  # hard threshold = lam * sigma
    kaiser_beta: float = 2.0
    # Block-matching cost knobs (selection-only precision — the filtering
    # math is always f32):
    match_dtype: str = "float32"  # "bfloat16" halves the HBM traffic of the
    # per-offset squared-difference tensors and doubles MXU rate on the
    # banded contractions; distances only rank candidates, so sub-0.5%
    # distance error flips near-ties at most. Measured on v5e
    # (data/bm3d_knobs_v5e.json): +6.5-7.4% end-to-end it/s at
    # statistically unchanged PSNR — the bench's headline operating point.
    # f32 stays the default so the kernel's selection semantics match the
    # golden-parity oracles bit-for-bit.
    topk: str = "exact"  # "approx" = jax.lax.approx_min_k (the TPU's
    # hardware-backed k-selection; exact lowering on CPU). Measured SLOWER
    # than the iterative exact k-argmin at every bench config (S<=625,
    # K=16; data/bm3d_knobs_v5e.json) — PartialReduce only pays off at
    # much larger S/k ratios; kept for that regime.
    matcher: str = "xla"  # Block-matching engine: "xla" = chunked shift-space
    # distances + iterative k-argmin (HBM-streaming); "pallas" = the fused
    # VMEM-resident kernel (ops/pallas/bm3d_match.py) — identical selection
    # semantics (exact top-K, ascending, first-index ties; measured 100%
    # set agreement, order flips only at fp near-ties). "pallas_interpret"
    # runs the same kernel in interpreter mode (CPU tests). Measured head-
    # to-head in data/bm3d_pallas_v5e.json; "auto" = pallas on TPU backends
    # when the offset set is small (<=128 — the measured crossover; the XLA
    # matcher wins at the full 289-offset search).
    search_step: int = 1  # Candidate-offset stride: offsets are multiples of
    # search_step within the +-search window (1 = the canonical exhaustive
    # search). Setting it to a multiple of ``step`` is the TPU-native "grid-
    # aligned search" operating point: every group member then lands ON the
    # reference-block lattice, so the aggregation's data-dependent scatter
    # (the profiled hotspot of the flagship program — 2.4 ms/call at batch
    # 13, data/flagship_profile_v5e.json) is replaced by a one-hot MXU
    # contraction over group slots plus S static shifted adds — no scatter
    # anywhere. Quality tradeoff is real but modest (standalone sigma=25
    # denoise on 13.png: 25.40 / 24.89 / 24.50 dB at stride 1/2/4); measured
    # end-to-end numbers in data/bm3d_pallas_v5e.json (flagship table).


def _ref_grid(size: int, block: int, step: int) -> np.ndarray:
    """Reference-block coordinates: stride grid, last block always included."""
    last = size - block
    pts = list(range(0, last + 1, step))
    if pts[-1] != last:
        pts.append(last)
    return np.asarray(pts, np.int32)


def _box_sum_batch(v: jnp.ndarray, block: int) -> jnp.ndarray:
    """(..., H, W) -> (..., H-b+1, W-b+1) separable sliding-window sums via
    reduce_window (fast TPU window reductions)."""
    nd = v.ndim
    win1 = (1,) * (nd - 2) + (block, 1)
    win2 = (1,) * (nd - 2) + (1, block)
    ones = (1,) * nd
    s = jax.lax.reduce_window(v, 0.0, jax.lax.add, win1, ones, "VALID")
    return jax.lax.reduce_window(s, 0.0, jax.lax.add, win2, ones, "VALID")


@functools.lru_cache(maxsize=16)
def _band_select(size: int, grid: tuple, block: int) -> np.ndarray:
    """(size, len(grid)) banded 0/1 matrix: column i sums window
    [grid[i], grid[i]+block) — box filter + reference-grid sampling fused
    into one MXU contraction."""
    s = np.zeros((size, len(grid)), np.float32)
    for i, g in enumerate(grid):
        s[g : g + block, i] = 1.0
    return s


def _top_k_offsets(dists: jnp.ndarray, k: int, method: str = "exact") -> jnp.ndarray:
    """Indices of the k smallest distances along the last axis, ascending.

    ``method="exact"``: iterative extract-and-mask — k argmin passes over
    (…, S). Measured ~30% faster than the sort-based ``lax.top_k`` lowering
    on v5e for S=289 and selects the identical set (ties break by lowest
    index). ``method="approx"``: ``jax.lax.approx_min_k`` — the TPU's
    PartialReduce k-selection, one pass instead of k; recall ~0.95 flips
    only distance near-ties (CPU lowering is exact)."""
    if method == "approx":
        _, idx = jax.lax.approx_min_k(dists, k)
        return idx
    iota = jax.lax.broadcasted_iota(jnp.int32, dists.shape, dists.ndim - 1)
    idxs = []
    for _ in range(k):
        i = jnp.argmin(dists, axis=-1)
        idxs.append(i)
        dists = jnp.where(iota == i[..., None], jnp.inf, dists)
    return jnp.stack(idxs, axis=-1)


def _match_distances(
    imgs, rows, cols, offsets, block, chunk: int = 72, row_valid_bounds=None,
    match_dtype: str = "float32",
):
    """Patch SSD between each reference block and each offset candidate.

    ``imgs``: (B, H, W). ``offsets`` must be a *static* numpy (S, 2) array:
    every shift becomes a static slice of the zero-padded image, and
    out-of-bounds validity is a baked-in constant mask. Shifts are processed
    in chunks to bound the (B, chunk, H, W) intermediate. Returns
    (B, nR, nC, S) — offset axis last — with +inf at invalid candidates.
    ``row_valid_bounds``: optional traced (lo, hi) restricting candidate rows
    to [lo, hi - block] — the row-sharded spatial path uses it so halo rows
    at a global image edge are excluded exactly like the unsharded kernel's
    border truncation (``parallel/spatial.py``).
    """
    b, h, w = imgs.shape
    last_r, last_c = h - block, w - block
    rows_np = np.asarray(rows)
    cols_np = np.asarray(cols)
    # Box filter + reference-grid sampling as two banded matmuls: profiling
    # showed reduce_window over the FULL (H-b+1, W-b+1) map followed by grid
    # slicing wasted ~15x work (the grid keeps ~1/16 of positions) and cost
    # ~7 ms/call at batch 13; the fused contractions run on the MXU.
    mdt = jnp.dtype(match_dtype)
    sel_h = jnp.asarray(_band_select(h, tuple(rows_np.tolist()), block), mdt)
    sel_w = jnp.asarray(_band_select(w, tuple(cols_np.tolist()), block), mdt)
    r = int(np.abs(offsets).max())
    # match_dtype="bfloat16": the squared-difference tensors (the biggest
    # HBM objects in the kernel, (B, chunk, H, W)) and the banded
    # contractions run in bf16 with f32 accumulation — distances only RANK
    # candidates, the filtering math stays f32.
    imgs_m = imgs.astype(mdt)
    padded = jnp.pad(imgs_m, ((0, 0), (r, r), (r, r)))
    parts = []
    for start in range(0, len(offsets), chunk):
        offs = offsets[start : start + chunk]
        shifted = jnp.stack(
            [padded[:, r + dy : r + dy + h, r + dx : r + dx + w] for dy, dx in offs],
            axis=1,
        )  # (B, c, H, W)
        sq = (imgs_m[:, None] - shifted) ** 2
        d = jnp.einsum(
            "hi,bchw,wj->bijc",
            sel_h,
            sq,
            sel_w,
            preferred_element_type=jnp.float32,
        )  # (B, nR, nC, c) — offset axis LAST so top_k needs no relayout
        valid = (
            (rows_np[:, None, None] + offs[:, 0][None, None, :] >= 0)
            & (rows_np[:, None, None] + offs[:, 0][None, None, :] <= last_r)
            & (cols_np[None, :, None] + offs[:, 1][None, None, :] >= 0)
            & (cols_np[None, :, None] + offs[:, 1][None, None, :] <= last_c)
        )  # (nR, nC, c) static
        valid = jnp.asarray(valid)
        if row_valid_bounds is not None:
            lo, hi = row_valid_bounds
            cand_r = jnp.asarray(rows_np)[:, None, None] + jnp.asarray(
                offs[:, 0]
            )[None, None, :]
            valid = valid & (cand_r >= lo) & (cand_r <= hi - block)
        parts.append(jnp.where(valid[None], d, jnp.inf))
    return jnp.concatenate(parts, axis=-1)  # (B, nR, nC, S)


@functools.lru_cache(maxsize=8)
def _unfold_filters(block: int) -> np.ndarray:
    """(block, block, 1, block*block) one-hot im2col filter bank."""
    eye = np.zeros((block, block, 1, block * block), np.float32)
    for ky in range(block):
        for kx in range(block):
            eye[ky, kx, 0, ky * block + kx] = 1.0
    return eye


def _patch_tensor(imgs, block):
    """(B, H-b+1, W-b+1, b*b) tensor of all patches, as ONE one-hot VALID
    conv (the hardware's im2col path). A b*b-way ``jnp.stack`` on the last
    axis lowers to a concatenate of (B*hh*ww, 1) columns — measured 5.4 ms
    per call at batch 13 on v5e vs sub-ms for the conv."""
    f = jnp.asarray(_unfold_filters(block), imgs.dtype)
    return jax.lax.conv_general_dilated(
        imgs[..., None],
        f,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=imgs.dtype,
    )


def _gather_groups(imgs, rows, cols, offsets, top_idx, block):
    """Gather (B, nR, nC, K, b*b) patch groups given top-K offset indices.

    One flat gather with *global* indices (batch folded in) from the
    (B*hh*ww, b*b) patch table — avoids batched-gather lowerings entirely.
    (A fused double-width gather for the Wiener stage's basic+noisy pair was
    tried and measured 23% SLOWER on v5e than two 64-wide gathers — the
    wider rows defeat the gather's native lane tiling; keep them separate.)
    """
    b = imgs.shape[0]
    off = jnp.asarray(offsets)[top_idx]  # (B, nR, nC, K, 2)
    py = jnp.clip(
        jnp.asarray(rows)[None, :, None, None] + off[..., 0], 0, imgs.shape[1] - block
    )
    px = jnp.clip(
        jnp.asarray(cols)[None, None, :, None] + off[..., 1], 0, imgs.shape[2] - block
    )
    patches = _patch_tensor(imgs, block)  # (B, hh, ww, b*b)
    hh, ww = patches.shape[1], patches.shape[2]
    flat = patches.reshape(b * hh * ww, block * block)
    batch_off = (jnp.arange(b) * (hh * ww)).reshape(b, 1, 1, 1)
    idx = batch_off + py * ww + px  # (B, nR, nC, K) global indices
    groups = jnp.take(flat, idx, axis=0)  # (B, nR, nC, K, b*b)
    return groups, py, px


def _transform_3d(groups_flat, t3):
    """Forward 3-D transform (2-D DCT per patch x 1-D WHT along the group
    axis) as ONE (K*b*b, K*b*b) matmul on (..., K*b*b)-flattened groups.

    ``t3 = kron(H_K, D2 (x) D2)`` — a single MXU-sized contraction (1024-wide
    for K=16, b=8) instead of three rank-8/16 einsums that tile poorly."""
    return groups_flat @ t3.T


def _itransform_3d(coeffs_flat, t3):
    return coeffs_flat @ t3  # t3 is orthonormal: inverse = transpose


def _unfold_table(table, block, h, w):
    """(B, hh, ww, 2, b, b) patch-position table -> (num, den) images via a
    static unfold-add: one pad-stack-sum (a single fused reduction) —
    ~3x faster than b*b sequential full-image .at[].add updates on v5e."""
    hh, ww = table.shape[1], table.shape[2]
    planes = [
        jnp.pad(
            table[:, :, :, :, ky, kx],
            ((0, 0), (ky, h - hh - ky), (kx, w - ww - kx), (0, 0)),
        )
        for ky in range(block)
        for kx in range(block)
    ]
    out = jnp.sum(jnp.stack(planes), axis=0)  # (B, H, W, 2)
    return out[..., 0], out[..., 1]


def _aggregate(est_groups, weights, py, px, block, h, w, kaiser):
    """Weighted overlap-add of patch estimates into (B, H, W) buffers.

    Two-level structure keeps the data-dependent scatter tiny: one scatter-add
    of contiguous 2*b*b-wide rows (numerator ++ denominator fused) into a
    (B*hh*ww, 2*b*b) patch-position table — 64x fewer scatter indices than a
    per-pixel scatter, and each update is a vector row XLA handles natively —
    followed by a *static* unfold-add (b*b shifted dense adds) back to image
    space.
    """
    # est_groups: (B, nR, nC, K, b*b); weights: (B, nR, nC); py/px: (B, nR, nC, K)
    b = est_groups.shape[0]
    bb = block * block
    hh, ww = h - block + 1, w - block + 1
    dtype = est_groups.dtype
    wk = weights[..., None, None] * kaiser.reshape(-1)  # (B, nR, nC, 1, b*b)
    num_upd = (est_groups * wk).reshape(-1, bb)
    den_upd = jnp.broadcast_to(wk, est_groups.shape).reshape(-1, bb)
    upd = jnp.concatenate([num_upd, den_upd], axis=-1)  # (P, 2*bb)
    batch_off = (jnp.arange(b) * (hh * ww)).reshape(b, 1, 1, 1)
    pidx = (batch_off + py * ww + px).reshape(-1)
    table = jnp.zeros((b * hh * ww, 2 * bb), dtype).at[pidx].add(upd)
    table = table.reshape(b, hh, ww, 2, block, block)
    return _unfold_table(table, block, h, w)


@functools.lru_cache(maxsize=8)
def _clamp_shift_mats(q_list: tuple, n: int) -> np.ndarray:
    """(S, n, n) stack of 0/1 clamp-shift matrices: M[s, t, i] = 1 iff
    clip(i + q_list[s], 0, n-1) == t — the lattice image of
    ``_gather_groups``' coordinate clip for grid-aligned offsets."""
    mats = np.zeros((len(q_list), n, n), np.float32)
    for s, q in enumerate(q_list):
        for i in range(n):
            mats[s, int(np.clip(i + q, 0, n - 1)), i] = 1.0
    return mats


def _aggregate_dense(est_groups, weights, top_idx, offsets, block, step, h, w,
                     kaiser):
    """Scatter-free aggregation for GRID-ALIGNED search offsets.

    Valid only when every offset is a multiple of ``step`` and the reference
    grid is the full regular lattice (``(h - block) % step == 0``): each
    group member then lands on a reference-grid position, so the aggregation
    decomposes into
      1. a one-hot contraction over group slots (``oh[s; idx] @ est`` — an
         MXU matmul, S x K x b*b per reference block) producing per-offset
         dense contribution grids, and
      2. S static clamp-shifted adds of those (nR, nC) grids (``_gather_groups``
         clips member coordinates to the image, which on a regular grid is
         exactly a clamp of the lattice displacement), then one strided
         upsample into the standard patch-position table.
    No data-dependent scatter anywhere — this replaces the profiled hotspot
    of the flagship program (the (P, 2*b*b) scatter-add, 2.4 ms/call at
    batch 13; ``data/flagship_profile_v5e.json``).
    """
    b, nr, nc, k, bb = est_groups.shape
    s = len(offsets)
    hh, ww = h - block + 1, w - block + 1
    dtype = est_groups.dtype
    wk = weights[..., None] * kaiser.reshape(-1)  # (B, nR, nC, b*b)
    # One-hot over the offset axis; contraction over slots k on the MXU.
    oh = (top_idx[..., None] == jnp.arange(s)).astype(dtype)  # (B,nR,nC,K,S)
    c_num = jnp.einsum(
        "bijks,bijkp->bsijp", oh, est_groups,
        preferred_element_type=jnp.float32,
    ) * wk[:, None]  # (B, S, nR, nC, bb)
    cnt = jnp.sum(oh, axis=3)  # (B, nR, nC, S) members per offset
    c_den = cnt.transpose(0, 3, 1, 2)[..., None] * wk[:, None]
    c = jnp.concatenate([c_num, c_den], axis=-1)  # (B, S, nR, nC, 2*bb)
    # Clamp-shifted dense adds on the reference lattice, expressed as tiny
    # static 0/1 shift matrices applied per offset in ONE contraction —
    # border members fold onto the border lattice row/column exactly like
    # ``_gather_groups``' jnp.clip of member coordinates.
    offs = np.asarray(offsets)
    sy = jnp.asarray(_clamp_shift_mats(tuple((offs[:, 0] // step).tolist()), nr))
    sx = jnp.asarray(_clamp_shift_mats(tuple((offs[:, 1] // step).tolist()), nc))
    grid = jnp.einsum(
        "sti,bsijp,suj->btup", sy, c, sx,
        preferred_element_type=jnp.float32,
    )  # (B, nR, nC, 2*bb)
    # Strided upsample onto the per-pixel patch-position table, then the
    # shared static unfold-add.
    table = jnp.zeros((b, hh, ww, 2 * bb), jnp.float32)
    table = table.at[:, ::step, ::step].set(grid)
    table = table.reshape(b, hh, ww, 2, block, block)
    return _unfold_table(table, block, h, w)


@functools.partial(jax.jit, static_argnames=("params", "stages"))
def bm3d_denoise_batch(
    images: jnp.ndarray,
    sigma: jnp.ndarray,
    params: BM3DParams = BM3DParams(),
    stages: int = 2,
    row_valid_bounds: tuple | None = None,
) -> jnp.ndarray:
    """Two-stage BM3D over a (B, H, W) image batch with per-image ``sigma``
    ((B,) or scalar). ``stages=1`` runs hard-thresholding only.
    ``row_valid_bounds``: optional traced (lo, hi) marking rows outside
    [lo, hi) as padding — candidates there are never matched and reference
    blocks there get zero aggregation weight (spatial sharding support)."""
    p = params
    x = images.astype(jnp.float32)
    b, h, w = x.shape
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
    sig_g = sigma[:, None, None]  # per-group-weight broadcast (B, nR, nC)
    sig_c = sigma[:, None, None, None]  # per-coefficient (B, nR, nC, K*bb)

    # rows/cols/offsets stay numpy: static constants baked into the program.
    rows = _ref_grid(h, p.block, p.step)
    cols = _ref_grid(w, p.block, p.step)
    r, ss = p.search, p.search_step
    d1 = (ss * np.arange(-(r // ss), r // ss + 1)).astype(np.int32)
    offsets = np.asarray([(dy, dx) for dy in d1 for dx in d1], np.int32)
    # Grid-aligned search (see BM3DParams.search_step): members land on the
    # reference lattice, enabling the scatter-free dense aggregation.
    dense_agg = (
        ss > 1
        and ss % p.step == 0
        and (h - p.block) % p.step == 0
        and (w - p.block) % p.step == 0
        and row_valid_bounds is None
    )
    d2_np = dct_matrix(p.block)
    d2d_np = np.kron(d2_np, d2_np)  # 2-D DCT on row-major-flattened patches
    kaiser = jnp.asarray(kaiser2d(p.block, p.kaiser_beta))
    bb = p.block * p.block

    # Reference blocks fully inside [lo, hi) when bounds are given; phantom
    # refs (in spatial-shard halo padding) get zero aggregation weight.
    if row_valid_bounds is not None:
        lo, hi = row_valid_bounds
        ref_valid = ((jnp.asarray(rows) >= lo) & (jnp.asarray(rows) <= hi - p.block))
        ref_w = ref_valid.astype(jnp.float32)[None, :, None]  # (1, nR, 1)
    else:
        ref_w = 1.0

    # Matching engine selection: the Pallas kernel covers the standard
    # (unbounded) path; row-sharded bounds keep the XLA matcher.
    # "auto" is evidence-based: the fused kernel wins only when the offset
    # set is small (measured crossover on v5e: 0.64 ms at S=81 vs the XLA
    # matcher's 2.78 ms at S=289, but 3.69 ms Pallas at S=289 —
    # data/bm3d_pallas_v5e.json + data/flagship_profile_turbo_v5e.json).
    use_pallas_match = row_valid_bounds is None and (
        p.matcher in ("pallas", "pallas_interpret")
        or (
            p.matcher == "auto"
            and jax.default_backend() == "tpu"
            and len(offsets) <= 128
        )
    )

    def match(imgs, group_k):
        if use_pallas_match:
            from pnp_svrg_tpu.ops.pallas.bm3d_match import bm3d_match_pallas

            return bm3d_match_pallas(
                imgs,
                tuple(rows.tolist()),
                tuple(cols.tolist()),
                tuple(map(tuple, offsets.tolist())),
                p.block,
                group_k,
                match_dtype=p.match_dtype,
                interpret=p.matcher == "pallas_interpret",
            )
        dists = _match_distances(
            imgs, rows, cols, offsets, p.block,
            row_valid_bounds=row_valid_bounds, match_dtype=p.match_dtype,
        )
        return _top_k_offsets(dists, group_k, p.topk)

    # ---- Stage 1: hard thresholding --------------------------------------
    t3_ht = jnp.asarray(np.kron(hadamard_matrix(p.group_ht), d2d_np))
    top_idx = match(x, p.group_ht)
    groups, py, px = _gather_groups(x, rows, cols, offsets, top_idx, p.block)
    coeffs = _transform_3d(groups.reshape(*groups.shape[:3], -1), t3_ht)
    keep = jnp.abs(coeffs) > p.lam * sig_c
    coeffs_ht = jnp.where(keep, coeffs, 0.0)
    n_kept = jnp.maximum(jnp.sum(keep, axis=-1), 1).astype(jnp.float32)
    est = _itransform_3d(coeffs_ht, t3_ht).reshape(*groups.shape[:3], -1, bb)
    wgt = ref_w / (sig_g * sig_g * n_kept + 1e-12)
    if dense_agg:
        num, den = _aggregate_dense(
            est, wgt, top_idx, offsets, p.block, p.step, h, w, kaiser
        )
    else:
        num, den = _aggregate(est, wgt, py, px, p.block, h, w, kaiser)
    basic = num / jnp.maximum(den, 1e-12)

    if stages == 1:
        return basic

    # ---- Stage 2: Wiener filtering with the basic estimate as pilot ------
    t3_w = jnp.asarray(np.kron(hadamard_matrix(p.group_wie), d2d_np))
    top_idx2 = match(basic, p.group_wie)
    g_basic, py2, px2 = _gather_groups(basic, rows, cols, offsets, top_idx2, p.block)
    g_noisy, _, _ = _gather_groups(x, rows, cols, offsets, top_idx2, p.block)
    c_basic = _transform_3d(g_basic.reshape(*g_basic.shape[:3], -1), t3_w)
    c_noisy = _transform_3d(g_noisy.reshape(*g_noisy.shape[:3], -1), t3_w)
    wien = c_basic**2 / (c_basic**2 + sig_c * sig_c + 1e-12)
    est2 = _itransform_3d(wien * c_noisy, t3_w).reshape(*g_basic.shape[:3], -1, bb)
    wgt2 = ref_w / (sig_g * sig_g * jnp.sum(wien**2, axis=-1) + 1e-12)
    if dense_agg:
        num2, den2 = _aggregate_dense(
            est2, wgt2, top_idx2, offsets, p.block, p.step, h, w, kaiser
        )
    else:
        num2, den2 = _aggregate(est2, wgt2, py2, px2, p.block, h, w, kaiser)
    return num2 / jnp.maximum(den2, 1e-12)


@functools.partial(jax.jit, static_argnames=("params", "stages"))
def bm3d_denoise(
    image: jnp.ndarray,
    sigma: jnp.ndarray,
    params: BM3DParams = BM3DParams(),
    stages: int = 2,
    row_valid_bounds: tuple | None = None,
) -> jnp.ndarray:
    """Two-stage BM3D of a single (H, W) image (batch-of-one fast path)."""
    return bm3d_denoise_batch(
        image[None], sigma, params=params, stages=stages,
        row_valid_bounds=row_valid_bounds,
    )[0]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["denoise_strength", "sigma_modifier", "decay"],
    meta_fields=["params", "stages"],
)
@dataclasses.dataclass(frozen=True)
class BM3DDenoiser:
    """PnP denoiser wrapper with the reference sigma-selection contract
    (reference ``denoisers/BM3D.py:20-25``): ``sigma_modifier * sigma_est``
    when an estimate is supplied, else ``denoise_strength * decay**t``.

    ``denoise`` accepts (H, W) or (B, H, W) input; batched input routes to
    the natively-batched kernel (prefer passing the batch in over vmapping
    this denoiser — see module docstring).
    """

    denoise_strength: jnp.ndarray = 0.0
    sigma_modifier: jnp.ndarray = 1.0
    decay: jnp.ndarray = 1.0
    params: BM3DParams = BM3DParams()
    stages: int = 2

    def denoise(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        sigma_est = jnp.asarray(sigma_est, x.dtype)
        sigma = jnp.where(
            sigma_est > 0,
            sigma_est * self.sigma_modifier,
            self.denoise_strength * self.decay**t,
        )
        if x.ndim == 3:
            return bm3d_denoise_batch(x, sigma, params=self.params, stages=self.stages)
        return bm3d_denoise(x, sigma, params=self.params, stages=self.stages)

    def denoise_bounded(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray, t: jnp.ndarray,
        row_valid_bounds: tuple,
    ) -> jnp.ndarray:
        """Same denoise step restricted to in-image candidate rows — the
        row-sharded spatial path (``parallel/spatial.py``) hands each shard
        its halo-extended block plus the (lo, hi) in-image bounds."""
        sigma_est = jnp.asarray(sigma_est, x.dtype)
        sigma = jnp.where(
            sigma_est > 0,
            sigma_est * self.sigma_modifier,
            self.denoise_strength * self.decay**t,
        )
        xb = x if x.ndim == 3 else x[None]
        out = bm3d_denoise_batch(
            xb, sigma, params=self.params, stages=self.stages,
            row_valid_bounds=row_valid_bounds,
        )
        return out if x.ndim == 3 else out[0]

    def spatial_halo(self) -> int:
        """Dependency radius in rows for row-sharded denoising: each stage's
        output is exact only (search + block) rows inside the halo and the
        Wiener stage re-matches on the stage-1 estimate, so the halo
        compounds per stage; rounded up to the reference-grid step so
        per-shard grids align with the global one."""
        halo = self.stages * (self.params.search + self.params.block)
        return halo + (-halo) % self.params.step
