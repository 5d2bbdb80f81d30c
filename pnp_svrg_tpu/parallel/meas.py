"""Measurement-parallel PnP: the five scan loops under a (batch, meas) mesh.

This is the SPMD promise of SURVEY.md §2.10: full-gradient snapshots in
SVRG/SARAH (reference ``pnp_svrg.py:32``), SAGA table refreshes, and every
stochastic gradient become shard-local partial sums reduced with one ``psum``
over the mesh ``meas`` axis — an ICI allreduce — while the image state stays
replicated across ``meas`` and data-parallel across ``batch``.

Design
------
Each problem family partitions its measurement set into ``n`` disjoint blocks
(:func:`split_meas`):

* ``PhaseRetrieval`` — A's rows are *physically* split (reference
  ``PR.py:26``: the (M, N) Gaussian matrix is the one genuinely large
  measurement operand), so each shard's matmuls run on 1/n of the rows.
* ``CSMRI`` — the 0/1 Fourier sampling mask is split into row blocks
  (reference ``CSMRI.py:43-45``); each shard keeps full-size (H, W) arrays
  (the FFT needs the full grid) but owns a disjoint set of sampled
  coefficients, so residuals partition exactly.
* ``Deblur`` — the low-res measurement pixels are split via the ``allowed``
  ownership mask (reference ``DeblurSR.py:134-147`` minibatch indices).

:class:`MeasShardedBatched` then re-exposes the single-problem protocol with
collective semantics, built on the algebraic identities every problem
provides: ``grad_full == psum(grad_stoch(z, full_mb_local)) / psum(m_total)``
(gradients are unnormalized minibatch *sums*, reference ``CSMRI.py:83-89``)
and ``f == psum(2 m_local f_local) / (2 m_global)``.

The same wrapper code runs under ``jax.shard_map`` on a real device mesh and
under ``jax.vmap(..., axis_name="meas")`` on a single device — the two
execute identical programs (vmap's psum is an ordinary sum over the mapped
axis), which is how the test suite proves the distributed path equals the
single-device path without needing hardware.

Minibatch sampling is *stratified*: each shard draws ``k / n`` measurements
uniformly without replacement from its own block (keys forked per shard via
``fold_in(axis_index)``). Global uniform-without-replacement sampling would
need a cross-shard top-k; stratified sampling keeps the estimator unbiased
(every measurement is equally likely) and is the standard SPMD design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pnp_svrg_tpu.core.batched import BatchedProblem
from pnp_svrg_tpu.parallel.mesh import BATCH_AXIS, MEAS_AXIS
from pnp_svrg_tpu.problems.csmri import CSMRI
from pnp_svrg_tpu.problems.deblur import Deblur
from pnp_svrg_tpu.problems.pr import PhaseRetrieval


# ---------------------------------------------------------------------------
# Measurement splitting (host-side, per problem family)
# ---------------------------------------------------------------------------


def _tile(arr, n):
    return jnp.broadcast_to(arr[None], (n,) + arr.shape)


def split_meas(problems, n: int):
    """Split a stacked problem pytree (leading batch axis on data fields)
    into ``n`` measurement shards: every data leaf gains a leading axis of
    size ``n`` (disjoint measurement blocks for measurement-like fields,
    broadcast copies for replicated fields)."""
    if n < 1:
        raise ValueError(f"need n >= 1 shards, got {n}")
    if isinstance(problems, BatchedProblem):
        problems = problems.problems
    if isinstance(problems, CSMRI):
        return _split_csmri(problems, n)
    if isinstance(problems, PhaseRetrieval):
        return _split_pr(problems, n)
    if isinstance(problems, Deblur):
        return _split_deblur(problems, n)
    raise TypeError(f"no measurement split for {type(problems).__name__}")


def _row_blocks(rows: int, n: int) -> jnp.ndarray:
    """(n, rows) 0/1 ownership masks over contiguous row blocks."""
    if rows % n:
        raise ValueError(f"{rows} rows not divisible by {n} meas shards")
    blk = rows // n
    owner = np.repeat(np.arange(n), blk)
    return jnp.asarray(owner[None, :] == np.arange(n)[:, None], jnp.float32)


def _split_csmri(p: CSMRI, n: int) -> CSMRI:
    """Row-block split of the Fourier sampling mask (full-size arrays,
    disjoint ownership — the FFT gradient needs the whole grid anyway)."""
    rb = _row_blocks(p.h, n)  # (n, H)
    sel = rb[:, None, :, None]  # (n, 1, H, 1) against (B, H, W)
    mask = p.mask[None] * sel
    return CSMRI(
        y=p.y[None] * sel.astype(p.y.dtype),
        mask=mask,
        x=_tile(p.x, n),
        x_init=_tile(p.x_init, n),
        m0=jnp.sum(mask, axis=(-1, -2)),
        snr=_tile(p.snr, n),
        sigma=_tile(p.sigma, n),
        h=p.h,
        w=p.w,
    )


def _split_pr(p: PhaseRetrieval, n: int) -> PhaseRetrieval:
    """Physical row split of the dense (M, N) measurement matrix."""
    m = p.num_meas
    if m % n:
        raise ValueError(f"{m} measurement rows not divisible by {n} shards")
    bsz = p.a.shape[0]
    a = p.a.reshape(bsz, n, m // n, p.a.shape[-1]).transpose(1, 0, 2, 3)
    y = p.y.reshape(bsz, n, m // n).transpose(1, 0, 2)
    return PhaseRetrieval(
        a=a,
        y=y,
        x=_tile(p.x, n),
        x_init=_tile(p.x_init, n),
        snr=_tile(p.snr, n),
        sigma=_tile(p.sigma, n),
        h=p.h,
        w=p.w,
        num_meas=m // n,
    )


def _split_deblur(p: Deblur, n: int) -> Deblur:
    """Ownership split of the low-res measurement pixels via ``allowed``."""
    m = p.lr_h * p.lr_w
    blocks = _row_blocks(m, n)  # (n, M)
    return Deblur(
        y=_tile(p.y, n),
        b=_tile(p.b, n),
        b_adj=_tile(p.b_adj, n),
        x=_tile(p.x, n),
        x_init=_tile(p.x_init, n),
        ds_idx=_tile(p.ds_idx, n),
        ds_w=_tile(p.ds_w, n),
        allowed=p.allowed[None] * blocks[:, None, :],
        snr=_tile(p.snr, n),
        sigma=_tile(p.sigma, n),
        h=p.h,
        w=p.w,
        lr_h=p.lr_h,
        lr_w=p.lr_w,
    )


# ---------------------------------------------------------------------------
# The collective problem wrapper
# ---------------------------------------------------------------------------


def _axis_index_or_zero(name: str):
    """axis_index when ``name`` is bound (shard_map over that axis), else 0
    (the axis is unsharded, e.g. the vmap emulation only binds ``meas``)."""
    try:
        return jax.lax.axis_index(name)
    except NameError:
        return jnp.asarray(0, jnp.int32)


class MeasShardedBatched:
    """A :class:`BatchedProblem` over one measurement shard, speaking the
    full-problem protocol via ``psum`` over the ``meas`` mesh axis.

    Handed to the unmodified scan loops (``algorithms/loops.py``), this makes
    ``grad_full`` snapshots (SVRG ``pnp_svrg.py:32``, SARAH ``pnp_sarah.py:
    31``), SAGA table entries, and stochastic gradients real cross-shard
    allreduces while z/denoising stay replicated along ``meas``.
    """

    def __init__(self, inner: BatchedProblem, n_shards: int, f_den: float,
                 axis: str = MEAS_AXIS):
        self.inner = inner
        self.n_shards = n_shards
        self.f_den = f_den  # 2 * global m (f's normalizer, shard-invariant)
        self.axis = axis

    # -- replicated delegates -----------------------------------------------
    @property
    def h(self):
        return self.inner.h

    @property
    def w(self):
        return self.inner.w

    @property
    def n(self):
        return self.inner.n

    @property
    def batch_size(self):
        return self.inner.batch_size

    @property
    def x(self):
        return self.inner.x

    @property
    def x_init(self):
        return self.inner.x_init

    def psnr(self, z):
        return self.inner.psnr(z)

    # -- collective measurement ops -----------------------------------------
    def grad_full(self, z):
        """psum of shard-local unnormalized full-block gradients / global M —
        the distributed form of the reference's snapshot ``grad_full``."""
        g = self.inner.grad_stoch(z, self.inner.full_mb())
        g = jax.lax.psum(g, self.axis)
        m_tot = jax.lax.psum(self.inner.m_total(), self.axis)  # (B,)
        return g / m_tot.reshape(m_tot.shape + (1,) * (g.ndim - m_tot.ndim))

    def grad_stoch(self, z, mb):
        """Shard-local minibatch sums allreduced; with stratified ``select_mb``
        the psum totals exactly ``k`` measurement terms, so the loops'
        ``/ mini_batch_size`` normalization is unchanged."""
        return jax.lax.psum(self.inner.grad_stoch(z, mb), self.axis)

    def select_mb(self, key, k: int):
        if k % self.n_shards:
            raise ValueError(
                f"mini_batch_size {k} not divisible by {self.n_shards} meas shards"
            )
        key = jax.random.fold_in(key, jax.lax.axis_index(self.axis))
        # Per-lane keys are derived from *global* lane ids so the sampled
        # minibatches do not depend on how the batch axis is laid out across
        # devices (shard_map on a mesh == vmap emulation, lane for lane).
        b_local = self.batch_size
        lanes = _axis_index_or_zero(BATCH_AXIS) * b_local + jnp.arange(b_local)
        keys = jax.vmap(lambda l: jax.random.fold_in(key, l))(lanes)
        k_local = k // self.n_shards
        return jax.vmap(lambda p, kk: p.select_mb(kk, k_local))(
            self.inner.problems, keys
        )

    def f(self, z):
        """Global data-fidelity: shard f values carry local normalizers
        (1 / 2 m_local); rescale, psum the residual sums, renormalize."""
        local = self.inner.f(z) * (2.0 * self.inner.m)
        return jax.lax.psum(local, self.axis) / self.f_den


jax.tree_util.register_pytree_node(
    MeasShardedBatched,
    lambda sp: ((sp.inner,), (sp.n_shards, sp.f_den, sp.axis)),
    lambda aux, ch: MeasShardedBatched(ch[0], *aux),
)


# ---------------------------------------------------------------------------
# Runners: shard_map on a mesh / vmap(axis_name) on one device
# ---------------------------------------------------------------------------


def _meas_specs(split_tree):
    """Uniform PartitionSpec tree: leading meas axis, then batch, rest
    replicated."""
    return jax.tree_util.tree_map(
        lambda leaf: P(MEAS_AXIS, BATCH_AXIS, *([None] * (leaf.ndim - 2))),
        split_tree,
    )


_OUT_KEYS = ("z", "image", "psnr_per_iter", "final_psnr")


def _local_runner(fn, denoiser, n_meas, f_den, hp, squeeze: bool):
    """Body shared by the shard_map and vmap execution paths."""

    def local_run(local_tree, key):
        if squeeze:  # shard_map blocks keep a unit leading meas axis
            local_tree = jax.tree_util.tree_map(lambda l: l[0], local_tree)
        sp = MeasShardedBatched(BatchedProblem(local_tree), n_meas, f_den)
        out = fn(sp, denoiser, key=key, **hp)
        return {k: out[k] for k in _OUT_KEYS}

    return local_run


def run_batch_meas_sharded(fn, batched_problem, denoiser, key, mesh, **hp):
    """Run one PnP scan loop SPMD over a (batch, meas) mesh.

    The whole fixed-iteration loop — snapshots, inner steps, denoising,
    logging — executes inside one ``shard_map``; every gradient reduction is
    a compiled XLA collective over the ``meas`` axis.
    """
    n_meas = mesh.shape[MEAS_AXIS]
    f_den = 2.0 * batched_problem.m
    split = split_meas(batched_problem, n_meas)
    out_specs = {
        "z": P(BATCH_AXIS, None),
        "image": P(BATCH_AXIS, None, None),
        "psnr_per_iter": P(None, BATCH_AXIS),
        "final_psnr": P(BATCH_AXIS),
    }
    runner = jax.shard_map(
        _local_runner(fn, denoiser, n_meas, f_den, hp, squeeze=True),
        mesh=mesh,
        in_specs=(_meas_specs(split), P()),
        out_specs=out_specs,
        check_vma=False,  # z is replicated along meas by construction (psum'd
        # gradients + deterministic denoisers); the static checker can't see it
    )
    return runner(split, key)


def run_batch_meas_emulated(fn, batched_problem, denoiser, key, n_meas, **hp):
    """Single-device execution of the *same* measurement-sharded program:
    ``vmap`` with ``axis_name="meas"`` turns every psum into an ordinary sum
    over the shard axis. Used to validate the mesh path (tests) and to run
    meas-stratified sampling without hardware."""
    f_den = 2.0 * batched_problem.m
    split = split_meas(batched_problem, n_meas)
    local = _local_runner(fn, denoiser, n_meas, f_den, hp, squeeze=False)
    out = jax.vmap(local, in_axes=(0, None), axis_name=MEAS_AXIS)(split, key)
    # Every shard returns the identical replicated result; take shard 0.
    return jax.tree_util.tree_map(lambda l: l[0], out)
