"""Batched problem adapter: one pytree, B images, the same protocol.

Wraps a stacked problem pytree (leading batch axis on every data field) and
exposes the single-problem protocol with vmapped gradient/metric methods and
split-key minibatch sampling. The PnP loops in ``algorithms/loops.py`` are
batch-polymorphic: handed a ``BatchedProblem`` they carry (B, N) state, log
(iters, B) traces, latch convergence per image — and call the *denoiser*
once per step with the full (B, H, W) stack, which routes BM3D/NLM/CNN
denoisers into their natively-batched kernels instead of pathological
vmapped gather/scatter lowerings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# Literal of parallel.mesh.BATCH_AXIS (importing it would cycle through the
# parallel package __init__, which imports this module).
_BATCH_AXIS = "batch"


def _axis_index_or_zero(name: str):
    """axis_index when ``name`` is bound (the loop runs under a shard_map
    that shards the batch axis), else 0 (unsharded / GSPMD execution)."""
    try:
        return jax.lax.axis_index(name)
    except NameError:
        return jnp.asarray(0, jnp.int32)


class BatchedProblem:
    """Stacked problems behind the single-problem duck-typed interface."""

    def __init__(self, problems):
        self.problems = problems

    @property
    def batch_size(self) -> int:
        return jax.tree_util.tree_leaves(self.problems)[0].shape[0]

    @property
    def h(self) -> int:
        return self.problems.h

    @property
    def w(self) -> int:
        return self.problems.w

    @property
    def n(self) -> int:
        return self.problems.h * self.problems.w

    @property
    def m(self) -> int:
        return self.problems.m

    @property
    def x_init(self) -> jnp.ndarray:
        return self.problems.x_init  # (B, H, W)

    @property
    def x(self) -> jnp.ndarray:
        return self.problems.x

    def psnr(self, z: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(lambda p, zi: p.psnr(zi))(self.problems, z)

    def f(self, z: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(lambda p, zi: p.f(zi))(self.problems, z)

    def grad_full(self, z: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(lambda p, zi: p.grad_full(zi))(self.problems, z)

    def grad_stoch(self, z: jnp.ndarray, mb) -> jnp.ndarray:
        return jax.vmap(lambda p, zi, mi: p.grad_stoch(zi, mi))(
            self.problems, z, mb
        )

    def select_mb(self, key: jax.Array, k: int):
        # Per-lane keys come from *global* lane ids so sampling does not
        # depend on how the batch axis is laid out: under a batch-sharded
        # shard_map each device sees only its local lanes, and splitting by
        # the local batch size would hand every device's lanes the same keys
        # (split(key, n)[i] is stable in n). Matches MeasShardedBatched.
        b_local = self.batch_size
        lanes = _axis_index_or_zero(_BATCH_AXIS) * b_local + jnp.arange(b_local)
        keys = jax.vmap(lambda l: jax.random.fold_in(key, l))(lanes)
        return jax.vmap(lambda p, kk: p.select_mb(kk, k))(self.problems, keys)

    def full_mb(self):
        """Per-lane all-measurements minibatch (stacked on the batch axis)."""
        return jax.vmap(lambda p: p.full_mb())(self.problems)

    def m_total(self) -> jnp.ndarray:
        """(B,) float normalizers: grad_stoch(z, full_mb()) / m_total == grad_full."""
        return jax.vmap(
            lambda p: jnp.asarray(p.m_total(), jnp.float32)
        )(self.problems)


jax.tree_util.register_pytree_node(
    BatchedProblem,
    lambda bp: ((bp.problems,), None),
    lambda aux, children: BatchedProblem(children[0]),
)


def stack_problems(problems):
    """Stack same-shape problem pytrees into a :class:`BatchedProblem`."""
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *problems)
    return BatchedProblem(stacked)
