"""Fixed-shape minibatch sampling under jit.

The reference samples measurement minibatches with ``np.random.choice(...,
replace=False)`` into a 0/1 indicator (reference ``problems/problem.py:110-117``
and the mask-restricted CSMRI variant ``problems/CSMRI.py:66-74``). Under XLA
we need static shapes and a threaded PRNG, so sampling-without-replacement is
done with the Gumbel top-k trick: draw one uniform key per candidate, restrict
to allowed positions, take the top ``k``. This is exact uniform sampling
without replacement and compiles to a single fused kernel.

Mask construction is scatter-free: the k selected positions are recovered by
comparing every score against the k-th largest (TPU scatters serialize,
especially with leading batch axes; a top_k + elementwise compare does not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n", "k"))
def sample_k_indices(
    key: jax.Array, n: int, k: int, allowed: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Sample ``k`` distinct indices uniformly from ``range(n)``.

    ``allowed``: optional boolean/0-1 vector of length n restricting the
    candidate set (must contain >= k true entries; violations silently return
    disallowed indices, mirroring numpy's error case).
    """
    g = jax.random.uniform(key, (n,))
    if allowed is not None:
        g = jnp.where(allowed.ravel() > 0, g, -1.0)
    _, idx = jax.lax.top_k(g, k)
    return idx


@functools.partial(jax.jit, static_argnames=("k", "shape"))
def sample_k_mask(
    key: jax.Array, shape: tuple, k: int, allowed: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Sample a 0/1 float mask of ``shape`` with exactly ``k`` ones.

    Scatter-free: mask = (score >= k-th largest score). Uniform scores are
    almost-surely distinct, so exactly k positions pass.
    """
    n = 1
    for s in shape:
        n *= s
    g = jax.random.uniform(key, (n,))
    if allowed is not None:
        g = jnp.where(allowed.ravel() > 0, g, -1.0)
    vals, _ = jax.lax.top_k(g, k)
    thr = vals[-1]
    mask = (g >= thr) & (g >= 0)
    return mask.astype(jnp.float32).reshape(shape)
