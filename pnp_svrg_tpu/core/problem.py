"""Problem protocol and shared construction helpers.

A *problem* is an immutable pytree dataclass bundling the measured data and
ground truth for one inverse problem instance, consumed by pure functions:

* ``forward(problem, z)``      — the measurement operator
* ``f(problem, z)``            — data-fidelity loss
* ``grad_full(problem, z)``    — full data gradient
* ``grad_stoch(problem, z, mb)`` — *unnormalized* minibatch gradient (the sum
  over selected measurements; algorithms divide by the minibatch size, the
  same contract as the reference, ``problems/CSMRI.py:83-89``)
* ``select_mb(problem, key, k)`` — fixed-shape minibatch sampling

Each concrete problem module implements these as methods on its dataclass so
they vmap/shard over stacked problem batches.

SNR <-> sigma uses the reference's (nonstandard but behavior-defining) formula
``SNR_lin = ||Y0||_F / sigma^2 / H / W`` (reference ``problems/problem.py:48-61``
— note the norm is *not* squared). We reproduce it so that "SNR 10 dB"
configures the same noise level as the paper experiments.
"""

from __future__ import annotations

import jax.numpy as jnp


def minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Affinely map an array onto [0, 1] (reference ``problem.py:23``)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo)


def snr_to_sigma(snr_db: float, y0: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Noise sigma for a target SNR in dB (reference formula, ``problem.py:58-61``)."""
    snr_lin = 10.0 ** (snr_db / 10.0)
    return jnp.sqrt(jnp.linalg.norm(y0.ravel()) / snr_lin / h / w)


def sigma_to_snr(sigma: jnp.ndarray, y0: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """SNR in dB from sigma (reference formula, ``problem.py:48-52``)."""
    snr_lin = jnp.linalg.norm(y0.ravel()) / (sigma * sigma) / h / w
    return 10.0 * jnp.log10(snr_lin)


def resolve_noise(
    y0: jnp.ndarray, h: int, w: int, snr: float | None, sigma: float | None
):
    """Resolve the (snr, sigma) pair the way the reference does
    (``problem.py:37-46``): exactly one may be given; neither means noiseless."""
    if snr is not None and sigma is None:
        sig = snr_to_sigma(snr, y0, h, w)
        return snr, sig
    if sigma is not None and snr is None:
        return float(sigma_to_snr(jnp.asarray(sigma), y0, h, w)), jnp.asarray(sigma)
    if snr is None and sigma is None:
        return 1e10, jnp.asarray(0.0)
    raise ValueError("specify either snr or sigma, not both")
