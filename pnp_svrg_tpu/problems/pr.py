"""Phase retrieval from Gaussian magnitude measurements.

TPU-native re-design of the reference PhaseRetrieval problem
(``problems/PR.py``):

* ``A`` is an (M, N) dense Gaussian matrix; ``y = |A x| + noise`` (reference
  ``PR.py:26-34,66-68``). All products run on the MXU via ``jnp.dot`` in
  float32 (optionally bfloat16 inputs with f32 accumulation); row-sharding
  ``A`` over the mesh ``meas`` axis is the scaling path (``parallel/``).
* Spectral initialization: power iteration on ``D = A^T diag(y) A / M``
  without materializing D — each step is two MXU matmuls — as a
  ``lax.while_loop`` with the reference's tolerance 1e-5 and max-element
  normalization, then rescale to ||x|| and min-max normalize (reference
  ``PR.py:50-63,38``).
* Amplitude-loss gradients: ``grad_full = A^T(((|Aw|-y)/|Aw|) * Aw) / M``
  (reference ``PR.py:75-79``); ``grad_stoch`` gathers minibatch rows of A and
  returns the unnormalized sum (reference ``PR.py:81-87``).

Minibatches here are index vectors (fixed size k) rather than 0/1 masks:
gathering k rows keeps the stochastic-gradient matmul (k, N) — far less work
than masking all M rows, and exactly equivalent.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp

from pnp_svrg_tpu.core.problem import minmax_normalize, resolve_noise
from pnp_svrg_tpu.ops.metrics import psnr
from pnp_svrg_tpu.ops.sampling import sample_k_indices


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MXU dot with at-least-f32 accumulation; preserves f64 inputs (the
    gradient checkers re-run the problem widened to float64)."""
    pet = jnp.promote_types(jnp.result_type(a, b), jnp.float32)
    return jnp.dot(a, b, preferred_element_type=pet)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "y", "x", "x_init", "snr", "sigma"],
    meta_fields=["h", "w", "num_meas"],
)
@dataclasses.dataclass(frozen=True)
class PhaseRetrieval:
    """Phase retrieval problem instance (pytree)."""

    a: jnp.ndarray  # float32 (M, N), Gaussian measurement matrix
    y: jnp.ndarray  # float32 (M,), noisy magnitudes
    x: jnp.ndarray  # float32 (H, W), ground truth
    x_init: jnp.ndarray  # float32 (H, W), spectral init
    snr: jnp.ndarray = 0.0
    sigma: jnp.ndarray = 0.0
    h: int = 0
    w: int = 0
    num_meas: int = 0

    @property
    def n(self) -> int:
        return self.h * self.w

    @property
    def m(self) -> int:
        return self.num_meas

    def forward(self, z: jnp.ndarray) -> jnp.ndarray:
        return jnp.abs(_dot(self.a, z.ravel()))

    def f(self, z: jnp.ndarray) -> jnp.ndarray:
        r = self.y - self.forward(z)
        return jnp.sum(r * r) / (2.0 * self.m)

    def _amplitude_grad(self, a_rows: jnp.ndarray, y_rows: jnp.ndarray, z) -> jnp.ndarray:
        w = z.ravel()
        t = _dot(a_rows, w)
        at = jnp.abs(t)
        weight = (at - y_rows) / at
        return _dot(a_rows.T, weight * t)

    def grad_full(self, z: jnp.ndarray) -> jnp.ndarray:
        return self._amplitude_grad(self.a, self.y, z) / self.m

    def grad_stoch(self, z: jnp.ndarray, mb: jnp.ndarray) -> jnp.ndarray:
        """Unnormalized minibatch gradient; ``mb`` is an int32 (k,) index vector."""
        return self._amplitude_grad(self.a[mb], self.y[mb], z)

    def select_mb(self, key: jax.Array, k: int) -> jnp.ndarray:
        return sample_k_indices(key, self.m, k)

    def full_mb(self) -> jnp.ndarray:
        """The all-measurements minibatch (every row of A)."""
        return jnp.arange(self.m, dtype=jnp.int32)

    def m_total(self) -> int:
        """Normalizer turning ``grad_stoch(z, full_mb())`` into ``grad_full``."""
        return self.m

    def psnr(self, z: jnp.ndarray) -> jnp.ndarray:
        return psnr(self.x, z.reshape(self.h, self.w))


def spectral_init(
    a: jnp.ndarray, y: jnp.ndarray, x_norm: jnp.ndarray, tol: float = 1e-5
) -> jnp.ndarray:
    """Power iteration on D = A^T diag(y) A / M, matrix-free.

    Mirrors the reference loop (``PR.py:50-63``): iterate ``v <- D v``,
    normalize by the max element, stop when both the max-eigenvalue estimate
    and the iterate are stationary within ``tol``; rescale by sqrt(m-est) and
    to the ground-truth norm.
    """
    m = a.shape[0]
    n = a.shape[1]

    def dv(v):
        av = _dot(a, v)
        return _dot(a.T, y * av) / m

    def cond(state):
        v, v_old, mu, mu_old, it = state
        return jnp.logical_and(
            jnp.logical_and(
                jnp.abs(mu - mu_old) > tol, jnp.linalg.norm(v - v_old) > tol
            ),
            it < 10_000,
        )

    def body(state):
        v, _, mu, _, it = state
        v_new = dv(v)
        mu_new = jnp.max(v_new)
        return v_new / mu_new, v, mu_new, mu, it + 1

    v0 = 2.0 * jnp.ones((n,), jnp.float32)
    v_old0 = jnp.ones((n,), jnp.float32)
    v, _, mu, _, _ = jax.lax.while_loop(
        cond, body, (v0, v_old0, jnp.asarray(1.0), jnp.asarray(2.0), 0)
    )
    return jnp.sqrt(mu) * v / jnp.linalg.norm(v) * x_norm


def make_phase_retrieval(
    key: jax.Array,
    image: jnp.ndarray,
    num_meas: int,
    snr: float | None = None,
    sigma: float | None = None,
) -> PhaseRetrieval:
    """Construct a PhaseRetrieval instance (reference ``PR.py:13-48``)."""
    x = jnp.asarray(image, jnp.float32)
    h, w = x.shape
    n = h * w
    k_a, k_noise = jax.random.split(key)
    a = jax.random.normal(k_a, (num_meas, n), jnp.float32)
    y0 = jnp.abs(_dot(a, x.ravel()))
    snr_out, sig = resolve_noise(y0, h, w, snr, sigma)
    y = y0 + sig * jax.random.normal(k_noise, y0.shape)
    xi = spectral_init(a, y, jnp.linalg.norm(x.ravel()))
    x_init = minmax_normalize(xi).reshape(h, w)
    return PhaseRetrieval(
        a=a,
        y=y.astype(jnp.float32),
        x=x,
        x_init=x_init.astype(jnp.float32),
        snr=jnp.asarray(float(snr_out), jnp.float32),
        sigma=jnp.asarray(float(sig), jnp.float32),
        h=h,
        w=w,
        num_meas=num_meas,
    )
