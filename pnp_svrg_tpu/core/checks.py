"""Numerical gradient checkers — the library-level port of the reference's
embedded verification methods ``Problem.grad_full_check`` (finite-difference
vs analytic gradient, reference ``problems/problem.py:131-155``) and
``Problem.grad_stoch_check`` (stochastic-gradient unbiasedness identity,
reference ``problems/problem.py:157-175``).

TPU-native reformulation: instead of perturbing all N coordinates one at a
time (O(N) forward passes in the reference), ``grad_full_check`` verifies K
random *directional* derivatives — ``<grad, d> == (f(z+eps d) - f(z-eps d)) /
(2 eps)`` — which catches the same scaling/sign/transpose bugs with K jitted
evaluations, and the unbiasedness check exploits linearity of every
``grad_stoch`` in its minibatch indicator: ``grad_stoch(z, 1) / M ==
grad_full(z)`` is exactly the reference's "sum of all singleton stochastic
gradients / M" identity without the M-term Python loop.

Both return the max abs error and raise ``GradientCheckError`` beyond ``tol``
so they can serve as runtime assertions *and* pytest properties
(SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class GradientCheckError(AssertionError):
    """Analytic gradient disagrees with its numerical check."""


def _flat(problem, z):
    return jnp.asarray(z).reshape(-1)


def _widen(tree):
    """Cast a problem pytree (or array) to float64/complex128 — central
    differences of the data-fidelity term cancel catastrophically in f32
    (f is O(100), the directional signal is O(1e-6))."""

    def cast(a):
        a = jnp.asarray(a)
        if jnp.issubdtype(a.dtype, jnp.complexfloating):
            return a.astype(jnp.complex128)
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(jnp.float64)
        return a

    try:
        return jax.tree_util.tree_map(cast, tree)
    except (TypeError, ValueError):
        # Not a pytree of arrays (e.g. a duck-typed problem object): x64
        # promotion still kicks in through the perturbation direction.
        return tree


def grad_full_check(
    problem,
    z=None,
    key: jax.Array | None = None,
    eps: float = 1e-6,
    tol: float = 1e-4,
    n_dirs: int = 8,
    raise_on_fail: bool = True,
) -> float:
    """Directional finite-difference check of ``problem.grad_full``.

    For ``n_dirs`` random unit directions d, compares ``<grad_full(z), d>``
    against the central difference of ``problem.f``, evaluated in float64
    (the reference checker runs in numpy f64 with the same eps/tol,
    ``problems/problem.py:131-155``). Returns the max error relative to the
    gradient scale; raises :class:`GradientCheckError` beyond ``tol``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    with jax.enable_x64():
        p64 = _widen(problem)
        z64 = _widen(_flat(problem, problem.x_init if z is None else z))
        # Some problems keep the reference's rescaled gradient (e.g. CSMRI
        # normalizes f by M but the gradient by M0, CSMRI.py:61-81); they
        # expose the factor with autodiff(f) == grad_scale() * grad_full.
        scale64 = (
            jnp.asarray(p64.grad_scale(), jnp.float64)
            if hasattr(p64, "grad_scale")
            else 1.0
        )
        g = scale64 * jnp.asarray(p64.grad_full(z64)).reshape(-1)
        dirs = jax.random.normal(key, (n_dirs, z64.size), jnp.float64)
        dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)

        def one(d):
            fd = (p64.f(z64 + eps * d) - p64.f(z64 - eps * d)) / (2 * eps)
            return fd, jnp.vdot(g, d)

        fd, an = jax.vmap(one)(dirs)
        scale = jnp.maximum(jnp.max(jnp.abs(an)), 1e-12)
        err = float(jnp.max(jnp.abs(fd - an)) / scale)
    if raise_on_fail and err > tol:
        raise GradientCheckError(
            f"grad_full_check failed: max relative directional error {err:.3e} "
            f"> tol {tol:.1e} (fd={fd}, analytic={an})"
        )
    return err


def grad_stoch_check(
    problem,
    z=None,
    tol: float = 1e-6,
    raise_on_fail: bool = True,
) -> float:
    """Unbiasedness identity check of ``problem.grad_stoch``.

    Verifies ``grad_stoch(z, full_minibatch) / M == grad_full(z)`` — by
    linearity of ``grad_stoch`` in the minibatch indicator this equals the
    reference's per-singleton sum identity (``problems/problem.py:157-175``)
    with one evaluation. Returns the max absolute deviation.
    """
    z = _flat(problem, problem.x_init if z is None else z)
    full_mb = problem.full_mb()
    m = float(problem.m_total())
    lhs = jnp.asarray(problem.grad_stoch(z, full_mb)).reshape(-1) / m
    rhs = jnp.asarray(problem.grad_full(z)).reshape(-1)
    scale = float(jnp.maximum(jnp.max(jnp.abs(rhs)), 1e-20))
    err = float(jnp.max(jnp.abs(lhs - rhs))) / scale
    if raise_on_fail and err > tol:
        raise GradientCheckError(
            f"grad_stoch_check failed: max relative deviation {err:.3e} "
            f"> tol {tol:.1e}"
        )
    return err
