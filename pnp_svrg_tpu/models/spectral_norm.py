"""Conv-space spectral normalization ("real SN") in JAX.

Re-implementation of the reference's power iteration on the *convolution
operator itself* (not the reshaped kernel matrix) from
``DeepDenoisers/model/Spectral_Normalize_chen.py:25-116`` and the
target-sigma variant ``conv_sn_chen.py:16-93``:

* the singular vector ``u`` lives in the conv's output space on a fixed
  probe domain (reference uses (1, C, 40, 40), ``Spectral_Normalize_chen
  .py:103``),
* one iteration: ``v = normalize(conv^T u)``, ``u = normalize(conv v)`` —
  here the adjoint is taken exactly via ``jax.vjp`` instead of the
  reference's flip/transpose/pad construction (mathematically identical for
  3x3 SAME convs),
* ``sigma = <u, conv(v)>``; the kernel is rescaled to ``kernel / sigma *
  target`` (the RealSN-DnCNN recipe bakes in ``target = 0.3**(1/17)`` per
  layer, reference ``Spectral_Normalize_chen.py:69-71``).

Also includes the BatchNorm spectral clamp (reference ``bn_sn_chen.py:9-72``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PROBE_HW = 40  # reference probe spatial size (Spectral_Normalize_chen.py:103)


def _conv_same(v: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """NHWC 'SAME' convolution with an HWIO kernel."""
    return jax.lax.conv_general_dilated(
        v,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v.ravel()) + eps)


def conv_power_iteration(
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    n_iters: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate the conv operator's largest singular value.

    ``kernel``: (kh, kw, cin, cout); ``u``: (1, H, W, cout) current output-
    space singular vector estimate. Returns (sigma, u_new).
    """
    cin = kernel.shape[2]
    probe_shape = (1, u.shape[1], u.shape[2], cin)
    probe = jnp.zeros(probe_shape, kernel.dtype)
    _, vjp_fn = jax.vjp(lambda v: _conv_same(v, kernel), probe)

    def body(_, u_cur):
        (v,) = vjp_fn(u_cur)
        v = _normalize(v)
        return _normalize(_conv_same(v, kernel))

    u_new = jax.lax.fori_loop(0, n_iters, body, u)
    (v,) = vjp_fn(u_new)
    v = _normalize(v)
    sigma = jnp.sum(u_new * _conv_same(v, kernel))
    return sigma, u_new


def init_u(key: jax.Array, cout: int, hw: int = PROBE_HW) -> jnp.ndarray:
    return _normalize(jax.random.normal(key, (1, hw, hw, cout)))


def power_iteration_uv(
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    n_iters: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Advance the power iteration and return the singular-vector pair
    ``(u_new, v_new)``, both under ``stop_gradient`` — the training-time
    contract of torch ``spectral_norm`` (reference ``conv_sn_chen.py:60-63``:
    the pre-hook iterates u/v without grad, then ``sigma = <u, W v>`` is
    differentiated with u, v held fixed)."""
    cin = kernel.shape[2]
    probe = jnp.zeros((1, u.shape[1], u.shape[2], cin), kernel.dtype)
    _, vjp_fn = jax.vjp(lambda v: _conv_same(v, kernel), probe)

    def body(_, u_cur):
        (v,) = vjp_fn(u_cur)
        return _normalize(_conv_same(_normalize(v), kernel))

    u_new = jax.lax.fori_loop(0, n_iters, body, u)
    (v,) = vjp_fn(u_new)
    v = _normalize(v)
    return jax.lax.stop_gradient(u_new), jax.lax.stop_gradient(v)


def sigma_uv(kernel: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``sigma = <u, conv(v, W)>`` — linear (hence differentiable) in the
    kernel for fixed u, v. Dividing the kernel by this inside the forward
    pass is the torch-``spectral_norm`` parametrization: gradients flow
    through the normalization, unlike a post-step projection (which
    multiplicatively shrinks the learned update every step and collapses
    the model to the zero predictor — observed in round 3 training)."""
    return jnp.sum(u * _conv_same(v, kernel))


def spectrally_normalize_kernel(
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    target: float = 1.0,
    n_iters: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (kernel * target / sigma, sigma, u_new) — the conv_sn_chen
    rescaling (reference ``conv_sn_chen.py:48-49``)."""
    sigma, u_new = conv_power_iteration(kernel, u, n_iters)
    return kernel * (target / sigma), sigma, u_new


def realsn_target(lip: float = 0.3, depth: int = 17) -> float:
    """Per-layer Lipschitz target for a depth-layer net with product bound
    ``lip`` (the RealSN recipe, reference ``Spectral_Normalize_chen.py:69``)."""
    return float(lip ** (1.0 / depth))


# The reference's shipped adaptive schedule for a 6-layer SimpleCNN
# (``SimpleCNN_models.py:21``): early layers get norm headroom, later layers
# clamp hard; the product is ~1.0.
ADAPTIVE_SIGMAS_6 = (5.0, 2.0, 1.0, 0.681, 0.464, 0.316)


def realsn_targets(
    lip: float, depth: int, adaptive=None
) -> tuple[float, ...]:
    """Per-layer sigma targets for a ``depth``-conv stack.

    Default: the uniform recipe ``lip^(1/depth)`` per layer. ``adaptive``
    may be an explicit per-layer list (the reference's adaptive option,
    ``SimpleCNN_models.py:18-22``, e.g. :data:`ADAPTIVE_SIGMAS_6`); its
    length must equal ``depth`` — the same assert the reference raises.
    """
    if adaptive is not None:
        sigmas = tuple(float(s) for s in adaptive)
        if len(sigmas) != depth:
            raise ValueError(
                f"Length of SN list ({len(sigmas)}) incompatible with "
                f"num of layers ({depth})"
            )
        return sigmas
    return (realsn_target(lip, depth),) * depth


def bn_spectral_clamp(
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_var: jnp.ndarray,
    target: float = 1.0,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp a BatchNorm layer's operator norm to ``target`` by jointly
    rescaling (scale, bias) when ``max |scale|/sqrt(var+eps)`` exceeds it
    (reference ``bn_sn_chen.py:16-29``)."""
    sigma_cur = jnp.max(jnp.abs(scale) / jnp.sqrt(running_var + eps))
    coef = jnp.where(sigma_cur > target, target / sigma_cur, 1.0)
    return scale * coef, bias * coef
