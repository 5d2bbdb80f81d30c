"""Measurement-parallel gradients via shard_map + psum.

The scaling path for the dense-measurement problem family (PhaseRetrieval's
(M, N) Gaussian A, reference ``problems/PR.py:26``): shard A's rows across the
mesh ``meas`` axis, compute local partial gradients with MXU matmuls, and
allreduce with a single ``psum`` over ICI. Full-gradient snapshots in
SVRG/SARAH are exactly this reduction (SURVEY.md §2.10).

Also provides a combined dp x mp SPMD PnP step (batch of problems sharded
over ``batch``, measurements over ``meas``) used by the multi-chip dry run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pnp_svrg_tpu.parallel.mesh import BATCH_AXIS, MEAS_AXIS
from pnp_svrg_tpu.ops.sigma import estimate_sigma


def shard_pr_problem(problem, mesh):
    """Place a PhaseRetrieval problem on the mesh: A and y row-sharded over
    ``meas``, everything else replicated."""
    a = jax.device_put(problem.a, NamedSharding(mesh, P(MEAS_AXIS, None)))
    y = jax.device_put(problem.y, NamedSharding(mesh, P(MEAS_AXIS)))
    rep = NamedSharding(mesh, P())
    return type(problem)(
        a=a,
        y=y,
        x=jax.device_put(problem.x, rep),
        x_init=jax.device_put(problem.x_init, rep),
        snr=problem.snr,
        sigma=problem.sigma,
        h=problem.h,
        w=problem.w,
        num_meas=problem.num_meas,
    )


def pr_grad_full_sharded(problem, z, mesh):
    """Full PR amplitude gradient with A row-sharded over ``meas``.

    Each shard computes ``A_loc^T((|A_loc z| - y_loc)/|A_loc z| * A_loc z)``
    locally (two MXU matmuls) and a single psum produces the global gradient —
    the distributed form of reference ``PR.py:75-79``.
    """

    def local(a_loc, y_loc, z_full):
        t = jnp.dot(a_loc, z_full.ravel(), preferred_element_type=jnp.float32)
        at = jnp.abs(t)
        weight = (at - y_loc) / at
        partial = jnp.dot(a_loc.T, weight * t, preferred_element_type=jnp.float32)
        return jax.lax.psum(partial, MEAS_AXIS) / problem.m

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(MEAS_AXIS, None), P(MEAS_AXIS), P()),
        out_specs=P(),
    )
    return fn(problem.a, problem.y, z)


def sharded_pnp_step(mesh, denoiser, eta: float):
    """Build a jitted dp x mp SPMD PnP iteration for a *batch* of PR problems.

    Layout: A is (B, M, N) sharded P(batch, meas, None); y is (B, M) sharded
    P(batch, meas); z and x are (B, H*W) sharded P(batch, None). One step =
    sharded full gradient (psum over meas) + denoise + PSNR, the inner body
    of every PnP loop (reference ``pnp_gd.py:24-66``) in SPMD form.
    """

    def step(a, y, x, z, h, w):
        # Shapes inside shard_map: a (Bl, Ml, N), y (Bl, Ml), z (Bl, N).
        def one(a_i, y_i, x_i, z_i):
            t = jnp.dot(a_i, z_i, preferred_element_type=jnp.float32)
            at = jnp.maximum(jnp.abs(t), 1e-12)
            weight = (at - y_i) / at
            partial = jnp.dot(a_i.T, weight * t, preferred_element_type=jnp.float32)
            grad = jax.lax.psum(partial, MEAS_AXIS) / (
                a_i.shape[0] * jax.lax.axis_size(MEAS_AXIS)
            )
            z_new = z_i - eta * grad
            img = z_new.reshape(h, w)
            sig = estimate_sigma(img)
            img = denoiser.denoise(img, sig, 1)
            psnr = 10.0 * jnp.log10(1.0 / jnp.mean((img.ravel() - x_i) ** 2))
            return img.ravel(), psnr

        return jax.vmap(one)(a, y, x, z)

    inner = functools.partial(step)

    def wrapped(a, y, x, z, h, w):
        fn = jax.shard_map(
            lambda a_, y_, x_, z_: inner(a_, y_, x_, z_, h, w),
            mesh=mesh,
            in_specs=(
                P(BATCH_AXIS, MEAS_AXIS, None),
                P(BATCH_AXIS, MEAS_AXIS),
                P(BATCH_AXIS, None),
                P(BATCH_AXIS, None),
            ),
            out_specs=(P(BATCH_AXIS, None), P(BATCH_AXIS)),
        )
        return fn(a, y, x, z)

    return jax.jit(wrapped, static_argnames=("h", "w"))
