"""Reference-compatible wall-clock API.

The scan loops in ``algorithms/loops.py`` are the TPU-native interface
(fixed iteration budgets, one compile, no host round-trips). This module
provides the *reference-shaped* API for users migrating from the original
code: wall-clock budgeted loops (``tt`` seconds) returning the exact dict the
reference algorithms return — ``{z, time_per_iter, psnr_per_iter,
gradient_time, denoise_time, algo_name}`` (reference ``algorithms/pnp_gd.py:
77-84``) — plus the ``tune_pnp_*`` adapters with the hyperopt-style loss
``PSNR(Xinit) - PSNR(z)`` (reference ``pnp_gd.py:86-109``).

Mechanics: gradient and denoise sub-steps are jitted separately and invoked
from a host loop with ``block_until_ready`` timing fences, so the
gradient-vs-denoise wall-clock split is measured the same way the reference
measures it. This trades dispatch overhead for faithful semantics; use the
scan API for production throughput.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pnp_svrg_tpu.algorithms.loops import TOL
from pnp_svrg_tpu.ops.sigma import estimate_sigma


def _split_timed(problem, denoiser):
    """Build jitted (gradient-step, denoise-step, psnr) callables."""

    @jax.jit
    def denoise_step(z, t):
        img = z.reshape(problem.h, problem.w)
        sig = estimate_sigma(img)
        return denoiser.denoise(img, sig, t).ravel()

    @jax.jit
    def psnr(z):
        return problem.psnr(z)

    return denoise_step, psnr


def _round2(x) -> float:
    # Reference PSNRs are rounded to 2 decimals (problem.py:35).
    return float(np.round(float(x), 2))


def _run_wallclock(
    problem,
    denoiser,
    tt: float,
    grad_fn,
    algo_name: str,
    eta: float,
    lr_decay: float,
    converge_check: bool,
    diverge_check: bool,
    outer_snapshot=None,
    t2: int | None = None,
):
    """Shared wall-clock loop skeleton (reference pnp_gd.py:8-84 layout)."""
    denoise_step, psnr = _split_timed(problem, denoiser)
    z = jnp.asarray(problem.x_init).ravel()
    time_per_iter = [0.0]
    psnr_per_iter = [_round2(psnr(z))]
    gradient_time = 0.0
    denoise_time = 0.0
    t = 0
    i = 0
    elapsed = time.time()
    break_out = False
    while (time.time() - elapsed) < tt and not break_out:
        snap_state = None
        if outer_snapshot is not None:
            t0 = time.time()
            snap_state = outer_snapshot(z)
            jax.block_until_ready(snap_state)
            time_per_iter.append(time.time() - t0)
            psnr_per_iter.append(_round2(psnr(z)))
        inner_iters = t2 if t2 is not None else 1
        for _ in range(inner_iters):
            if (time.time() - elapsed) >= tt:
                break
            start_psnr = psnr_per_iter[-1]
            g0 = time.time()
            v, snap_state = grad_fn(z, i, snap_state)
            z = z - (eta * lr_decay**i) * v.ravel()
            jax.block_until_ready(z)
            g1 = time.time()
            gradient_time += g1 - g0
            d0 = time.time()
            t += 1
            z = denoise_step(z, t)
            jax.block_until_ready(z)
            d1 = time.time()
            denoise_time += d1 - d0
            time_per_iter.append((g1 - g0) + (d1 - d0))
            psnr_per_iter.append(_round2(psnr(z)))
            if converge_check and abs(start_psnr - psnr_per_iter[-1]) < TOL:
                break_out = True
                break
            if diverge_check and psnr_per_iter[-1] < 0:
                break_out = True
                break
        i += 1
    return {
        "z": np.asarray(z),
        "time_per_iter": time_per_iter,
        "psnr_per_iter": psnr_per_iter,
        "gradient_time": gradient_time,
        "denoise_time": denoise_time,
        "algo_name": algo_name,
    }


def pnp_gd(
    problem,
    denoiser,
    eta: float,
    tt: float,
    verbose: bool = False,
    lr_decay: float = 1.0,
    converge_check: bool = True,
    diverge_check: bool = False,
) -> dict[str, Any]:
    grad_full = jax.jit(lambda z: problem.grad_full(z))

    def grad_fn(z, i, _):
        return grad_full(z), None

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP GD", eta, lr_decay,
        converge_check, diverge_check,
    )


def pnp_sgd(
    problem,
    denoiser,
    eta: float,
    tt: float,
    mini_batch_size: int,
    verbose: bool = False,
    lr_decay: float = 1.0,
    converge_check: bool = True,
    diverge_check: bool = False,
    seed: int = 0,
) -> dict[str, Any]:
    keys = _KeyStream(seed)

    @jax.jit
    def step(z, key):
        mb = problem.select_mb(key, mini_batch_size)
        return problem.grad_stoch(z, mb) / mini_batch_size

    def grad_fn(z, i, _):
        return step(z, keys()), None

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP SGD", eta, lr_decay,
        converge_check, diverge_check,
    )


def pnp_svrg(
    problem,
    denoiser,
    eta: float,
    tt: float,
    T2: int,
    mini_batch_size: int,
    verbose: bool = False,
    lr_decay: float = 1.0,
    converge_check: bool = True,
    diverge_check: bool = False,
    variant: str = "svrg",
    seed: int = 0,
) -> dict[str, Any]:
    keys = _KeyStream(seed)
    grad_full = jax.jit(lambda z: problem.grad_full(z).ravel())

    @jax.jit
    def cv_step(z, w, mu, key):
        mb = problem.select_mb(key, mini_batch_size)
        return (
            problem.grad_stoch(z, mb).ravel() - problem.grad_stoch(w, mb).ravel()
        ) / mini_batch_size + mu

    def outer_snapshot(z):
        return (z, grad_full(z))

    def grad_fn(z, i, snap):
        w, mu = snap
        if variant == "faithful":
            return mu, snap
        return cv_step(z, w, mu, keys()), snap

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP SVRG", eta, lr_decay,
        converge_check, diverge_check, outer_snapshot=outer_snapshot, t2=T2,
    )


def pnp_saga(
    problem,
    denoiser,
    eta: float,
    tt: float,
    mini_batch_size: int,
    hist_size: int = 50,
    verbose: bool = False,
    lr_decay: float = 1.0,
    converge_check: bool = True,
    diverge_check: bool = False,
    seed: int = 0,
) -> dict[str, Any]:
    keys = _KeyStream(seed)

    @jax.jit
    def stoch(z, key):
        mb = problem.select_mb(key, mini_batch_size)
        return problem.grad_stoch(z, mb).ravel() / mini_batch_size

    g0 = stoch(jnp.asarray(problem.x_init).ravel(), keys())
    state = {
        "table": jnp.tile(g0[None, :], (hist_size, 1)),
        "tsum": g0 * hist_size,
        "prev": g0,
    }
    rng = np.random.default_rng(seed + 1)

    def grad_fn(z, i, _):
        slot = int(rng.integers(hist_size))
        g = stoch(z, keys())
        old = state["table"][slot]
        state["table"] = state["table"].at[slot].set(g)
        state["tsum"] = state["tsum"] + g - old
        v = g - state["prev"] + state["tsum"] / hist_size
        state["prev"] = g
        return v, None

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP SAGA", eta, lr_decay,
        converge_check, diverge_check,
    )


def pnp_sarah(
    problem,
    denoiser,
    eta: float,
    tt: float,
    T2: int,
    mini_batch_size: int,
    verbose: bool = False,
    lr_decay: float = 1.0,
    converge_check: bool = True,
    diverge_check: bool = False,
    variant: str = "sarah",
    seed: int = 0,
) -> dict[str, Any]:
    keys = _KeyStream(seed)
    grad_full = jax.jit(lambda z: problem.grad_full(z).ravel())
    denoise_step, _ = _split_timed(problem, denoiser)

    @jax.jit
    def diff_step(anchor, w_prev, v_prev, key):
        mb = problem.select_mb(key, mini_batch_size)
        return (
            problem.grad_stoch(anchor, mb).ravel()
            - problem.grad_stoch(w_prev, mb).ravel()
        ) / mini_batch_size + v_prev

    state = {}

    def outer_snapshot(z):
        v_prev = grad_full(z)
        w1 = denoise_step(z - eta * v_prev, 1)
        state.update(w_prev=z, v_prev=v_prev, w_fix=w1, z_curr=z)
        return w1

    def grad_fn(z, i, snap):
        anchor = state["w_fix"] if variant == "faithful" else z
        v = diff_step(anchor, state["w_prev"], state["v_prev"], keys())
        state["v_prev"] = v
        state["w_prev"] = z
        return v, snap

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP SARAH", eta, lr_decay,
        converge_check, diverge_check, outer_snapshot=outer_snapshot, t2=T2,
    )


class _KeyStream:
    def __init__(self, seed: int):
        self._key = jax.random.PRNGKey(seed)

    def __call__(self):
        self._key, k = jax.random.split(self._key)
        return k


def _make_tuner(runner, param_names):
    """Build a tune_pnp_* adapter (reference e.g. ``pnp_svrg.py:107-132``)."""

    def tuner(args, problem, denoiser, tt, lr_decay=1.0, verbose=False,
              converge_check=True, diverge_check=True):
        kwargs = dict(zip(param_names, args))
        dstrength = kwargs.pop("dstrength", None)
        if dstrength is not None and hasattr(denoiser, "denoise_strength"):
            import dataclasses as _dc

            denoiser = _dc.replace(
                denoiser, sigma_modifier=jnp.asarray(float(dstrength))
            )
        result = runner(
            problem=problem, denoiser=denoiser, tt=tt, lr_decay=lr_decay,
            verbose=verbose, converge_check=converge_check,
            diverge_check=diverge_check, **kwargs,
        )
        init_psnr = _round2(problem.psnr(problem.x_init))
        final_psnr = _round2(problem.psnr(jnp.asarray(result["z"])))
        return {
            "loss": init_psnr - final_psnr,
            "status": "ok",
            **result,
        }

    return tuner


tune_pnp_gd = _make_tuner(pnp_gd, ("eta", "dstrength"))
tune_pnp_sgd = _make_tuner(pnp_sgd, ("eta", "mini_batch_size", "dstrength"))
tune_pnp_svrg = _make_tuner(pnp_svrg, ("eta", "mini_batch_size", "T2", "dstrength"))
tune_pnp_saga = _make_tuner(
    pnp_saga, ("eta", "mini_batch_size", "dstrength", "hist_size")
)
tune_pnp_sarah = _make_tuner(pnp_sarah, ("eta", "mini_batch_size", "T2", "dstrength"))
