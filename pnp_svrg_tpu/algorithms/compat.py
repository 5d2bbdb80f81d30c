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
from a host loop with scalar-readback timing fences
(:func:`pnp_svrg_tpu.utils.profiling.scalar_fence` — ``block_until_ready``
does not reliably block over the axon PJRT tunnel, see CLAUDE.md), so the
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
from pnp_svrg_tpu.utils.profiling import scalar_fence


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
    max_iters: int | None = None,
):
    """Shared wall-clock loop skeleton (reference pnp_gd.py:8-84 layout).

    ``max_iters`` optionally caps the number of *inner* gradient+denoise
    steps (svrg/sarah run ``max_iters / t2`` outer cycles) — the
    iteration-budget mode used to compare this API against the scan loops at
    matched counts; the reference's budget is wall-clock only.
    """
    denoise_step, psnr = _split_timed(problem, denoiser)
    z = jnp.asarray(problem.x_init).ravel()
    time_per_iter = [0.0]
    psnr_per_iter = [_round2(psnr(z))]
    gradient_time = 0.0
    denoise_time = 0.0
    t = 0
    i = 0
    inner_done = 0
    elapsed = time.time()

    def budget_left():
        if max_iters is not None and inner_done >= max_iters:
            return False
        return (time.time() - elapsed) < tt

    break_out = False
    while budget_left() and not break_out:
        snap_state = None
        if outer_snapshot is not None:
            t0 = time.time()
            # May advance z (SARAH continues from the denoised step-1 point
            # in canonical mode, matching loops.pnp_sarah), consume a
            # denoiser call count, and choose what the snapshot log entry
            # records (SARAH logs the step-1 point even in faithful mode,
            # where z itself stays put).
            z, snap_state, t, log_psnr = outer_snapshot(z, t)
            scalar_fence(z)
            time_per_iter.append(time.time() - t0)
            psnr_per_iter.append(_round2(log_psnr))
        inner_iters = t2 if t2 is not None else 1
        for _ in range(inner_iters):
            if not budget_left():
                break
            start_psnr = psnr_per_iter[-1]
            g0 = time.time()
            v, snap_state = grad_fn(z, i, snap_state)
            z = z - (eta * lr_decay**i) * v.ravel()
            scalar_fence(z)
            g1 = time.time()
            gradient_time += g1 - g0
            d0 = time.time()
            t += 1
            z = denoise_step(z, t)
            scalar_fence(z)
            d1 = time.time()
            denoise_time += d1 - d0
            inner_done += 1
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
    max_iters: int | None = None,
) -> dict[str, Any]:
    grad_full = jax.jit(lambda z: problem.grad_full(z))

    def grad_fn(z, i, _):
        return grad_full(z), None

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP GD", eta, lr_decay,
        converge_check, diverge_check, max_iters=max_iters,
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
    max_iters: int | None = None,
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
        converge_check, diverge_check, max_iters=max_iters,
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
    max_iters: int | None = None,
) -> dict[str, Any]:
    keys = _KeyStream(seed)
    grad_full = jax.jit(lambda z: problem.grad_full(z).ravel())
    _, psnr_fn = _split_timed(problem, denoiser)

    @jax.jit
    def cv_step(z, w, mu, key):
        mb = problem.select_mb(key, mini_batch_size)
        return (
            problem.grad_stoch(z, mb).ravel() - problem.grad_stoch(w, mb).ravel()
        ) / mini_batch_size + mu

    def outer_snapshot(z, t):
        return z, (z, grad_full(z)), t, psnr_fn(z)

    def grad_fn(z, i, snap):
        w, mu = snap
        if variant == "faithful":
            return mu, snap
        return cv_step(z, w, mu, keys()), snap

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP SVRG", eta, lr_decay,
        converge_check, diverge_check, outer_snapshot=outer_snapshot, t2=T2,
        max_iters=max_iters,
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
    max_iters: int | None = None,
) -> dict[str, Any]:
    # Key stream mirrors loops.pnp_saga exactly (one 2-way split for the
    # init gradient, then a 3-way split per iteration with the slot drawn
    # from the third key) so the two APIs produce identical trajectories at
    # matched iteration counts.
    key0, k_init = jax.random.split(jax.random.PRNGKey(seed))

    @jax.jit
    def stoch(z, key):
        mb = problem.select_mb(key, mini_batch_size)
        return problem.grad_stoch(z, mb).ravel() / mini_batch_size

    g0 = stoch(jnp.asarray(problem.x_init).ravel(), k_init)
    state = {
        "table": jnp.tile(g0[None, :], (hist_size, 1)),
        "tsum": g0 * hist_size,
        "prev": g0,
        "key": key0,
    }

    def grad_fn(z, i, _):
        state["key"], k_mb, k_slot = jax.random.split(state["key"], 3)
        slot = int(jax.random.randint(k_slot, (), 0, hist_size))
        g = stoch(z, k_mb)
        old = state["table"][slot]
        state["table"] = state["table"].at[slot].set(g)
        state["tsum"] = state["tsum"] + g - old
        v = g - state["prev"] + state["tsum"] / hist_size
        state["prev"] = g
        return v, None

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP SAGA", eta, lr_decay,
        converge_check, diverge_check, max_iters=max_iters,
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
    max_iters: int | None = None,
) -> dict[str, Any]:
    keys = _KeyStream(seed)
    grad_full = jax.jit(lambda z: problem.grad_full(z).ravel())
    denoise_step, psnr_fn = _split_timed(problem, denoiser)

    @jax.jit
    def diff_step(anchor, w_prev, v_prev, key):
        mb = problem.select_mb(key, mini_batch_size)
        return (
            problem.grad_stoch(anchor, mb).ravel()
            - problem.grad_stoch(w_prev, mb).ravel()
        ) / mini_batch_size + v_prev

    state = {}

    def outer_snapshot(z, t):
        v_prev = grad_full(z)
        # Step-1 point: one full-gradient step, denoised (pnp_sarah.py:36-48).
        w1 = denoise_step(z - eta * v_prev, t + 1)
        state.update(w_prev=z, v_prev=v_prev, w_fix=w1)
        # Canonical mode continues from the denoised step-1 point (matches
        # loops.pnp_sarah); faithful keeps z at the outer-start point, with
        # w1 only serving as the frozen recursion anchor (pnp_sarah.py:72).
        z_next = z if variant == "faithful" else w1
        return z_next, w1, t + 1, psnr_fn(w1)

    def grad_fn(z, i, snap):
        if variant == "faithful":
            # Reference recursion: anchor frozen at the step-1 point,
            # w_previous = the latest denoised iterate, i.e. the incoming z
            # (pnp_sarah.py:97-98).
            anchor, w_prev = state["w_fix"], z
        else:
            # Canonical SARAH: differences between the two most recent
            # iterates.
            anchor, w_prev = z, state["w_prev"]
        v = diff_step(anchor, w_prev, state["v_prev"], keys())
        state["v_prev"] = v
        state["w_prev"] = z
        return v, snap

    return _run_wallclock(
        problem, denoiser, tt, grad_fn, "PnP SARAH", eta, lr_decay,
        converge_check, diverge_check, outer_snapshot=outer_snapshot, t2=T2,
        max_iters=max_iters,
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
