"""PnP optimizer loops as jit-compiled ``lax.scan`` programs.

TPU-native re-design of the reference algorithm layer (``algorithms/pnp_{gd,
sgd,svrg,saga,sarah}.py``). The reference couples each algorithm to a Python
``while time.time() - elapsed < tt`` wall-clock loop with per-iteration host
work; here every algorithm is a pure fixed-iteration scan compiled once:
iteration budgets replace wall-clock budgets (§6 of SURVEY.md records the
reference's iteration counts at each budget for calibration), and the whole
reconstruction — gradients, sigma estimation, denoising, PSNR logging — runs
on-device with no host synchronization.

Shared step skeleton (identical across the five algorithms, reference e.g.
``pnp_gd.py:24-66``):

    v     <- gradient estimate                  (algorithm-specific)
    z     <- z - eta * lr_decay**i * v
    sigma <- estimate_sigma(z)                  (native db2-MAD, ops/sigma.py)
    z     <- denoiser(z, sigma, t)
    log PSNR(z)

Convergence (|PSNR delta| < 1e-5) and divergence (PSNR < 0) checks — the
reference's early exits (``pnp_gd.py:69-74``) — are implemented as a ``done``
latch that freezes the state for remaining scan steps, keeping shapes static.

Variance-reduction notes:

* ``pnp_svrg``: the reference's released code has the canonical SVRG control
  variate commented out and uses ``v = mu`` for all inner steps
  (``pnp_svrg.py:53-54``). Default here is the *published* algorithm
  (``variant="svrg"``); ``variant="faithful"`` reproduces the v1 behavior.
* ``pnp_sarah``: the reference never advances its ``w_next`` recursion point
  inside the inner loop (``pnp_sarah.py:72`` — differences are taken between
  the frozen step-1 point and the moving previous iterate). Default here is
  the canonical SARAH recursion; ``variant="faithful"`` reproduces v1.
* ``pnp_saga``: table-based approximate SAGA with a size-``hist_size``
  gradient history and uniformly random slot replacement (``pnp_saga.py:
  25-47``); the running table sum is maintained incrementally (O(N) per step
  instead of the reference's O(hist*N) Python ``sum``).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pnp_svrg_tpu.ops.sigma import estimate_sigma

TOL = 1e-5  # reference convergence tolerance (pnp_gd.py:7)


class IterLog(NamedTuple):
    """Per-iteration log record (stacked by scan)."""

    psnr: jnp.ndarray
    psnr_before_denoise: jnp.ndarray
    sigma_est: jnp.ndarray


def _z0_of(problem):
    """Initial flat state: (N,) for one problem, (B, N) for a batch."""
    xi = problem.x_init
    return xi.reshape(xi.shape[:-2] + (-1,))


def _denoise_step(problem, denoiser, z_flat, v, step_size, t):
    """Gradient update + sigma estimate + denoise; returns (z', log pieces).

    Batch-polymorphic: ``z_flat`` is (N,) or (B, N); denoisers receive the
    full (B, H, W) stack in one call (native batched kernels, no vmap).
    ``step_size`` may be a scalar or (B,) — per-lane step sizes let the
    tuner evaluate a whole batch of eta candidates in one compiled run.
    """
    step_size = jnp.asarray(step_size)
    if step_size.ndim:
        step_size = step_size[..., None]
    z_flat = z_flat - step_size * v.reshape(z_flat.shape)
    img = z_flat.reshape(z_flat.shape[:-1] + (problem.h, problem.w))
    psnr_mid = problem.psnr(img)
    sig = estimate_sigma(img)
    img = denoiser.denoise(img, sig, t)
    return img.reshape(z_flat.shape), problem.psnr(img), psnr_mid, sig


def _latch(done, old, new):
    """Freeze pytree ``new`` to ``old`` once ``done`` is set (done may carry
    a batch shape; it broadcasts against trailing state axes)."""

    def sel(o, n):
        d = done.reshape(done.shape + (1,) * (o.ndim - done.ndim))
        return jnp.where(d, o, n)

    return jax.tree_util.tree_map(sel, old, new)


def _check_done(done, start_psnr, psnr_after, converge_check, diverge_check):
    newly = jnp.zeros_like(done)
    if converge_check:
        newly = newly | (jnp.abs(start_psnr - psnr_after) < TOL)
    if diverge_check:
        newly = newly | (psnr_after < 0)
    return done | newly


def _img_of(problem, z_flat):
    return z_flat.reshape(z_flat.shape[:-1] + (problem.h, problem.w))


def _result(problem, z, psnr_trace):
    return {
        "z": z,
        "image": _img_of(problem, z),
        "psnr_per_iter": psnr_trace,
        "final_psnr": psnr_trace[-1],
    }


# ---------------------------------------------------------------------------
# PnP-GD  (reference algorithms/pnp_gd.py:8-84)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "converge_check", "diverge_check"),
)
def pnp_gd(
    problem,
    denoiser,
    eta: float,
    n_iters: int,
    key: jax.Array | None = None,
    lr_decay: float = 1.0,
    converge_check: bool = False,
    diverge_check: bool = False,
):
    """Full-gradient PnP descent."""
    del key  # deterministic
    z0 = _z0_of(problem)
    eta = jnp.asarray(eta, jnp.float32)
    lr_decay = jnp.asarray(lr_decay, jnp.float32)

    def body(state, i):
        z, t, done = state
        start_psnr = problem.psnr(z)
        v = problem.grad_full(z)
        z_new, psnr_after, psnr_mid, sig = _denoise_step(
            problem, denoiser, z, v, eta * lr_decay**i, t + 1
        )
        done_new = _check_done(
            done, start_psnr, psnr_after, converge_check, diverge_check
        )
        z = jnp.where(done[..., None] if done.ndim else done, z, z_new)
        t = jnp.where(done, t, t + 1)  # per-lane counter (pnp_gd.py's self.t)
        log = IterLog(jnp.where(done, start_psnr, psnr_after), psnr_mid, sig)
        return (z, t, done_new), log

    done0 = jnp.zeros(z0.shape[:-1], bool)
    init = (z0, jnp.zeros(done0.shape, jnp.int32), done0)
    (z, _, _), logs = jax.lax.scan(
        body, init, jnp.arange(n_iters, dtype=jnp.float32)
    )
    trace = jnp.concatenate([problem.psnr(_img_of(problem, z0))[None], logs.psnr])
    return _result(problem, z, trace)


# ---------------------------------------------------------------------------
# PnP-SGD  (reference algorithms/pnp_sgd.py:8-84)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iters",
        "mini_batch_size",
        "converge_check",
        "diverge_check",
    ),
)
def pnp_sgd(
    problem,
    denoiser,
    eta: float,
    n_iters: int,
    mini_batch_size: int,
    key: jax.Array,
    lr_decay: float = 1.0,
    converge_check: bool = False,
    diverge_check: bool = False,
):
    """Minibatch stochastic PnP descent."""
    z0 = _z0_of(problem)
    eta = jnp.asarray(eta, jnp.float32)
    lr_decay = jnp.asarray(lr_decay, jnp.float32)
    b = float(mini_batch_size)

    def body(state, i):
        z, t, done, k = state
        k, k_mb = jax.random.split(k)
        start_psnr = problem.psnr(z)
        mb = problem.select_mb(k_mb, mini_batch_size)
        v = problem.grad_stoch(z, mb) / b
        z_new, psnr_after, psnr_mid, sig = _denoise_step(
            problem, denoiser, z, v, eta * lr_decay**i, t + 1
        )
        done_new = _check_done(
            done, start_psnr, psnr_after, converge_check, diverge_check
        )
        z = jnp.where(done[..., None] if done.ndim else done, z, z_new)
        t = jnp.where(done, t, t + 1)  # per-lane counter (pnp_sgd.py's self.t)
        log = IterLog(jnp.where(done, start_psnr, psnr_after), psnr_mid, sig)
        return (z, t, done_new, k), log

    done0 = jnp.zeros(z0.shape[:-1], bool)
    init = (z0, jnp.zeros(done0.shape, jnp.int32), done0, key)
    (z, _, _, _), logs = jax.lax.scan(
        body, init, jnp.arange(n_iters, dtype=jnp.float32)
    )
    trace = jnp.concatenate([problem.psnr(_img_of(problem, z0))[None], logs.psnr])
    return _result(problem, z, trace)


# ---------------------------------------------------------------------------
# PnP-SVRG  (reference algorithms/pnp_svrg.py:8-105)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_outer",
        "t2",
        "mini_batch_size",
        "variant",
        "converge_check",
        "diverge_check",
    ),
)
def pnp_svrg(
    problem,
    denoiser,
    eta: float,
    n_outer: int,
    t2: int,
    mini_batch_size: int,
    key: jax.Array,
    lr_decay: float = 1.0,
    variant: str = "svrg",
    converge_check: bool = False,
    diverge_check: bool = False,
):
    """Stochastic variance-reduced PnP.

    ``variant="svrg"`` (default): published control variate
    ``v = (g(z, mb) - g(w, mb)) / b + mu`` — the line the reference has
    commented out at ``pnp_svrg.py:53``.
    ``variant="faithful"``: reference v1 behavior ``v = mu``
    (``pnp_svrg.py:54``).
    """
    if variant not in ("svrg", "faithful"):
        raise ValueError(f"unknown svrg variant {variant!r}")
    z0 = _z0_of(problem)
    eta = jnp.asarray(eta, jnp.float32)
    lr_decay = jnp.asarray(lr_decay, jnp.float32)
    b = float(mini_batch_size)

    def inner_body(state, _):
        z, w, mu, t, done, k, i = state
        k, k_mb = jax.random.split(k)
        start_psnr = problem.psnr(z)
        if variant == "svrg":
            mb = problem.select_mb(k_mb, mini_batch_size)
            v = (problem.grad_stoch(z, mb) - problem.grad_stoch(w, mb)) / b + mu
        else:
            v = mu
        z_new, psnr_after, psnr_mid, sig = _denoise_step(
            problem, denoiser, z, v, eta * lr_decay**i, t + 1
        )
        done_new = _check_done(
            done, start_psnr, psnr_after, converge_check, diverge_check
        )
        z = jnp.where(done[..., None] if done.ndim else done, z, z_new)
        t = jnp.where(done, t, t + 1)  # per-lane counter (pnp_svrg.py's self.t)
        log = IterLog(jnp.where(done, start_psnr, psnr_after), psnr_mid, sig)
        return (z, w, mu, t, done_new, k, i), log

    def outer_body(state, i):
        z, t, done, k = state
        mu = problem.grad_full(z)  # full-gradient snapshot (pnp_svrg.py:32)
        w = z
        snap_psnr = problem.psnr(z)
        (z, _, _, t, done, k, _), logs = jax.lax.scan(
            inner_body, (z, w, mu, t, done, k, i), None, length=t2
        )
        return (z, t, done, k), (snap_psnr, logs)

    done0 = jnp.zeros(z0.shape[:-1], bool)
    init = (z0, jnp.zeros(done0.shape, jnp.int32), done0, key)
    (z, _, _, _), (snap_psnrs, logs) = jax.lax.scan(
        outer_body, init, jnp.arange(n_outer, dtype=jnp.float32)
    )
    # Interleave: [init, (snapshot, T2 inner entries) * n_outer] — the
    # reference's log layout (pnp_svrg.py:21-22,37-38,79-80).
    inner = logs.psnr  # (n_outer, t2) or (n_outer, t2, B)
    tail = snap_psnrs.shape[1:]
    inter = jnp.concatenate([snap_psnrs[:, None], inner], axis=1)
    trace = jnp.concatenate(
        [problem.psnr(_img_of(problem, z0))[None], inter.reshape((-1,) + tail)]
    )
    return _result(problem, z, trace)


# ---------------------------------------------------------------------------
# PnP-SAGA  (reference algorithms/pnp_saga.py:8-102)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iters",
        "mini_batch_size",
        "hist_size",
        "converge_check",
        "diverge_check",
        "table_axis",
        "table_shards",
    ),
)
def pnp_saga(
    problem,
    denoiser,
    eta: float,
    n_iters: int,
    mini_batch_size: int,
    key: jax.Array,
    hist_size: int = 50,
    lr_decay: float = 1.0,
    converge_check: bool = False,
    diverge_check: bool = False,
    table_axis: str | None = None,
    table_shards: int = 1,
):
    """Table-based approximate SAGA with a (hist_size, N) gradient history.

    ``table_axis`` / ``table_shards`` shard the history table over a bound
    mesh axis (the ``meas`` axis of ``parallel/meas.py``): each shard owns
    ``hist_size // table_shards`` slots, so table memory scales down with the
    mesh while ``hist_size`` can scale up (SURVEY §2.10). The replacement
    slot is drawn from the *global* slot range with a replicated key; only
    the owning shard rewrites its row, and the replicated running table sum
    is maintained with one psum'd eviction delta per step — the update
    sequence is bit-identical to the unsharded table.
    """
    if hist_size % table_shards:
        raise ValueError(
            f"hist_size {hist_size} not divisible by {table_shards} table shards"
        )
    if table_shards > 1 and table_axis is None:
        raise ValueError("table_shards > 1 requires a bound table_axis")
    hist_local = hist_size // table_shards
    z0 = _z0_of(problem)
    eta = jnp.asarray(eta, jnp.float32)
    lr_decay = jnp.asarray(lr_decay, jnp.float32)
    b = float(mini_batch_size)

    key, k0 = jax.random.split(key)
    g0 = problem.grad_stoch(z0, problem.select_mb(k0, mini_batch_size)).reshape(z0.shape) / b
    table0 = jnp.tile(g0[None], (hist_local,) + (1,) * g0.ndim)
    tsum0 = g0 * hist_size  # global running sum (replicated across shards)

    def body(state, i):
        z, t, done, k, table, tsum, prev = state
        k, k_mb, k_slot = jax.random.split(k, 3)
        start_psnr = problem.psnr(z)
        slot = jax.random.randint(k_slot, (), 0, hist_size)
        g = problem.grad_stoch(z, problem.select_mb(k_mb, mini_batch_size)).reshape(z.shape) / b
        if table_shards == 1:
            old = table[slot]
            table_new = table.at[slot].set(g)
        else:
            local_slot = slot % hist_local
            mine = (slot // hist_local) == jax.lax.axis_index(table_axis)
            row = table[local_slot]
            # Evicted value lives on exactly one shard; psum broadcasts it.
            old = jax.lax.psum(jnp.where(mine, row, jnp.zeros_like(row)),
                               table_axis)
            table_new = table.at[local_slot].set(jnp.where(mine, g, row))
        tsum_new = tsum + g - old
        v = g - prev + tsum_new / hist_size
        z_new, psnr_after, psnr_mid, sig = _denoise_step(
            problem, denoiser, z, v, eta * lr_decay**i, t + 1
        )
        done_new = _check_done(
            done, start_psnr, psnr_after, converge_check, diverge_check
        )
        # Latch all mutable state once done. The table carries a leading
        # hist axis, so the done mask broadcasts as (1, B, 1) when batched.
        dm = done[..., None] if done.ndim else done
        dm_table = dm[None] if done.ndim else done
        z = jnp.where(dm, z, z_new)
        t = jnp.where(done, t, t + 1)  # per-lane counter (pnp_saga.py's self.t)
        table = jnp.where(dm_table, table, table_new)
        tsum = jnp.where(dm, tsum, tsum_new)
        prev = jnp.where(dm, prev, g)  # prev <- fresh slot value (pnp_saga.py:72)
        log = IterLog(jnp.where(done, start_psnr, psnr_after), psnr_mid, sig)
        return (z, t, done_new, k, table, tsum, prev), log

    done0 = jnp.zeros(z0.shape[:-1], bool)
    init = (z0, jnp.zeros(done0.shape, jnp.int32), done0, key, table0, tsum0, g0)
    (z, _, _, _, _, _, _), logs = jax.lax.scan(
        body, init, jnp.arange(n_iters, dtype=jnp.float32)
    )
    trace = jnp.concatenate([problem.psnr(_img_of(problem, z0))[None], logs.psnr])
    return _result(problem, z, trace)


# ---------------------------------------------------------------------------
# PnP-SARAH  (reference algorithms/pnp_sarah.py:8-129)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_outer",
        "t2",
        "mini_batch_size",
        "variant",
        "converge_check",
        "diverge_check",
    ),
)
def pnp_sarah(
    problem,
    denoiser,
    eta: float,
    n_outer: int,
    t2: int,
    mini_batch_size: int,
    key: jax.Array,
    lr_decay: float = 1.0,
    variant: str = "sarah",
    converge_check: bool = False,
    diverge_check: bool = False,
):
    """Recursive variance-reduced PnP (SARAH).

    ``variant="sarah"`` (default): canonical recursion — differences are
    taken between the two most recent iterates.
    ``variant="faithful"``: reference v1 behavior where the recursion's
    "next" point stays frozen at the denoised step-1 point for the whole
    inner loop (``pnp_sarah.py:72`` — see SURVEY.md §2.2).
    """
    if variant not in ("sarah", "faithful"):
        raise ValueError(f"unknown sarah variant {variant!r}")
    z0 = _z0_of(problem)
    eta = jnp.asarray(eta, jnp.float32)
    lr_decay = jnp.asarray(lr_decay, jnp.float32)
    b = float(mini_batch_size)

    def inner_body(state, _):
        z, w_fix, w_prev, v_prev, t, done, k, i = state
        k, k_mb = jax.random.split(k)
        start_psnr = problem.psnr(z)
        mb = problem.select_mb(k_mb, mini_batch_size)
        anchor = w_fix if variant == "faithful" else z
        v_next = (
            problem.grad_stoch(anchor, mb).reshape(z.shape)
            - problem.grad_stoch(w_prev, mb).reshape(z.shape)
        ) / b + v_prev
        z_new, psnr_after, psnr_mid, sig = _denoise_step(
            problem, denoiser, z, v_next, eta * lr_decay**i, t + 1
        )
        done_new = _check_done(
            done, start_psnr, psnr_after, converge_check, diverge_check
        )
        # faithful: w_previous <- the denoised iterate, which is exactly the
        # next step's z (reference pnp_sarah.py:97-98). Canonical SARAH takes
        # differences between the two most recent iterates, so w_previous
        # must be THIS step's incoming z — using z_new would make anchor and
        # w_prev coincide at the next step and zero out the recursion.
        w_prev_new = z_new if variant == "faithful" else z
        z = jnp.where(done[..., None] if done.ndim else done, z, z_new)
        t = jnp.where(done, t, t + 1)  # per-lane counter (pnp_sarah.py's self.t)
        w_prev = _latch(done, w_prev, w_prev_new)
        v_prev = _latch(done, v_prev, v_next)
        log = IterLog(jnp.where(done, start_psnr, psnr_after), psnr_mid, sig)
        return (z, w_fix, w_prev, v_prev, t, done_new, k, i), log

    def outer_body(state, i):
        z, t, done, k = state
        w_prev = z
        v_prev = problem.grad_full(z).reshape(z.shape)
        # "Step 1" point: single full-gradient step, denoised (:36-48).
        w1, psnr1, _, _ = _denoise_step(problem, denoiser, z, v_prev, eta, t + 1)
        t = jnp.where(done, t, t + 1)  # per-lane counter
        w1 = jnp.where(done[..., None] if done.ndim else done, z, w1)
        if variant == "faithful":
            # Reference keeps z at the outer-start point for the first inner
            # update; w1 only serves as the frozen recursion anchor.
            z_in, w_fix = z, w1
        else:
            # Canonical: continue from the denoised step-1 point.
            z_in, w_fix = w1, w1
        (z, _, _, _, t, done, k, _), logs = jax.lax.scan(
            inner_body, (z_in, w_fix, w_prev, v_prev, t, done, k, i), None, length=t2
        )
        return (z, t, done, k), (psnr1, logs)

    done0 = jnp.zeros(z0.shape[:-1], bool)
    init = (z0, jnp.zeros(done0.shape, jnp.int32), done0, key)
    (z, _, _, _), (step1_psnrs, logs) = jax.lax.scan(
        outer_body, init, jnp.arange(n_outer, dtype=jnp.float32)
    )
    inner = logs.psnr  # (n_outer, t2) or (n_outer, t2, B)
    tail = step1_psnrs.shape[1:]
    inter = jnp.concatenate([step1_psnrs[:, None], inner], axis=1)
    trace = jnp.concatenate(
        [problem.psnr(_img_of(problem, z0))[None], inter.reshape((-1,) + tail)]
    )
    return _result(problem, z, trace)


# ---------------------------------------------------------------------------
# Unified entry point
# ---------------------------------------------------------------------------

def _with_name(fn, name):
    """Attach the host-side algo_name tag after the jitted run (strings are
    not valid jit outputs)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        out = dict(fn(*args, **kwargs))
        out["algo_name"] = name
        return out

    return wrapper


pnp_gd = _with_name(pnp_gd, "PnP GD")
pnp_sgd = _with_name(pnp_sgd, "PnP SGD")
pnp_svrg = _with_name(pnp_svrg, "PnP SVRG")
pnp_saga = _with_name(pnp_saga, "PnP SAGA")
pnp_sarah = _with_name(pnp_sarah, "PnP SARAH")

_ALGOS = {
    "gd": pnp_gd,
    "sgd": pnp_sgd,
    "svrg": pnp_svrg,
    "saga": pnp_saga,
    "sarah": pnp_sarah,
}


def run_pnp(algo: str, problem, denoiser, **kwargs) -> dict[str, Any]:
    """Dispatch to one of the five PnP loops by name."""
    try:
        fn = _ALGOS[algo]
    except KeyError:
        raise ValueError(f"unknown algorithm {algo!r}; have {sorted(_ALGOS)}")
    return fn(problem, denoiser, **kwargs)
