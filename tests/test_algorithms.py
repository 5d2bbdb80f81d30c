"""Algorithm-loop tests: every PnP variant improves PSNR end-to-end on a small
CSMRI instance, traces have the right layout, early-exit latches freeze state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.algorithms import (
    pnp_gd,
    pnp_sgd,
    pnp_svrg,
    pnp_saga,
    pnp_sarah,
    run_pnp,
)
from pnp_svrg_tpu.denoisers import TVDenoiser
from pnp_svrg_tpu.problems import make_csmri


def _problem(key, h=32):
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    img = jnp.asarray(np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5, jnp.float32)
    return make_csmri(key, img, sample_prob=0.5, snr=10)


@pytest.fixture(scope="module")
def prob():
    return _problem(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def den():
    return TVDenoiser(sigma_modifier=0.7)


def test_gd_improves_psnr(prob, den):
    out = pnp_gd(prob, den, eta=100.0, n_iters=30)
    assert out["psnr_per_iter"].shape == (31,)
    assert float(out["final_psnr"]) > float(out["psnr_per_iter"][0]) + 1.0


def test_sgd_improves_psnr(prob, den, key):
    out = pnp_sgd(prob, den, eta=100.0, n_iters=30, mini_batch_size=100, key=key)
    assert out["psnr_per_iter"].shape == (31,)
    assert float(out["final_psnr"]) > float(out["psnr_per_iter"][0]) + 0.5


@pytest.mark.parametrize("variant", ["svrg", "faithful"])
def test_svrg_improves_psnr(prob, den, key, variant):
    out = pnp_svrg(
        prob, den, eta=100.0, n_outer=4, t2=8, mini_batch_size=100, key=key,
        variant=variant,
    )
    assert out["psnr_per_iter"].shape == (1 + 4 * 9,)
    assert float(out["final_psnr"]) > float(out["psnr_per_iter"][0]) + 0.5


def test_saga_improves_psnr(prob, den, key):
    out = pnp_saga(
        prob, den, eta=100.0, n_iters=30, mini_batch_size=100, key=key, hist_size=8
    )
    assert float(out["final_psnr"]) > float(out["psnr_per_iter"][0]) + 0.5


# The faithful (frozen-anchor) variant amplifies gradient variance and
# diverges at the step size the canonical recursion tolerates.
@pytest.mark.parametrize("variant,eta", [("sarah", 100.0), ("faithful", 50.0)])
def test_sarah_improves_psnr(prob, den, key, variant, eta):
    out = pnp_sarah(
        prob, den, eta=eta, n_outer=4, t2=8, mini_batch_size=100, key=key,
        variant=variant,
    )
    assert out["psnr_per_iter"].shape == (1 + 4 * 9,)
    assert float(out["final_psnr"]) > float(out["psnr_per_iter"][0]) + 0.5


def test_run_pnp_dispatch(prob, den, key):
    out = run_pnp("gd", prob, den, eta=100.0, n_iters=3)
    assert out["algo_name"] == "PnP GD"
    with pytest.raises(ValueError):
        run_pnp("nope", prob, den)


def test_deterministic_given_key(prob, den, key):
    a = pnp_sgd(prob, den, eta=100.0, n_iters=10, mini_batch_size=50, key=key)
    b = pnp_sgd(prob, den, eta=100.0, n_iters=10, mini_batch_size=50, key=key)
    np.testing.assert_array_equal(a["z"], b["z"])


def test_lr_decay_changes_trajectory(prob, den, key):
    a = pnp_sgd(prob, den, eta=100.0, n_iters=10, mini_batch_size=50, key=key)
    b = pnp_sgd(
        prob, den, eta=100.0, n_iters=10, mini_batch_size=50, key=key, lr_decay=0.5
    )
    assert not np.allclose(a["z"], b["z"])


def test_diverge_check_latches(den, key):
    # A huge step size makes PSNR collapse; with diverge_check the trace
    # freezes after the first PSNR < 0 iteration.
    prob = _problem(jax.random.PRNGKey(3))
    out = pnp_gd(prob, den, eta=1e9, n_iters=12, diverge_check=True)
    trace = np.asarray(out["psnr_per_iter"])
    neg = np.nonzero(trace < 0)[0]
    assert len(neg) > 0
    first = neg[0]
    if first + 1 < len(trace):
        np.testing.assert_array_equal(trace[first + 1 :], trace[first])


def test_svrg_vs_faithful_differ(prob, den, key):
    a = pnp_svrg(prob, den, eta=100.0, n_outer=3, t2=5, mini_batch_size=50, key=key)
    b = pnp_svrg(
        prob, den, eta=100.0, n_outer=3, t2=5, mini_batch_size=50, key=key,
        variant="faithful",
    )
    assert not np.allclose(a["z"], b["z"])


def test_vmap_over_problem_batch(den, key):
    # Batched multi-image reconstruction: vmap the whole loop over stacked
    # problems (the TPU replacement for the reference's multiprocessing.Pool).
    probs = [_problem(jax.random.PRNGKey(i)) for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *probs)
    fn = lambda p: pnp_gd(p, den, eta=100.0, n_iters=5)["final_psnr"]
    batched = jax.vmap(fn)(stacked)
    single = fn(probs[1])
    np.testing.assert_allclose(batched[1], single, atol=1e-3)
