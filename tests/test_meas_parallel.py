"""Measurement-parallel PnP loops: (batch, meas) mesh vs single device.

Proves the SPMD promise of SURVEY.md §2.10 end to end: the five scan loops
run unmodified over a 2-D (batch, meas) mesh with psum gradient reductions,
and the mesh execution equals the single-device execution.

Equivalence strategy: the meas wrapper (parallel/meas.py) runs the identical
program under ``shard_map`` (real mesh collectives) and under
``vmap(axis_name="meas")`` (single device; psum becomes a plain sum). Those
two must agree to float tolerance. Deterministic algorithms (GD) additionally
match the plain *unsharded* run exactly; stochastic ones use stratified
per-shard sampling, so against the unsharded run we check estimator-level
identities (grad_full, f) exactly and reconstruction quality statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.algorithms.loops import _ALGOS
from pnp_svrg_tpu.core.batched import BatchedProblem, stack_problems
from pnp_svrg_tpu.denoisers import TVDenoiser
from pnp_svrg_tpu.parallel import make_mesh, run_batch
from pnp_svrg_tpu.parallel.meas import (
    MeasShardedBatched,
    run_batch_meas_emulated,
    split_meas,
)
from pnp_svrg_tpu.parallel.mesh import MEAS_AXIS
from pnp_svrg_tpu.problems import make_csmri, make_deblur, make_phase_retrieval

DEN = TVDenoiser(sigma_modifier=1.0)


def _images(n, h):
    return [
        jnp.asarray(np.random.default_rng(i).uniform(size=(h, h)), jnp.float32)
        for i in range(n)
    ]


def _batched(problem: str, h=16, bsz=4):
    keys = jax.random.split(jax.random.PRNGKey(0), bsz)
    makers = {
        "csmri": lambda k, im: make_csmri(k, im, sample_prob=0.5, snr=10),
        "pr": lambda k, im: make_phase_retrieval(k, im, num_meas=8 * h * h // 2, snr=20),
        "deblur": lambda k, im: make_deblur(k, im, kernel="Minimal", snr=5),
    }
    return stack_problems(
        [makers[problem](k, im) for k, im in zip(keys, _images(bsz, h))]
    )


def _wrapper_eval(batched, n, method):
    """Evaluate a wrapper method under the single-device vmap emulation."""
    split = split_meas(batched, n)
    f_den = 2.0 * batched.m

    def run(local):
        sp = MeasShardedBatched(BatchedProblem(local), n, f_den)
        return method(sp)

    out = jax.vmap(run, axis_name=MEAS_AXIS)(split)
    return jax.tree_util.tree_map(lambda l: l[0], out)


# ---------------------------------------------------------------------------
# Estimator identities: wrapper == unsharded, exactly
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("problem", ["csmri", "pr", "deblur"])
def test_grad_full_psum_matches_unsharded(problem):
    batched = _batched(problem)
    z = batched.x_init.reshape(batched.batch_size, -1) * 0.9 + 0.01
    ref = np.asarray(batched.grad_full(z)).reshape(batched.batch_size, -1)
    for n in (2, 4):
        got = _wrapper_eval(batched, n, lambda sp: sp.grad_full(z))
        got = np.asarray(got).reshape(batched.batch_size, -1)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("problem", ["csmri", "pr", "deblur"])
def test_f_psum_matches_unsharded(problem):
    batched = _batched(problem)
    z = batched.x_init * 0.8 + 0.05
    ref = np.asarray(batched.f(z))
    got = np.asarray(_wrapper_eval(batched, 4, lambda sp: sp.f(z)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_stratified_select_mb_is_local_and_unionizes():
    batched = _batched("csmri")
    n, k = 4, 32
    split = split_meas(batched, n)

    def run(local):
        sp = MeasShardedBatched(BatchedProblem(local), n, 2.0 * batched.m)
        return sp.select_mb(jax.random.PRNGKey(7), k), local.mask

    mbs, masks = jax.vmap(run, axis_name=MEAS_AXIS)(split)
    mbs, masks = np.asarray(mbs), np.asarray(masks)
    # Each shard samples k/n measurements strictly inside its own mask block.
    assert mbs.sum(axis=(-1, -2)) == pytest.approx(k / n)
    assert ((mbs > 0) <= (masks > 0)).all()
    # Blocks are disjoint, so the union has exactly k per lane.
    assert mbs.sum(axis=0).sum(axis=(-1, -2)) == pytest.approx(k)


def test_split_meas_partitions_measurements():
    for problem in ("csmri", "pr", "deblur"):
        batched = _batched(problem)
        split = split_meas(batched, 4)
        if problem == "csmri":
            total = np.asarray(split.mask).sum(axis=0)
            np.testing.assert_array_equal(total, np.asarray(batched.problems.mask))
        elif problem == "pr":
            rows = np.concatenate(np.asarray(split.a).transpose(0, 1, 2, 3), axis=1)
            np.testing.assert_array_equal(
                rows.reshape(np.asarray(batched.problems.a).shape),
                np.asarray(batched.problems.a),
            )
        else:
            total = np.asarray(split.allowed).sum(axis=0)
            np.testing.assert_array_equal(
                total, np.asarray(batched.problems.allowed)
            )


# ---------------------------------------------------------------------------
# End-to-end loops on a real (4, 2) mesh
# ---------------------------------------------------------------------------

ALGO_HP = {
    "gd": dict(eta=10.0, n_iters=4),
    "sgd": dict(eta=10.0, n_iters=4, mini_batch_size=32),
    "svrg": dict(eta=10.0, n_outer=2, t2=2, mini_batch_size=32),
    "saga": dict(eta=10.0, n_iters=4, mini_batch_size=32, hist_size=3),
    "sarah": dict(eta=10.0, n_outer=2, t2=2, mini_batch_size=32),
}


@pytest.mark.parametrize("algo", sorted(ALGO_HP))
def test_mesh_run_equals_single_device_emulation(algo):
    """shard_map over (4 batch, 2 meas) == vmap emulation on one device."""
    batched = _batched("csmri")
    mesh = make_mesh((4, 2))
    hp = ALGO_HP[algo]
    o_mesh = run_batch(algo, batched, DEN, key=jax.random.PRNGKey(3), mesh=mesh, **hp)
    o_one = run_batch_meas_emulated(
        _ALGOS[algo], batched, DEN, jax.random.PRNGKey(3), 2, **hp
    )
    np.testing.assert_allclose(
        np.asarray(o_mesh["psnr_per_iter"]),
        np.asarray(o_one["psnr_per_iter"]),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(o_mesh["z"]), np.asarray(o_one["z"]), atol=1e-4
    )


@pytest.mark.parametrize("problem", ["pr", "deblur"])
def test_mesh_svrg_other_problems(problem):
    batched = _batched(problem)
    mesh = make_mesh((4, 2))
    hp = ALGO_HP["svrg"]
    o_mesh = run_batch("svrg", batched, DEN, key=jax.random.PRNGKey(3), mesh=mesh, **hp)
    o_one = run_batch_meas_emulated(
        _ALGOS["svrg"], batched, DEN, jax.random.PRNGKey(3), 2, **hp
    )
    np.testing.assert_allclose(
        np.asarray(o_mesh["psnr_per_iter"]),
        np.asarray(o_one["psnr_per_iter"]),
        atol=1e-3,
    )


def test_saga_sharded_table_equals_replicated():
    """SAGA with the history table sharded over the meas axis (each shard
    owns hist_size // n slots, psum'd eviction delta — SURVEY §2.10) must
    reproduce the replicated-table meas run: the update sequence is
    identical, only the storage layout changes. The (4, 2) mesh execution
    must agree with the single-device emulation too."""
    batched = _batched("csmri")
    hp = dict(eta=10.0, n_iters=6, mini_batch_size=32, hist_size=4)
    o_rep = run_batch_meas_emulated(
        _ALGOS["saga"], batched, DEN, jax.random.PRNGKey(3), 2, **hp
    )
    o_sh = run_batch_meas_emulated(
        _ALGOS["saga"], batched, DEN, jax.random.PRNGKey(3), 2,
        table_axis=MEAS_AXIS, table_shards=2, **hp,
    )
    np.testing.assert_allclose(
        np.asarray(o_sh["z"]), np.asarray(o_rep["z"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o_sh["psnr_per_iter"]),
        np.asarray(o_rep["psnr_per_iter"]),
        atol=1e-4,
    )
    mesh = make_mesh((4, 2))
    o_mesh = run_batch(
        "saga", batched, DEN, key=jax.random.PRNGKey(3), mesh=mesh,
        table_axis=MEAS_AXIS, table_shards=2, **hp,
    )
    np.testing.assert_allclose(
        np.asarray(o_mesh["z"]), np.asarray(o_sh["z"]), atol=1e-4
    )


def test_saga_table_shards_validation():
    from pnp_svrg_tpu.algorithms.loops import pnp_saga

    batched = _batched("csmri")
    with pytest.raises(ValueError, match="not divisible"):
        pnp_saga(batched, DEN, eta=1.0, n_iters=2, mini_batch_size=32,
                 key=jax.random.PRNGKey(0), hist_size=5, table_shards=2,
                 table_axis=MEAS_AXIS)
    with pytest.raises(ValueError, match="requires a bound table_axis"):
        pnp_saga(batched, DEN, eta=1.0, n_iters=2, mini_batch_size=32,
                 key=jax.random.PRNGKey(0), hist_size=4, table_shards=2)


def test_mesh_gd_equals_plain_unsharded():
    """GD is deterministic: the (4, 2) mesh run must reproduce the plain
    unsharded batched run (psum'd snapshot == dense grad_full)."""
    batched = _batched("csmri", h=32)
    mesh = make_mesh((4, 2))
    hp = dict(eta=500.0, n_iters=5)
    plain = run_batch("gd", batched, DEN, key=jax.random.PRNGKey(1), **hp)
    shard = run_batch("gd", batched, DEN, key=jax.random.PRNGKey(1), mesh=mesh, **hp)
    np.testing.assert_allclose(
        np.asarray(plain["psnr_per_iter"]),
        np.asarray(shard["psnr_per_iter"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(plain["z"]), np.asarray(shard["z"]), atol=1e-5
    )


def test_mesh_svrg_bm3d_flagship_shape():
    """Production-tiling SPMD check (VERDICT r2 weak #6): the flagship bench
    shape — 128x128 CSMRI lanes, default BM3DParams (block=8, search=12,
    K=16), psum'd SVRG snapshots — must compile and run on the (4, 2)
    (batch, meas) mesh, stay finite, and land within 1 dB of the unsharded
    run on every lane. The 32x32 toy shapes elsewhere can miss layout bugs
    that only appear at real tiling."""
    from pnp_svrg_tpu.denoisers import BM3DDenoiser
    from pnp_svrg_tpu.utils.io import load_image, set12_paths

    h = 128
    paths = set12_paths()[:4]
    imgs = [jnp.asarray(load_image(p, h, h)) for p in paths]
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    batched = stack_problems(
        [make_csmri(k, im, sample_prob=0.5, snr=10) for k, im in zip(keys, imgs)]
    )
    den = BM3DDenoiser(sigma_modifier=1.0)  # default BM3DParams
    mesh = make_mesh((4, 2))
    hp = dict(eta=6000.0, n_outer=2, t2=3, mini_batch_size=4000)
    plain = run_batch("svrg", batched, den, key=jax.random.PRNGKey(5), **hp)
    shard = run_batch("svrg", batched, den, key=jax.random.PRNGKey(5), mesh=mesh, **hp)
    pf_plain = np.asarray(plain["final_psnr"])
    pf_shard = np.asarray(shard["final_psnr"])
    assert np.isfinite(np.asarray(shard["z"])).all()
    assert np.isfinite(pf_shard).all()
    p0 = np.asarray(plain["psnr_per_iter"])[0]
    assert (pf_shard > p0).all(), (pf_shard, p0)
    np.testing.assert_allclose(pf_shard, pf_plain, atol=1.0)


def test_mesh_svrg_reconstruction_quality_matches_unsharded():
    """Stochastic sampling differs (stratified), so compare reconstruction
    quality: the meas-sharded SVRG run must improve over the init and land
    within 1 dB of the unsharded run on every lane."""
    h = 32
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    base = np.sin(5 * xx) * np.cos(4 * yy) * 0.4 + 0.5
    imgs = [jnp.asarray(np.roll(base, 3 * i, axis=0), jnp.float32) for i in range(4)]
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    batched = stack_problems(
        [make_csmri(k, im, sample_prob=0.5, snr=10) for k, im in zip(keys, imgs)]
    )
    mesh = make_mesh((4, 2))
    hp = dict(eta=100.0, n_outer=4, t2=4, mini_batch_size=128)
    plain = run_batch("svrg", batched, DEN, key=jax.random.PRNGKey(5), **hp)
    shard = run_batch("svrg", batched, DEN, key=jax.random.PRNGKey(5), mesh=mesh, **hp)
    p0 = np.asarray(plain["psnr_per_iter"])[0]
    pf_plain = np.asarray(plain["final_psnr"])
    pf_shard = np.asarray(shard["final_psnr"])
    assert (pf_shard > p0).all(), (pf_shard, p0)
    np.testing.assert_allclose(pf_shard, pf_plain, atol=1.0)
