"""Batched multi-image reconstruction, data-parallel over the mesh.

The TPU replacement for the reference's per-image ``multiprocessing.Pool``
fan-out (reference ``script_diff_sampratio_set12.py:142-146``): stack problem
pytrees along a leading batch axis, vmap the whole jitted PnP loop, and place
the batch axis on the mesh ``batch`` axis. One compile, B images per step,
scaling linearly in chips.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pnp_svrg_tpu.algorithms.loops import _ALGOS
from pnp_svrg_tpu.parallel.mesh import BATCH_AXIS


def stack_problems(problems: Sequence):
    """Stack same-shape problem pytrees along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *problems)


def run_batch(
    algo: str,
    stacked_problems,
    denoiser,
    keys: jax.Array | None = None,
    mesh=None,
    **hp,
):
    """Run one PnP algorithm over a stacked problem batch via vmap.

    ``keys``: (B, 2) PRNG keys (one per image, required for stochastic
    algorithms). With ``mesh``, inputs are placed so the batch axis shards
    over the mesh ``batch`` axis (and the run is jitted with those shardings).
    """
    fn = _ALGOS[algo]
    b = jax.tree_util.tree_leaves(stacked_problems)[0].shape[0]
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), b)

    if mesh is not None:
        shard = NamedSharding(mesh, P(BATCH_AXIS))
        stacked_problems = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), stacked_problems
        )
        keys = jax.device_put(keys, shard)

    def single(problem, key):
        out = fn(problem, denoiser, key=key, **hp)
        # Drop the host-side algo_name tag: strings cannot cross vmap.
        return {k: v for k, v in out.items() if k != "algo_name"}

    return jax.vmap(single)(stacked_problems, keys)


def reconstruct_set12(
    algo: str,
    make_problem,
    denoiser,
    h: int = 128,
    w: int = 128,
    mesh=None,
    seed: int = 0,
    **hp,
):
    """Build one problem per Set12 image and reconstruct the whole batch.

    ``make_problem(key, image) -> problem`` is a constructor closure (e.g.
    ``lambda k, im: make_csmri(k, im, sample_prob=0.5, snr=10)``).
    """
    from pnp_svrg_tpu.utils.io import set12_paths, load_image

    paths = set12_paths()
    keys = jax.random.split(jax.random.PRNGKey(seed), len(paths))
    problems = [
        make_problem(k, jnp.asarray(load_image(p, h, w)))
        for k, p in zip(keys, paths)
    ]
    stacked = stack_problems(problems)
    run_keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(paths))
    return run_batch(algo, stacked, denoiser, keys=run_keys, mesh=mesh, **hp)
