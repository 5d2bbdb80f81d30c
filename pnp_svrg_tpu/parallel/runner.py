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
from pnp_svrg_tpu.core.batched import BatchedProblem, stack_problems
from pnp_svrg_tpu.parallel.mesh import BATCH_AXIS, MEAS_AXIS


def run_batch(
    algo: str,
    batched_problem,
    denoiser,
    key: jax.Array | None = None,
    mesh=None,
    image_shards: int | None = None,
    **hp,
):
    """Run one PnP algorithm over a problem batch in a single compiled loop.

    ``batched_problem``: a :class:`BatchedProblem` (or a list of problems,
    stacked here). The batch-polymorphic loops carry (B, N) state and call
    the denoiser once per step with the (B, H, W) stack — BM3D/NLM/CNN
    denoisers hit their natively-batched kernels. With ``mesh``, the batch
    axis is sharded over the mesh ``batch`` axis.

    ``image_shards=k`` row-shards the denoise step over a ``spatial`` mesh
    axis with halo border semantics (parallel/spatial.py — for images whose
    denoiser working set exceeds one chip; requires a windowed denoiser with
    a bounded path: BM3D or NLM). Pass a (batch, spatial) mesh from
    ``make_spatial_mesh`` or let one be built over all devices; the batch
    size must divide by the mesh ``batch`` axis.
    """
    if isinstance(batched_problem, (list, tuple)):
        batched_problem = stack_problems(batched_problem)
    fn = _ALGOS[algo]
    if key is None:
        key = jax.random.PRNGKey(0)

    if image_shards is not None and image_shards > 1:
        from pnp_svrg_tpu.parallel.mesh import SPATIAL_AXIS, make_spatial_mesh
        from pnp_svrg_tpu.parallel.spatial import run_batch_spatial

        if mesh is None:
            n = len(jax.devices())
            mesh = make_spatial_mesh((n // image_shards, image_shards))
        elif (
            SPATIAL_AXIS not in mesh.shape
            or mesh.shape[SPATIAL_AXIS] != image_shards
        ):
            raise ValueError(
                f"mesh {dict(mesh.shape)} has no spatial axis of size "
                f"{image_shards}; build one with make_spatial_mesh"
            )
        return run_batch_spatial(fn, batched_problem, denoiser, key, mesh, **hp)

    if mesh is not None and MEAS_AXIS in mesh.shape and mesh.shape[MEAS_AXIS] > 1:
        # 2-D (batch, meas) mesh: the whole scan loop runs SPMD with psum
        # gradient reductions over the meas axis (parallel/meas.py).
        from pnp_svrg_tpu.parallel.meas import run_batch_meas_sharded

        return run_batch_meas_sharded(
            fn, batched_problem, denoiser, key, mesh, **hp
        )

    if mesh is not None:
        shard = NamedSharding(mesh, P(BATCH_AXIS))
        batched_problem = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), batched_problem
        )

    out = fn(batched_problem, denoiser, key=key, **hp)
    return {k: v for k, v in out.items() if k != "algo_name"}


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
    batched = stack_problems(problems)
    return run_batch(
        algo, batched, denoiser, key=jax.random.PRNGKey(seed + 1), mesh=mesh, **hp
    )
