"""Distributed layer: device mesh, sharded gradients, batched runners.

The reference's entire parallel story is a ``multiprocessing.Pool`` over
Set12 images plus ``nn.DataParallel`` for CNN denoisers (SURVEY.md §2.10).
Here parallelism is a first-class ``jax.sharding.Mesh`` with two axes:

* ``batch`` — data parallel over images (the Pool replacement),
* ``meas``  — measurement parallel: PR's dense A row-sharded / CSMRI mask
  row-sharded, partial gradients reduced with ``psum`` over ICI (the
  tensor-parallel analog; full-gradient snapshots in SVRG/SARAH become one
  allreduce).
"""

from pnp_svrg_tpu.parallel.mesh import (
    make_mesh,
    make_spatial_mesh,
    init_distributed,
    BATCH_AXIS,
    MEAS_AXIS,
    SPATIAL_AXIS,
)
from pnp_svrg_tpu.core.batched import BatchedProblem, stack_problems
from pnp_svrg_tpu.parallel.runner import (
    run_batch,
    reconstruct_set12,
)
from pnp_svrg_tpu.parallel.sharded import (
    shard_pr_problem,
    pr_grad_full_sharded,
    sharded_pnp_step,
)
from pnp_svrg_tpu.parallel.meas import (
    split_meas,
    MeasShardedBatched,
    run_batch_meas_sharded,
    run_batch_meas_emulated,
)
from pnp_svrg_tpu.parallel.spatial import (
    denoise_spatial,
    nlm_denoise_spatial,
    bm3d_denoise_spatial,
    SpatialTiledDenoiser,
    run_batch_spatial,
)

__all__ = [
    "make_mesh",
    "make_spatial_mesh",
    "init_distributed",
    "BATCH_AXIS",
    "MEAS_AXIS",
    "SPATIAL_AXIS",
    "BatchedProblem",
    "stack_problems",
    "run_batch",
    "reconstruct_set12",
    "shard_pr_problem",
    "pr_grad_full_sharded",
    "sharded_pnp_step",
    "split_meas",
    "MeasShardedBatched",
    "run_batch_meas_sharded",
    "run_batch_meas_emulated",
    "denoise_spatial",
    "nlm_denoise_spatial",
    "bm3d_denoise_spatial",
    "SpatialTiledDenoiser",
    "run_batch_spatial",
]
