"""pnp_svrg_tpu — a TPU-native plug-and-play image reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``vmonardo/pnp-svrg`` research code (ICIP 2021, "Plug-and-Play Image
Reconstruction Meets Stochastic Variance-Reduced Gradient Methods").

Design stance (vs. the reference's numpy/torch architecture):

* Problems are immutable pytree dataclasses with pure gradient functions
  (reference: stateful ``Problem`` objects, ``problems/problem.py``).
* Algorithms are ``lax.scan``-based fixed-iteration loops, jit-compiled once
  (reference: wall-clock-budgeted Python ``while`` loops, ``algorithms/*.py``).
* Denoisers are pure functions of ``(image, sigma, t)`` — classical kernels
  (TV/wavelet, NLM, BM3D) are implemented natively in jnp/Pallas instead of
  delegating to skimage/bm3d C libraries; CNN denoisers are Flax modules.
* Scaling is a ``jax.sharding.Mesh`` with axes ``(batch, meas)`` — images
  data-parallel, measurements model-parallel with ``psum`` gradient reduction
  (reference: ``multiprocessing.Pool`` + ``nn.DataParallel``).
"""

__version__ = "0.1.0"

from pnp_svrg_tpu.problems import CSMRI, Deblur, PhaseRetrieval
from pnp_svrg_tpu.algorithms import (
    pnp_gd,
    pnp_sgd,
    pnp_svrg,
    pnp_saga,
    pnp_sarah,
    run_pnp,
)
from pnp_svrg_tpu.denoisers import (
    TVDenoiser,
    NLMDenoiser,
    BM3DDenoiser,
)

__all__ = [
    "CSMRI",
    "Deblur",
    "PhaseRetrieval",
    "pnp_gd",
    "pnp_sgd",
    "pnp_svrg",
    "pnp_saga",
    "pnp_sarah",
    "run_pnp",
    "TVDenoiser",
    "NLMDenoiser",
    "BM3DDenoiser",
]
