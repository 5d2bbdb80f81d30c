"""Forward models: CSMRI, Deblur/SR, Phase Retrieval.

Mirror of the reference's problem layer (``problems/__init__.py:4-7``) as
pytree dataclasses + pure constructors.
"""

from pnp_svrg_tpu.problems.csmri import CSMRI, make_csmri
from pnp_svrg_tpu.problems.deblur import (
    Deblur,
    make_deblur,
    make_minimal_kernel,
    make_identity_kernel,
)
from pnp_svrg_tpu.problems.pr import PhaseRetrieval, make_phase_retrieval, spectral_init

__all__ = [
    "CSMRI",
    "make_csmri",
    "Deblur",
    "make_deblur",
    "make_minimal_kernel",
    "make_identity_kernel",
    "PhaseRetrieval",
    "make_phase_retrieval",
    "spectral_init",
]
