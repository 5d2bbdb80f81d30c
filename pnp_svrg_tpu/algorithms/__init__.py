"""PnP optimizer loops (GD / SGD / SVRG / SAGA / SARAH)."""

from pnp_svrg_tpu.algorithms.loops import (
    pnp_gd,
    pnp_sgd,
    pnp_svrg,
    pnp_saga,
    pnp_sarah,
    run_pnp,
    IterLog,
    TOL,
)

__all__ = [
    "pnp_gd",
    "pnp_sgd",
    "pnp_svrg",
    "pnp_saga",
    "pnp_sarah",
    "run_pnp",
    "IterLog",
    "TOL",
]
