"""Hyperparameter tuning: TPE search + sweep orchestration.

Native replacement for the reference's hyperopt dependency (reference
``script_diff_sampratio_set12.py:122-129``): a self-contained
tree-structured Parzen estimator with a hyperopt-like ``fmin`` API, and the
Set12 sweep grids re-expressed as batched TPU runs instead of
``multiprocessing.Pool`` fan-outs.
"""

from pnp_svrg_tpu.tuning.tpe import (
    fmin,
    Uniform,
    LogUniform,
    QUniform,
    Choice,
    Trials,
)
from pnp_svrg_tpu.tuning.sweep import (
    sweep_grid,
    SweepCell,
    make_batched_cell_objective,
)

__all__ = [
    "fmin",
    "Uniform",
    "LogUniform",
    "QUniform",
    "Choice",
    "Trials",
    "sweep_grid",
    "make_batched_cell_objective",
    "SweepCell",
]
