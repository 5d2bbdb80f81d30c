"""Sweep orchestration: the reference's Set12 grid scripts, TPU-style.

Re-design of ``script_diff_sampratio_set12.py`` / ``script_diff_snr_set12.py``:
the reference fans 12 images out over a ``multiprocessing.Pool`` and runs a
hyperopt TPE search per (problem x algorithm x denoiser x ratio x SNR x image)
cell with 30-second wall-clock trials. Here each cell's trials are
*iteration-budgeted scan runs* — the jitted loop is compiled once per cell
and re-invoked per TPE trial (hyperparameters are traced scalars where
possible), so a full 100-eval search costs 100 device invocations of the
same executable, no recompiles, no process pool.
"""

from __future__ import annotations

import csv
import dataclasses
import itertools
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pnp_svrg_tpu.algorithms import run_pnp
from pnp_svrg_tpu.tuning.tpe import fmin, TPEState, Uniform, LogUniform, QUniform


@dataclasses.dataclass
class SweepCell:
    problem_name: str
    algo: str
    denoiser_name: str
    image: str
    ratio: float
    snr: float
    best_loss: float
    best_params: dict
    best_psnr: float = float("nan")  # final PSNR of the best trial


# Default search spaces per algorithm, mirroring the reference's hyperopt
# spaces (script_diff_sampratio_set12.py:64-107) but in eta units matched to
# our exact-gradient scaling.
def default_space(algo: str, m: int) -> dict:
    base = {
        "eta": LogUniform(1e-2, 1e4),
        "dstrength": Uniform(0.3, 2.0),
    }
    if algo in ("sgd", "svrg", "saga", "sarah"):
        base["mini_batch_size"] = QUniform(100, min(5000, m), 100)
    if algo in ("svrg", "sarah"):
        base["t2"] = QUniform(2, 20, 1)
    if algo == "saga":
        base["hist_size"] = QUniform(5, 30, 1)
    return base


def make_cell_objective(
    algo: str,
    problem,
    denoiser_factory: Callable[[float], Any],
    n_iters: int = 100,
    seed: int = 0,
):
    """Objective for one sweep cell: loss = PSNR(init) - PSNR(final) at a
    fixed iteration budget (the wall-clock-free analog of reference
    ``tune_pnp_svrg``)."""
    key = jax.random.PRNGKey(seed)
    init_psnr = float(problem.psnr(problem.x_init))

    def objective(params: dict) -> dict:
        den = denoiser_factory(params.get("dstrength", 1.0))
        kwargs: dict[str, Any] = {"eta": params["eta"], "key": key}
        if algo in ("sgd", "saga"):
            kwargs.update(
                n_iters=n_iters, mini_batch_size=int(params["mini_batch_size"])
            )
            if algo == "saga":
                kwargs["hist_size"] = int(params["hist_size"])
        elif algo in ("svrg", "sarah"):
            t2 = int(params["t2"])
            kwargs.update(
                n_outer=max(1, n_iters // (t2 + 1)),
                t2=t2,
                mini_batch_size=int(params["mini_batch_size"]),
            )
        else:
            kwargs["n_iters"] = n_iters
        out = run_pnp(algo, problem, den, diverge_check=True, **kwargs)
        final = float(out["final_psnr"])
        if not (final == final):  # NaN guard
            final = -100.0
        return {"loss": init_psnr - final, "final_psnr": final}

    return objective


def make_batched_cell_objective(
    algo: str,
    problem,
    denoiser_factory: Callable[[Any], Any],
    n_iters: int = 100,
    seed: int = 0,
):
    """Batch objective: evaluate a ROUND of TPE candidates in one compiled run.

    The continuous hyperparameters (eta, denoiser strength) are traced
    per-lane values, so C candidates become a C-wide problem batch driven by
    one ``run_pnp`` invocation — the TPU-native replacement for hyperopt's
    sequential trial loop. Candidates are grouped by their *static* keys
    (mini_batch_size / t2 / hist_size) since those shape the program.

    Pass to :func:`pnp_svrg_tpu.tuning.fmin` as ``batch_objective`` together
    with ``batch_size``. Measured payoff: large when single-trial runs
    underutilize the chip (small images, CPU) or when dispatch latency
    dominates; at 128^2 with BM3D one trial already nearly saturates a v5e
    (1.62 -> 1.35 ms per image-iteration going 1 -> 8 lanes), so there the
    win is mostly the per-trial dispatch overhead.
    """
    from pnp_svrg_tpu.core.batched import stack_problems

    key = jax.random.PRNGKey(seed)
    init_psnr = float(problem.psnr(problem.x_init))

    def run_group(group: list[tuple[int, dict]]):
        c = len(group)
        batched = stack_problems([problem] * c)
        eta = jnp.asarray([p["eta"] for _, p in group], jnp.float32)
        dstr = jnp.asarray(
            [p.get("dstrength", 1.0) for _, p in group], jnp.float32
        )
        den = denoiser_factory(dstr)
        p0 = group[0][1]
        kwargs: dict[str, Any] = {"eta": eta, "key": key}
        if algo in ("sgd", "saga"):
            kwargs.update(
                n_iters=n_iters, mini_batch_size=int(p0["mini_batch_size"])
            )
            if algo == "saga":
                kwargs["hist_size"] = int(p0["hist_size"])
        elif algo in ("svrg", "sarah"):
            t2 = int(p0["t2"])
            kwargs.update(
                n_outer=max(1, n_iters // (t2 + 1)),
                t2=t2,
                mini_batch_size=int(p0["mini_batch_size"]),
            )
        else:
            kwargs["n_iters"] = n_iters
        out = run_pnp(algo, batched, den, diverge_check=True, **kwargs)
        import numpy as np

        finals = np.asarray(out["final_psnr"], float)
        finals = np.where(np.isfinite(finals), finals, -100.0)
        return [
            (i, {"loss": init_psnr - f, "final_psnr": float(f)})
            for (i, _), f in zip(group, finals)
        ]

    def static_sig(p: dict):
        return tuple(
            int(p[k]) for k in ("mini_batch_size", "t2", "hist_size") if k in p
        )

    def batch_objective(params_list: list[dict]):
        groups: dict[tuple, list[tuple[int, dict]]] = {}
        for i, p in enumerate(params_list):
            groups.setdefault(static_sig(p), []).append((i, p))
        results: list = [None] * len(params_list)
        for group in groups.values():
            for i, res in run_group(group):
                results[i] = res
        return results

    return batch_objective


def _write_csv(results: Sequence["SweepCell"], csv_path) -> None:
    path = Path(csv_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(
            ["problem", "denoiser", "algorithm", "ratio", "snr", "image",
             "best_loss", "best_psnr", "best_params"]
        )
        for r in results:
            writer.writerow(
                [r.problem_name, r.denoiser_name, r.algo, r.ratio, r.snr,
                 r.image, r.best_loss, r.best_psnr, r.best_params]
            )


def sweep_grid_lockstep(
    cells: Sequence[dict],
    max_evals: int = 20,
    n_iters: int = 60,
    cand_per_round: int = 3,
    max_lanes: int = 48,
    csv_path: str | Path | None = None,
    verbose: bool = True,
) -> list[SweepCell]:
    """Run MANY per-cell TPE searches in lockstep, batching a round of
    candidates from every cell into shared compiled programs.

    The reference fans its per-image searches over a ``multiprocessing.Pool``
    (``script_diff_sampratio_set12.py:146-150``); the TPU-native replacement
    is lane parallelism: all cells that share (problem family, algorithm,
    denoiser) — e.g. the 12 Set12 images x 3 ratios of one grid cell class —
    propose ``cand_per_round`` candidates each per round, and the whole round
    runs as ceil(lanes / max_lanes) batched ``run_pnp`` invocations.

    jit-static hyperparameters (mini_batch_size / t2 / hist_size) must agree
    across a batch, so each round designates a rotating LEADER cell whose
    TPE proposal fixes the statics for everyone that round (cells still
    explore continuous dimensions independently; statics are explored across
    rounds through the rotating leadership). Search-space statics should be
    coarsely quantized so the compile universe stays small.

    Cell dicts need the same keys as :func:`sweep_grid`. Cells are grouped by
    (problem_name, algo, denoiser_name); problems in one group must have
    identical pytree shapes (same image size / measurement count).
    """
    from pnp_svrg_tpu.core.batched import stack_problems

    groups: dict[tuple, list[dict]] = {}
    for cell in cells:
        key = (cell["problem_name"], cell["algo"], cell["denoiser_name"],
               cell.get("ratio", 0.0))
        groups.setdefault(key, []).append(cell)

    results: list[SweepCell] = []
    for (prob_name, algo, den_name, _ratio), members in groups.items():
        space = members[0].get("space") or default_space(
            algo, members[0]["problem"].m
        )
        static_keys = tuple(
            k for k in ("mini_batch_size", "t2", "hist_size") if k in space
        )
        states = [
            TPEState(space, seed=1000 * i + int(members[i].get("seed", 0)),
                     shared_keys=static_keys, n_startup=max(2, max_evals // 4))
            for i in range(len(members))
        ]
        init_psnrs = [
            float(c["problem"].psnr(c["problem"].x_init)) for c in members
        ]
        rounds = -(-max_evals // cand_per_round)
        for rnd in range(rounds):
            take = min(cand_per_round, max_evals - len(states[0].trials))
            if take <= 0:
                break
            leader_idx = rnd % len(states)
            lead_params = states[leader_idx].ask(take)
            forced = {k: lead_params[0][k] for k in static_keys}
            proposals: list[tuple[int, dict]] = []
            for ci, st in enumerate(states):
                if ci == leader_idx:
                    proposals += [(ci, p) for p in lead_params]
                else:
                    proposals += [(ci, p) for p in st.ask(take, forced=forced)]
            # Evaluate in chunks of <= max_lanes lanes (pad by repeating).
            for start in range(0, len(proposals), max_lanes):
                chunk = proposals[start : start + max_lanes]
                n_real = len(chunk)
                while len(chunk) < min(max_lanes, len(proposals)):
                    chunk.append(chunk[-1])
                probs = [members[ci]["problem"] for ci, _ in chunk]
                batched = stack_problems(probs)
                eta = jnp.asarray([p["eta"] for _, p in chunk], jnp.float32)
                dstr = jnp.asarray(
                    [p.get("dstrength", 1.0) for _, p in chunk], jnp.float32
                )
                den = members[0]["denoiser_factory"](dstr)
                kwargs: dict[str, Any] = {
                    "eta": eta, "key": jax.random.PRNGKey(rnd),
                }
                if algo in ("sgd", "saga"):
                    kwargs.update(n_iters=n_iters,
                                  mini_batch_size=int(forced["mini_batch_size"]))
                    if algo == "saga":
                        kwargs["hist_size"] = int(forced["hist_size"])
                elif algo in ("svrg", "sarah"):
                    t2 = int(forced["t2"])
                    kwargs.update(
                        n_outer=max(1, n_iters // (t2 + 1)), t2=t2,
                        mini_batch_size=int(forced["mini_batch_size"]),
                    )
                else:
                    kwargs["n_iters"] = n_iters
                out = run_pnp(algo, batched, den, diverge_check=True, **kwargs)
                finals = np.asarray(out["final_psnr"], float)
                finals = np.where(np.isfinite(finals), finals, -100.0)
                for (ci, p), f in zip(chunk[:n_real], finals[:n_real]):
                    states[ci].tell(
                        p,
                        {"loss": init_psnrs[ci] - float(f),
                         "final_psnr": float(f)},
                    )
            if verbose:
                done = len(states[0].trials)
                best = min(st.best.loss for st in states)
                print(
                    f"[lockstep {prob_name}/{algo}/{den_name}] round "
                    f"{rnd + 1}/{rounds}: {done} evals/cell, best loss "
                    f"{best:.2f}",
                    flush=True,
                )
        for cell, st in zip(members, states):
            rec = SweepCell(
                problem_name=prob_name,
                algo=algo,
                denoiser_name=den_name,
                image=str(cell.get("image", "")),
                ratio=float(cell.get("ratio", 0.0)),
                snr=float(cell.get("snr", 0.0)),
                best_loss=st.best.loss,
                best_params=dict(st.best.params),
                best_psnr=float(st.best.extra.get("final_psnr", float("nan"))),
            )
            results.append(rec)
            if verbose:
                print(
                    f"[lockstep] {rec.problem_name}/{rec.algo}/"
                    f"{rec.denoiser_name}/{rec.image} ratio={rec.ratio}: "
                    f"best loss {rec.best_loss:.2f} params {rec.best_params}",
                    flush=True,
                )
        if csv_path is not None:
            _write_csv(results, csv_path)  # incremental checkpoint per group
    return results


def sweep_grid(
    cells: Sequence[dict],
    max_evals: int = 25,
    n_iters: int = 100,
    csv_path: str | Path | None = None,
    verbose: bool = True,
    trial_batch: int = 1,
) -> list[SweepCell]:
    """Run a TPE search per cell dict and optionally emit a CSV.

    Each cell dict needs: problem (instance), algo (str), denoiser_factory
    (dstrength -> denoiser), and labels problem_name/denoiser_name/image/
    ratio/snr. CSV columns mirror the reference's sweep output
    (``script_diff_sampratio_set12.py:151-160``). ``trial_batch > 1``
    evaluates that many TPE candidates per compiled run (batched trials).
    """
    results = []
    for cell in cells:
        problem = cell["problem"]
        algo = cell["algo"]
        space = cell.get("space") or default_space(algo, problem.m)
        if trial_batch > 1:
            # jit-static hyperparameters are proposed once per round so each
            # round of trial_batch candidates runs as ONE compiled program.
            static = tuple(
                k for k in ("mini_batch_size", "t2", "hist_size") if k in space
            )
            best, trials = fmin(
                None,
                space,
                max_evals=max_evals,
                seed=cell.get("seed", 0),
                batch_size=trial_batch,
                batch_objective=make_batched_cell_objective(
                    algo, problem, cell["denoiser_factory"], n_iters=n_iters,
                    seed=cell.get("seed", 0),
                ),
                shared_keys=static,
            )
        else:
            objective = make_cell_objective(
                algo, problem, cell["denoiser_factory"], n_iters=n_iters,
                seed=cell.get("seed", 0),
            )
            best, trials = fmin(
                objective, space, max_evals=max_evals, seed=cell.get("seed", 0)
            )
        rec = SweepCell(
            problem_name=cell.get("problem_name", type(problem).__name__),
            algo=algo,
            denoiser_name=cell.get("denoiser_name", "denoiser"),
            image=str(cell.get("image", "")),
            ratio=float(cell.get("ratio", 0.0)),
            snr=float(cell.get("snr", 0.0)),
            best_loss=trials.best.loss,
            best_params=dict(trials.best.params),
            best_psnr=float(
                trials.best.extra.get("final_psnr", float("nan"))
            ),
        )
        results.append(rec)
        if verbose:
            print(
                f"[sweep] {rec.problem_name}/{rec.algo}/{rec.denoiser_name}"
                f"/{rec.image} ratio={rec.ratio} snr={rec.snr}: "
                f"best loss {rec.best_loss:.2f} params {rec.best_params}"
            )
    if csv_path is not None:
        _write_csv(results, csv_path)
    return results
