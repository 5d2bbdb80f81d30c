"""Result visualization and metrics reporting.

Native equivalent of the reference's L4 layer: ``Utilities.display_results``
(output image + PSNR-vs-time curve + printed/CSV metrics, reference
``Utilities.py:5-64``) and the ``utils.py`` grid/animation helpers
(``show_multiple/show_grid/psnr_display``, reference ``utils.py:8-96``).
Matplotlib imports are deferred so headless/batch runs never pay for them.

The reference's ``display_results`` has a format-string bug that prints the
gradient time in the denoise column (duplicated ``{3}`` field,
``Utilities.py:51-53``); fixed here.
"""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np


def summarize_results(problem, output: dict) -> dict:
    """Metrics dict for one reconstruction run (the data behind the
    reference's printed table)."""
    psnrs = np.asarray(output["psnr_per_iter"], dtype=float)
    return {
        "algo_name": output.get("algo_name", "?"),
        "output_psnr": float(psnrs[-1]),
        "delta_psnr": float(psnrs[-1] - psnrs[0]),
        "gradient_time": float(output.get("gradient_time", float("nan"))),
        "denoise_time": float(output.get("denoise_time", float("nan"))),
        "n_iters": int(len(psnrs) - 1),
    }


def write_metrics_csv(rows: list[dict], path: str | Path) -> None:
    """CSV emitter (reference ``Utilities.py:54-63`` / sweep scripts)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if not rows:
        return
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)


def display_results(
    problem,
    output: dict,
    save_results: bool = False,
    save_dir: str | Path = "figures",
    show: bool = False,
    color_map: str = "gray",
):
    """Render the output image and the PSNR-vs-cumulative-time curve
    (reference ``Utilities.py:5-64``); returns the summary dict."""
    import matplotlib

    if not show:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    summary = summarize_results(problem, output)
    z = np.asarray(output["z"]).reshape(problem.h, problem.w)
    psnrs = np.asarray(output["psnr_per_iter"], dtype=float)
    times = np.asarray(output.get("time_per_iter", np.arange(len(psnrs))), dtype=float)
    cumt = np.cumsum(times)

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    axes[0].imshow(z, cmap=color_map, vmin=0, vmax=1)
    axes[0].set_title(f"{summary['algo_name']}: {summary['output_psnr']:.2f} dB")
    axes[0].set_xticks([])
    axes[0].set_yticks([])
    axes[1].plot(cumt, psnrs, marker="o", markevery=max(len(psnrs) // 30, 1))
    axes[1].set_xlabel("time (s)" if "time_per_iter" in output else "iteration")
    axes[1].set_ylabel("PSNR (dB)")
    axes[1].set_title("PSNR vs time")
    fig.tight_layout()

    if save_results:
        out_dir = Path(save_dir) / getattr(problem, "pname", "run")
        out_dir.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_dir / f"{summary['algo_name'].replace(' ', '_')}.png",
                    dpi=150, bbox_inches="tight")
        write_metrics_csv([summary], out_dir / "metrics.csv")
    if show:
        plt.show()
    else:
        plt.close(fig)
    return summary


def show_grid(images, titles=None, ncols=4, color_map="gray", show=False):
    """Grid display helper (reference ``utils.py:show_grid``)."""
    import matplotlib

    if not show:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    images = [np.asarray(im) for im in images]
    n = len(images)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 3 * nrows))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            ax.imshow(images[i], cmap=color_map, vmin=0, vmax=1)
            if titles:
                ax.set_title(titles[i], fontsize=9)
    fig.tight_layout()
    if show:
        plt.show()
    return fig
