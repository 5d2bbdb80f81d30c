#!/usr/bin/env python
"""Summarize a Set12 sweep CSV (examples/sweep_sampratio.py) into the README
table: mean best-final-PSNR per (denoiser, algorithm, sampling ratio) cell,
aggregated over the 12 images.

Older CSVs carry only ``best_loss`` (= init_psnr - final_psnr); in that case
the per-(image, ratio) init PSNRs are recomputed on CPU (the problems are
deterministic in (PRNGKey(i), image, ratio, snr)) and final = init - loss.

Usage: python tools/summarize_sweep.py hyperparam-tuning/set12_csmri_sweep.csv
"""

from __future__ import annotations

import argparse
import csv
import math
import sys
from collections import defaultdict


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_path")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--snr", type=float, default=20.0)
    args = ap.parse_args(argv)

    rows = list(csv.DictReader(open(args.csv_path)))
    need_init = any(
        not r.get("best_psnr") or math.isnan(float(r["best_psnr"]))
        for r in rows
    )
    inits: dict = {}
    if need_init:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_platforms", "cpu")
        from pnp_svrg_tpu.problems import make_csmri
        from pnp_svrg_tpu.utils.io import load_image, set12_paths

        paths = {p.name: p for p in set12_paths()}
        idx = {p.name: i for i, p in enumerate(set12_paths())}
        keys_needed = sorted(
            {(r["image"], float(r["ratio"])) for r in rows
             if r["problem"] == "csmri"}
        )
        for image, ratio in keys_needed:
            i = idx[image]
            img = jnp.asarray(load_image(paths[image], args.size, args.size))
            prob = make_csmri(jax.random.PRNGKey(i), img, sample_prob=ratio,
                              snr=args.snr)
            inits[(image, ratio)] = float(prob.psnr(prob.x_init))
            print(f"init {image} ratio={ratio}: "
                  f"{inits[(image, ratio)]:.2f} dB", file=sys.stderr)

    cells = defaultdict(list)
    for r in rows:
        bp = r.get("best_psnr")
        if bp and not math.isnan(float(bp)):
            final = float(bp)
        else:
            final = inits[(r["image"], float(r["ratio"]))] - float(
                r["best_loss"]
            )
        cells[(r["problem"], r["denoiser"], r["algorithm"],
               float(r["ratio"]))].append(final)

    ratios = sorted({k[3] for k in cells})
    print("| problem | denoiser | algo | " +
          " | ".join(f"ratio {r:g}" for r in ratios) + " |")
    print("|---" * (3 + len(ratios)) + "|")
    for (prob, den, algo) in sorted({k[:3] for k in cells}):
        vals = []
        for r in ratios:
            v = cells.get((prob, den, algo, r))
            vals.append(f"{sum(v) / len(v):.2f}" if v else "-")
        print(f"| {prob} | {den} | {algo} | " + " | ".join(vals) + " |")


if __name__ == "__main__":
    main()
