#!/usr/bin/env python
"""Measure the bench program across BM3D matching-cost configurations.

Times the exact bench workload (13-lane batched SVRG+BM3D, tuned per-lane
eta/mod) for each (search, topk, match_dtype) combination and reports
image-iterations/s plus the Set12 mean PSNR — the data behind the
operating-point choices recorded in BENCH JSON.

Usage: python tools/measure_bm3d_knobs.py [--outer 16] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outer", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pnp_svrg_tpu.algorithms.loops import pnp_svrg
    from pnp_svrg_tpu.core.batched import stack_problems
    from pnp_svrg_tpu.denoisers.bm3d import BM3DDenoiser, BM3DParams
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.utils.io import set12_paths, load_image, resolve_data_path

    h = w = 128
    tuned_path = os.path.join(
        os.path.dirname(__file__), "..", "data", "set12_csmri_tuned.json"
    )
    tuned = json.load(open(tuned_path)) if os.path.exists(tuned_path) else None
    paths = list(set12_paths()) + [resolve_data_path("13.png")]
    keep = int(tuned["config"].get("keep_low_freq", 4)) if tuned else 4
    keeps = [keep] * (len(paths) - 1) + [0]
    keys = list(jax.random.split(jax.random.PRNGKey(0), len(paths) - 1))
    keys.append(jax.random.PRNGKey(0))
    problems = [
        make_csmri(k, jnp.asarray(load_image(p, h, w)), sample_prob=0.5,
                   snr=10, keep_low_freq=kl)
        for k, p, kl in zip(keys, paths, keeps)
    ]
    batched = stack_problems(problems)
    bsz = len(problems)
    if tuned and len(tuned["eta"]) == bsz:
        eta = jnp.asarray(tuned["eta"], jnp.float32)
        mod = jnp.asarray(tuned["sigma_modifier"], jnp.float32)
    else:
        eta = jnp.full((bsz,), 6000.0, jnp.float32)
        mod = jnp.full((bsz,), 1.0, jnp.float32)

    def sync(x):
        float(np.asarray(x.reshape(-1)[0]))

    def timed(params):
        den = BM3DDenoiser(sigma_modifier=mod, params=params)

        def run(key):
            out = pnp_svrg(batched, den, eta=eta, n_outer=args.outer, t2=10,
                           mini_batch_size=4000, key=key)
            return out["final_psnr"]

        p0 = run(jax.random.PRNGKey(1))
        sync(p0)
        best = 1e9
        for rep in range(args.repeats):
            t0 = time.time()
            pf = run(jax.random.PRNGKey(2))
            sync(pf)
            best = min(best, time.time() - t0)
        psnr = np.asarray(pf)
        iters = args.outer * 11 * bsz
        return iters / best, float(psnr[:-1].mean()), float(psnr[-1])

    grid = [
        (s, tk, md)
        for s in (8, 12)
        for tk, md in [
            ("exact", "float32"),
            ("approx", "float32"),
            ("exact", "bfloat16"),
            ("approx", "bfloat16"),
        ]
    ]
    print(f"{'search':>6} {'topk':>7} {'match':>9} {'it/s':>8} "
          f"{'set12_mean':>10} {'flagship':>9}")
    for s, tk, md in grid:
        its, mean12, flag = timed(BM3DParams(search=s, topk=tk, match_dtype=md))
        print(f"{s:>6} {tk:>7} {md:>9} {its:8.1f} {mean12:10.2f} {flag:9.2f}",
              flush=True)


if __name__ == "__main__":
    main()
