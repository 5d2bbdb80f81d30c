#!/usr/bin/env python
"""Profile the bench's batched SVRG+BM3D program on the real TPU.

Captures a jax.profiler trace of a few steady-state executions of exactly
the program bench.py times (13-lane Set12+flagship batch, tuned per-lane
eta/mod) and prints the per-op duration table via tools/parse_xplane.py.

Usage: python tools/profile_bench.py [--search 12] [--outer 4] [--logdir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--search", type=int, default=12)
    ap.add_argument("--match-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--search-step", type=int, default=1)
    ap.add_argument("--matcher", default="xla",
                    choices=["xla", "pallas", "auto"])
    ap.add_argument("--tuned-json", default=None,
                    help="per-lane tuned config json (default: the headline "
                         "set12_csmri_tuned.json; pass the turbo json when "
                         "tracing a stride operating point)")
    ap.add_argument("--outer", type=int, default=4,
                    help="n_outer for the traced run (smaller than the "
                    "bench's 16 to keep the trace compact; per-iteration "
                    "op mix is identical)")
    ap.add_argument("--logdir", default="/tmp/bench_trace")
    ap.add_argument("--top", type=int, default=40)
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
    tuned_path = args.tuned_json or os.path.join(
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

    den = BM3DDenoiser(sigma_modifier=mod, params=BM3DParams(
        search=args.search, match_dtype=args.match_dtype,
        search_step=args.search_step, matcher=args.matcher))

    def run(key):
        out = pnp_svrg(batched, den, eta=eta, n_outer=args.outer, t2=10,
                       mini_batch_size=4000, key=key)
        return out["final_psnr"]

    def sync(x):
        float(np.asarray(x.reshape(-1)[0]))

    t0 = time.time()
    sync(run(jax.random.PRNGKey(1)))
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    sync(run(jax.random.PRNGKey(2)))
    steady = time.time() - t0
    iters = args.outer * 11 * bsz
    print(f"steady: {steady:.2f}s = {iters/steady:.0f} image-iters/s "
          f"(search={args.search})", file=sys.stderr)

    with jax.profiler.trace(args.logdir):
        sync(run(jax.random.PRNGKey(3)))

    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "parse_xplane.py"),
         args.logdir, "--top", str(args.top), "--plane", "tpu"],
    )


if __name__ == "__main__":
    main()
