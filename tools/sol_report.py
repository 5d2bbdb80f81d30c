#!/usr/bin/env python
"""Speed-of-light accounting for the flagship bench program on one TPU chip.

Produces the committed artifact ``data/flagship_profile_v5e.json``: measured
steady-state throughput, XLA's compiled cost analysis (FLOPs + HBM bytes
accessed), the roofline utilizations against chip peaks, and the top
residual ops from a ``jax.profiler`` trace — so "speed-of-light per chip"
is a number with evidence, not a vibe (VERDICT r3 weak #8).

Method
------
* FLOPs / bytes come from ``jitted.lower(...).compile().cost_analysis()`` —
  XLA's own static model of the optimized HLO.
* Wall time is the bench's steady-state phase (scalar-readback fenced; see
  CLAUDE.md "Measuring performance").
* Roofline: utilization = max(FLOPs/s / peak_flops, bytes/s / peak_bw).
  A program is at speed-of-light when the *binding* resource is ~100%;
  BM3D block matching is elementwise/VPU+memory heavy, so the HBM side is
  the meaningful ceiling here.
* The per-op table (parse_xplane over a jax.profiler trace) names where the
  residual time goes.

Usage: python tools/sol_report.py [--out data/flagship_profile_v5e.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# v5e (TPU v5 lite) public per-chip peaks.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BW = 819e9  # bytes/s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--search", type=int, default=8)
    ap.add_argument("--match-dtype", default="bfloat16")
    ap.add_argument("--outer", type=int, default=16)
    ap.add_argument("--trace-outer", type=int, default=4,
                    help="smaller n_outer for the traced run (same per-iter "
                    "op mix, compact trace)")
    ap.add_argument("--logdir", default="/tmp/sol_trace")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

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
    t2, mb = 10, 4000
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

    den = BM3DDenoiser(sigma_modifier=mod, params=BM3DParams(
        search=args.search, match_dtype=args.match_dtype))

    def make_run(n_outer):
        # The problem/eta/mod go in as ARGUMENTS: closure-captured device
        # arrays would be embedded as constants at lower() time, which needs
        # a device->host copy the axon backend can't do (UNIMPLEMENTED).
        def run_fn(problem, eta_v, mod_v, key):
            d = BM3DDenoiser(sigma_modifier=mod_v, params=BM3DParams(
                search=args.search, match_dtype=args.match_dtype))
            out = pnp_svrg(problem, d, eta=eta_v, n_outer=n_outer, t2=t2,
                           mini_batch_size=mb, key=key)
            return out["final_psnr"]

        jitted = jax.jit(run_fn)
        return jitted, lambda key: jitted(batched, eta, mod, key)

    def sync(x):
        float(np.asarray(x.reshape(-1)[0]))

    # ---- cost analysis of the EXACT headline program ----------------------
    jitted, run = make_run(args.outer)
    lowered = jitted.lower(batched, eta, mod, jax.random.PRNGKey(1))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    print(f"cost_analysis: {flops/1e12:.2f} TFLOP, "
          f"{bytes_acc/1e9:.1f} GB accessed per run", file=sys.stderr)

    # ---- steady-state timing ---------------------------------------------
    t0 = time.time()
    sync(run(jax.random.PRNGKey(1)))
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    sync(run(jax.random.PRNGKey(2)))
    steady = time.time() - t0
    iters = args.outer * (t2 + 1) * bsz
    its_per_sec = iters / steady
    achieved_flops = flops / steady
    achieved_bw = bytes_acc / steady
    flops_util = achieved_flops / PEAK_BF16_FLOPS
    bw_util = achieved_bw / PEAK_HBM_BW
    print(f"steady: {steady:.2f}s = {its_per_sec:.0f} image-iters/s; "
          f"{achieved_flops/1e12:.2f} TFLOP/s ({100*flops_util:.1f}% bf16 peak), "
          f"{achieved_bw/1e9:.0f} GB/s ({100*bw_util:.1f}% HBM peak)",
          file=sys.stderr)

    # ---- batch scaling: where is the per-chip operating point? -----------
    # At 13 lanes the program is neither MXU- nor HBM-bound by the static
    # roofline (sub-1% utilizations). Measure whether image-iters/s grows
    # with more data-parallel lanes (SAME Set12 problems replicated) or
    # whether 13 lanes already sits at the per-chip optimum. Measured on
    # v5e: throughput DEGRADES super-linearly past 13 lanes (846 -> 664 ->
    # 525 it/s at 13/26/52) — the block-matching gather/scatter working set
    # outgrows on-chip memory, so scale-out belongs on the mesh batch axis
    # (parallel/runner.py), one ~13-lane program per chip.
    scaling = []
    for mult in (1, 2, 4):
        probs_m = problems * mult
        batched_m = stack_problems(probs_m)
        eta_m = jnp.concatenate([eta] * mult)
        mod_m = jnp.concatenate([mod] * mult)

        def run_m(problem, eta_v, mod_v, key):
            d = BM3DDenoiser(sigma_modifier=mod_v, params=BM3DParams(
                search=args.search, match_dtype=args.match_dtype))
            out = pnp_svrg(problem, d, eta=eta_v, n_outer=args.outer, t2=t2,
                           mini_batch_size=mb, key=key)
            return out["final_psnr"]

        jit_m = jax.jit(run_m)
        sync(jit_m(batched_m, eta_m, mod_m, jax.random.PRNGKey(1)))
        t0 = time.time()
        sync(jit_m(batched_m, eta_m, mod_m, jax.random.PRNGKey(2)))
        steady_m = time.time() - t0
        lanes = bsz * mult
        row = {
            "lanes": lanes,
            "steady_seconds": round(steady_m, 3),
            "image_iters_per_sec": round(
                lanes * args.outer * (t2 + 1) / steady_m, 1
            ),
        }
        scaling.append(row)
        print(f"batch scaling: {row}", file=sys.stderr)

    # ---- per-op residual table -------------------------------------------
    _, trace_run = make_run(args.trace_outer)
    sync(trace_run(jax.random.PRNGKey(3)))  # compile before tracing
    with jax.profiler.trace(args.logdir):
        sync(trace_run(jax.random.PRNGKey(4)))

    sys.path.insert(0, os.path.dirname(__file__))
    from parse_xplane import aggregate, decode_raw, find_xplane, parse_blocks
    from pathlib import Path

    pb = find_xplane(Path(args.logdir))
    rows = aggregate(parse_blocks(decode_raw(pb)), "tpu", False)
    rows.sort(key=lambda r: -r[3])
    total_ps = sum(r[3] for r in rows)
    top_ops = [
        {"op": (op if len(op) <= 160 else op[:157] + "..."),
         "ms": round(tot / 1e9, 3),
         "pct": round(100 * tot / max(total_ps, 1), 2), "count": cnt}
        for (_, _, op, tot, cnt) in rows[: args.top]
    ]
    for o in top_ops:
        print(f"{o['ms']:10.3f} ms {o['pct']:6.2f}% {o['count']:7d}  {o['op']}",
              file=sys.stderr)

    record = {
        "program": f"bench headline: {bsz} CSMRI lanes x {args.outer}x({t2}+1) "
                   f"PnP-SVRG iters, BM3D search={args.search} "
                   f"match_dtype={args.match_dtype}, 128x128",
        "chip": "TPU v5 lite (v5e), 1 chip",
        "steady_seconds": round(steady, 3),
        "image_iters_per_sec": round(its_per_sec, 1),
        "xla_cost_analysis": {
            "tflop_per_run": round(flops / 1e12, 3),
            "gb_accessed_per_run": round(bytes_acc / 1e9, 2),
        },
        "roofline": {
            "achieved_tflops_per_sec": round(achieved_flops / 1e12, 3),
            "peak_bf16_tflops": PEAK_BF16_FLOPS / 1e12,
            "mxu_utilization_pct": round(100 * flops_util, 2),
            "achieved_gb_per_sec": round(achieved_bw / 1e9, 1),
            "peak_hbm_gb_per_sec": PEAK_HBM_BW / 1e9,
            "hbm_utilization_pct": round(100 * bw_util, 2),
            "binding_resource": "hbm" if bw_util > flops_util else "mxu",
            "roofline_utilization_pct": round(
                100 * max(bw_util, flops_util), 2
            ),
        },
        "batch_scaling": scaling,
        "trace": {
            "traced_outer": args.trace_outer,
            "total_device_ms": round(total_ps / 1e9, 2),
            "top_ops": top_ops,
        },
    }
    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
