#!/usr/bin/env python
"""Measure the BM3D performance knobs head-to-head on the real TPU:

* ``matcher="pallas"`` (the fused VMEM-resident block-matching kernel,
  ``ops/pallas/bm3d_match.py``) vs the XLA matcher, and
* ``search_step`` in {1, 2, 4} (grid-aligned search + scatter-free dense
  aggregation vs the canonical exhaustive search + scatter),

at the flagship operating point: 13-lane 128x128 batch, search=8, bf16
matching distances. Three levels of evidence per configuration:

1. matcher-only microbenchmark (chained in one scan, scalar-fenced),
2. full two-stage denoise ms/call,
3. the ACTUAL flagship program — 13-lane CSMRI PnP-SVRG with the bench's
   tuned per-lane configs — image-iters/s + quality (Set12-VD mean PSNR and
   the reference-exact 13.png flagship lane PSNR).

Writes the decision artifact ``data/bm3d_pallas_v5e.json`` (VERDICT r4 next
#1: prove or refute the "speed-of-light" claim for the BM3D gather/scatter
core with a committed measurement either way).

Tunnel discipline per CLAUDE.md: every timing fenced with a scalar
readback, all work in one process, seconds-long steady phases.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--outer", type=int, default=8,
                    help="n_outer for the flagship end-to-end runs")
    ap.add_argument("--quality-outer", type=int, default=16,
                    help="n_outer for the quality certification runs")
    ap.add_argument("--skip-flagship", action="store_true")
    ap.add_argument("--skip-micro", action="store_true")
    ap.add_argument("--bsz", type=int, default=13)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--configs", nargs="+", default=None,
                    help="subset of config names to run")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import pnp_svrg_tpu.denoisers.bm3d as M
    from pnp_svrg_tpu.algorithms.loops import pnp_svrg
    from pnp_svrg_tpu.core.batched import stack_problems
    from pnp_svrg_tpu.denoisers.bm3d import BM3DDenoiser, BM3DParams
    from pnp_svrg_tpu.ops.pallas.bm3d_match import bm3d_match_pallas
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.utils.io import set12_paths, load_image, resolve_data_path

    t_start = time.time()

    def note(msg):
        print(f"[bm3d-measure t={time.time() - t_start:5.1f}s] {msg}",
              file=sys.stderr, flush=True)

    K = args.steps
    rng = np.random.default_rng(0)
    h = w = args.size
    bsz = args.bsz
    x0 = jnp.asarray(rng.uniform(0, 1, (bsz, h, w)), jnp.float32)

    def fence(v):
        float(np.asarray(v.reshape(-1)[0]))

    def timeit(run, x):
        out = run(x)
        fence(out)  # compile + first
        t0 = time.time()
        out = run(x)
        fence(out)
        return (time.time() - t0) / K * 1e3

    record = {
        "chip": "TPU v5 lite (v5e), 1 chip",
        "program": "13-lane 128x128, block=8, search=8, K=16, bf16 matching",
        "method": f"{K} serialized calls per compiled scan, scalar-fenced",
    }

    # ---- Part A: matcher-only microbenchmark ------------------------------
    rows = M._ref_grid(h, 8, 4)
    cols = M._ref_grid(w, 8, 4)
    offsets = np.asarray(
        [(dy, dx) for dy in range(-8, 9) for dx in range(-8, 9)], np.int32
    )
    rows_t = tuple(rows.tolist())
    cols_t = tuple(cols.tolist())
    offs_t = tuple(map(tuple, offsets.tolist()))

    def chain_match(kind):
        @jax.jit
        def run(x):
            def body(xc, _):
                if kind == "pallas":
                    ti = bm3d_match_pallas(
                        xc, rows_t, cols_t, offs_t, 8, 16,
                        match_dtype="bfloat16",
                    )
                else:
                    d = M._match_distances(
                        xc, rows, cols, offsets, 8, match_dtype="bfloat16"
                    )
                    ti = M._top_k_offsets(d, 16)
                # fold the result back so steps serialize
                bump = (jnp.sum(ti) % 7).astype(jnp.float32) * 1e-6
                return xc + bump, ()

            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        return run

    pallas_ok = True
    if not args.skip_micro:
        note("micro: XLA matcher (compiling if cold)")
        ms_xla_match = timeit(chain_match("xla"), x0)
        note(f"micro XLA matcher: {ms_xla_match:.2f} ms/call")
        note("micro: Pallas matcher (compiling if cold)")
        try:
            ms_pal_match = timeit(chain_match("pallas"), x0)
            note(f"micro Pallas matcher: {ms_pal_match:.2f} ms/call")
        except Exception as e:  # Mosaic lowering failure is a result
            note(f"Pallas matcher FAILED to compile/run: {e}")
            ms_pal_match = None
            pallas_ok = False
            record["pallas_matcher_error"] = str(e)[:2000]
        record["matcher_micro"] = {
            "xla_ms_per_call": round(ms_xla_match, 3),
            "pallas_ms_per_call": (
                round(ms_pal_match, 3) if ms_pal_match else None
            ),
            "pallas_speedup": (
                round(ms_xla_match / ms_pal_match, 2) if ms_pal_match else None
            ),
        }

    # hardware parity: selected sets must agree
    if pallas_ok:
        ti_x = np.asarray(
            M._top_k_offsets(
                M._match_distances(x0, rows, cols, offsets, 8,
                                   match_dtype="bfloat16"), 16
            )
        )
        ti_p = np.asarray(bm3d_match_pallas(
            x0, rows_t, cols_t, offs_t, 8, 16, match_dtype="bfloat16"
        ))
        set_agree = float(np.mean([
            len(set(a).intersection(b)) / 16
            for a, b in zip(ti_x.reshape(-1, 16), ti_p.reshape(-1, 16))
        ]))
        record["matcher_hw_set_agreement"] = round(set_agree, 5)
        note(f"hardware top-K set agreement: {set_agree:.4f}")

    # ---- Part B: full two-stage denoise per knob config -------------------
    knob_configs = {
        "baseline_xla_s1": BM3DParams(search=8, match_dtype="bfloat16"),
        "pallas_s1": BM3DParams(search=8, match_dtype="bfloat16",
                                matcher="pallas"),
        "xla_s2": BM3DParams(search=8, match_dtype="bfloat16", search_step=2),
        "pallas_s2": BM3DParams(search=8, match_dtype="bfloat16",
                                matcher="pallas", search_step=2),
        "xla_s4": BM3DParams(search=8, match_dtype="bfloat16", search_step=4),
        "pallas_s4": BM3DParams(search=8, match_dtype="bfloat16",
                                matcher="pallas", search_step=4),
    }
    if args.configs:
        knob_configs = {k: v for k, v in knob_configs.items()
                        if k in args.configs}

    def chain_denoise(params):
        @jax.jit
        def run(x):
            def body(xc, _):
                y = M.bm3d_denoise_batch(xc, 25 / 255, params=params)
                return 0.9 * y + 0.1 * x, ()

            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        return run

    record["denoise_ms_per_call"] = {}
    base_ms = None
    for name, params in knob_configs.items():
        if "pallas" in name and not pallas_ok:
            continue
        note(f"denoise chain: {name} (compiling if cold)")
        try:
            ms = timeit(chain_denoise(params), x0)
        except Exception as e:
            note(f"{name} FAILED: {e}")
            record["denoise_ms_per_call"][name] = {"error": str(e)[:500]}
            continue
        if name == "baseline_xla_s1":
            base_ms = ms
        row = {"ms": round(ms, 3)}
        if base_ms:
            row["speedup_vs_baseline"] = round(base_ms / ms, 2)
        record["denoise_ms_per_call"][name] = row
        note(f"{name}: {ms:.2f} ms/denoise"
             + (f" ({base_ms / ms:.2f}x vs baseline)" if base_ms else ""))

    # ---- Part C: the flagship program end-to-end --------------------------
    if not args.skip_flagship:
        tuned = None
        tpath = os.path.join(os.path.dirname(__file__), "..", "data",
                             "set12_csmri_tuned.json")
        if os.path.exists(tpath):
            with open(tpath) as f:
                tuned = json.load(f)
        paths = list(set12_paths()) + [resolve_data_path("13.png")]
        lane_names = [os.path.basename(p) for p in paths]
        keep = int(tuned["config"].get("keep_low_freq", 4)) if tuned else 4
        keeps = [keep] * 12 + [0]
        keys = list(jax.random.split(jax.random.PRNGKey(0), len(paths) - 1))
        keys.append(jax.random.PRNGKey(0))
        problems = [
            make_csmri(k, jnp.asarray(load_image(p, h, w)), sample_prob=0.5,
                       snr=10, keep_low_freq=kl)
            for k, p, kl in zip(keys, paths, keeps)
        ]
        batched = stack_problems(problems)
        fb = len(problems)
        by_name = {}
        if tuned:
            by_name = {n: (e, m) for n, e, m in zip(
                tuned["lanes"], tuned["eta"], tuned["sigma_modifier"])}
        eta = jnp.asarray(
            [by_name.get(n, (6000.0, 1.0))[0] for n in lane_names],
            jnp.float32,
        )
        mod = jnp.asarray(
            [by_name.get(n, (6000.0, 1.0))[1] for n in lane_names],
            jnp.float32,
        )
        n_outer, t2, mb = args.outer, 10, 4000
        iters = n_outer * (t2 + 1)

        def flagship(params, key):
            den = BM3DDenoiser(sigma_modifier=mod, params=params)
            out = pnp_svrg(batched, den, eta=eta, n_outer=n_outer, t2=t2,
                           mini_batch_size=mb, key=key)
            return {k: out[k] for k in ("image", "final_psnr")}

        record["flagship"] = {}
        for name, params in knob_configs.items():
            if "pallas" in name and not pallas_ok:
                continue
            note(f"flagship: {name} ({n_outer}x({t2}+1) iters, compiling "
                 f"if cold)")
            try:
                out = flagship(params, jax.random.PRNGKey(1))
                fence(out["final_psnr"])
                t0 = time.time()
                out = flagship(params, jax.random.PRNGKey(2))
                fence(out["final_psnr"])
                steady = time.time() - t0
            except Exception as e:
                note(f"{name} flagship FAILED: {e}")
                record["flagship"][name] = {"error": str(e)[:500]}
                continue
            psnrs = np.asarray(out["final_psnr"])
            row = {
                "image_iters_per_sec": round(fb * iters / steady, 1),
                "steady_s": round(steady, 3),
                "set12_vd_mean_psnr_db": round(float(psnrs[:12].mean()), 2),
                "flagship_13png_psnr_db": round(float(psnrs[-1]), 2),
            }
            record["flagship"][name] = row
            note(f"{name}: {row}")

    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
