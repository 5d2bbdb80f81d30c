"""Tune per-lane (eta, sigma_modifier) for the Set12 CSMRI benchmark.

The bench (bench.py) runs all 12 Set12 images plus the reference flagship
lane (13.png — BASELINE.md CSMRI/SVRG/BM3D, 22.8 dB) as one batched
pnp_svrg + BM3D program. A single shared (eta, sigma_modifier) leaves most
lanes far below their attainable PSNR; the scan loops take *per-lane traced*
step sizes and denoiser modifiers, so per-lane tuning costs nothing at run
time.

Two stages, all batched (13 lanes per compiled run, same program as bench):

1. shared-config grid sweep — each (eta, mod) cell is one run over all lanes;
2. per-lane local refinement around each lane's stage-1 winner, evaluated
   with per-lane (B,) eta/mod arrays (3 x 3 multiplicative factors = 9 runs).

Winners land in ``data/set12_csmri_tuned.json`` which bench.py picks up.

Run on the real TPU (the bench hardware):  python examples/tune_set12.py
"""

import argparse
import itertools
import json
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--n-outer", type=int, default=16)
    parser.add_argument("--t2", type=int, default=10)
    parser.add_argument("--mb", type=int, default=4000)
    parser.add_argument("--search", type=int, default=8,
                        help="BM3D search radius (8 = bench fast lane)")
    parser.add_argument("--search-step", type=int, default=1,
                        help="candidate-offset stride (2 with --matcher "
                             "pallas = the measured turbo operating point, "
                             "data/bm3d_pallas_v5e.json)")
    parser.add_argument("--matcher", default="xla",
                        choices=["xla", "pallas", "auto"])
    parser.add_argument("--match-dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--etas", type=float, nargs="+",
                        default=[1500, 3000, 6000, 9000])
    parser.add_argument("--mods", type=float, nargs="+",
                        default=[0.6, 0.8, 1.0, 1.3])
    parser.add_argument("--keep-lowfreq", type=int, default=4,
                        help="variable-density low-frequency block for the "
                        "Set12 lanes (the flagship 13.png lane always stays "
                        "reference-exact, keep=0)")
    parser.add_argument("--out", default="data/set12_csmri_tuned.json")
    args = parser.parse_args(argv)
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
    from pnp_svrg_tpu.utils.io import load_image, resolve_data_path, set12_paths

    h = w = args.size
    # EXACTLY the bench's problem batch (keys included) so tuned values
    # transfer one-to-one.
    paths = list(set12_paths()) + [resolve_data_path("13.png")]
    keys = list(jax.random.split(jax.random.PRNGKey(0), len(paths) - 1))
    keys.append(jax.random.PRNGKey(0))
    # Set12 lanes: variable-density masks (guaranteed low-frequency block,
    # see make_csmri(keep_low_freq=...)); flagship 13.png lane: reference-
    # exact Bernoulli mask so its PSNR stays comparable to BASELINE.md 22.8.
    keeps = [args.keep_lowfreq] * (len(paths) - 1) + [0]
    problems = [
        make_csmri(
            k, jnp.asarray(load_image(p, h, w)), sample_prob=0.5, snr=10,
            keep_low_freq=kl,
        )
        for k, p, kl in zip(keys, paths, keeps)
    ]
    batched = stack_problems(problems)
    bsz = len(problems)
    names = [os.path.basename(str(p)) for p in paths]

    def run(eta, mod):
        den = BM3DDenoiser(
            sigma_modifier=jnp.asarray(mod, jnp.float32),
            params=BM3DParams(
                search=args.search, search_step=args.search_step,
                matcher=args.matcher, match_dtype=args.match_dtype,
            ),
        )
        out = pnp_svrg(
            batched,
            den,
            eta=jnp.asarray(eta, jnp.float32),
            n_outer=args.n_outer,
            t2=args.t2,
            mini_batch_size=args.mb,
            key=jax.random.PRNGKey(2),  # the bench's steady-phase key
        )
        return np.asarray(out["final_psnr"], float)

    # ---- stage 1: shared-config grid --------------------------------------
    best_psnr = np.full(bsz, -1e9)
    best_eta = np.zeros(bsz)
    best_mod = np.zeros(bsz)
    t0 = time.time()
    for eta, mod in itertools.product(args.etas, args.mods):
        psnr = run(eta, mod)
        psnr = np.where(np.isfinite(psnr), psnr, -1e9)
        upd = psnr > best_psnr
        best_psnr = np.where(upd, psnr, best_psnr)
        best_eta = np.where(upd, eta, best_eta)
        best_mod = np.where(upd, mod, best_mod)
        print(
            f"[grid] eta={eta:<8g} mod={mod:<4g} mean={psnr.mean():6.2f} "
            f"min={psnr.min():6.2f}  ({time.time() - t0:.0f}s)",
            file=sys.stderr,
        )
    print(
        f"[grid done] mean={best_psnr.mean():.2f} min={best_psnr.min():.2f}",
        file=sys.stderr,
    )

    # ---- stage 2: per-lane local refinement -------------------------------
    for factors in ([0.7, 1.0, 1.4], [0.85, 1.0, 1.2]):
        for fe, fm in itertools.product(factors, factors):
            psnr = run(best_eta * fe, best_mod * fm)
            psnr = np.where(np.isfinite(psnr), psnr, -1e9)
            upd = psnr > best_psnr
            best_psnr = np.where(upd, psnr, best_psnr)
            best_eta = np.where(upd, best_eta * fe, best_eta)
            best_mod = np.where(upd, best_mod * fm, best_mod)
        print(
            f"[refine x{factors[-1]}] mean={best_psnr.mean():.2f} "
            f"min={best_psnr.min():.2f}",
            file=sys.stderr,
        )

    # ---- confirm the per-lane winners in one run --------------------------
    confirm = run(best_eta, best_mod)
    print(f"[confirm] mean={confirm.mean():.2f} min={confirm.min():.2f}",
          file=sys.stderr)

    result = {
        "config": {
            "size": h, "n_outer": args.n_outer, "t2": args.t2,
            "mini_batch_size": args.mb, "search": args.search,
            "search_step": args.search_step, "matcher": args.matcher,
            "match_dtype": args.match_dtype,
            "keep_low_freq": args.keep_lowfreq,
        },
        "lanes": names,
        "eta": [float(v) for v in best_eta],
        "sigma_modifier": [float(v) for v in best_mod],
        "tuned_psnr": [float(v) for v in confirm],
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    for n, e, m, p in zip(names, best_eta, best_mod, confirm):
        print(f"  {n:8s} eta={e:<9.5g} mod={m:<6.3g} psnr={p:6.2f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
