"""Sampling-ratio sweep over Set12 — the TPU-native rewrite of the reference
``script_diff_sampratio_set12.py``: (problem x algorithm x denoiser x ratio)
grid, per-cell TPE hyperparameter search at a fixed iteration budget, CSV
output. Batched/sequential on one chip; shard the image axis with
``--mesh`` on multi-device hosts.

Usage (small default grid; the full reference grid is 5 algos x 3 denoisers
x 10 ratios x 12 images):
    python examples/sweep_sampratio.py --images 2 --ratios 0.3 0.5 \
        --algos svrg gd --max-evals 10 --out sweep.csv
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--images", type=int, default=2)
    parser.add_argument("--ratios", type=float, nargs="+", default=[0.5])
    parser.add_argument("--algos", nargs="+", default=["svrg"])
    parser.add_argument("--denoisers", nargs="+", default=["tv"],
                        choices=["tv", "nlm", "bm3d"])
    parser.add_argument("--snr", type=float, default=20.0)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--max-evals", type=int, default=10)
    parser.add_argument("--n-iters", type=int, default=60)
    parser.add_argument("--trial-batch", type=int, default=1,
                        help="TPE candidates evaluated per compiled batched run")
    parser.add_argument("--out", default="hyperparam-tuning/sweep.csv")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from pnp_svrg_tpu.denoisers import TVDenoiser, NLMDenoiser, BM3DDenoiser
    from pnp_svrg_tpu.denoisers.bm3d import BM3DParams
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.tuning.sweep import sweep_grid
    from pnp_svrg_tpu.utils.io import set12_paths, load_image

    factories = {
        "tv": lambda d: TVDenoiser(sigma_modifier=d),
        "nlm": lambda d: NLMDenoiser(sigma_modifier=d),
        "bm3d": lambda d: BM3DDenoiser(
            sigma_modifier=d, params=BM3DParams(search=6)
        ),
    }

    cells = []
    for i, path in enumerate(set12_paths()[: args.images]):
        img = load_image(path, args.size, args.size)
        for ratio in args.ratios:
            prob = make_csmri(
                jax.random.PRNGKey(i), img, sample_prob=ratio, snr=args.snr
            )
            for algo in args.algos:
                for dname in args.denoisers:
                    cells.append({
                        "problem": prob,
                        "algo": algo,
                        "denoiser_factory": factories[dname],
                        "problem_name": "csmri",
                        "denoiser_name": dname,
                        "image": path.name,
                        "ratio": ratio,
                        "snr": args.snr,
                        "seed": i,
                    })
    results = sweep_grid(
        cells, max_evals=args.max_evals, n_iters=args.n_iters,
        csv_path=args.out, trial_batch=args.trial_batch,
    )
    print(f"wrote {len(results)} cells to {args.out}")
    return results


if __name__ == "__main__":
    main()
