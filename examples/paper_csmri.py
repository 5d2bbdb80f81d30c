"""Reproduce the paper's CSMRI experiment (reference
``create_paper_figures_csmri.ipynb`` cells 4-15, recorded outputs in
BASELINE.md): 13.png at 128x128, sampling ratio 0.5, SNR 10 dB, BM3D
denoiser, all five PnP algorithms at the reference's iteration budgets.

Usage: python examples/paper_csmri.py [--cpu] [--eta-scale auto|ref]

``--eta-scale ref`` runs the reference's exact hyperparameters (eta ~ 0.1,
under which gradient steps are ~(z - x)/N and the dynamics are
denoiser-driven); the default ``auto`` uses data-consistency step sizes
calibrated for our exact-gradient scaling, which beats the recorded
reference PSNRs at the same iteration counts.
"""

import argparse
import sys
import time

import numpy as np


# Reference recorded results (BASELINE.md): algo -> (final PSNR dB, iters).
REFERENCE_RESULTS = {
    "svrg": (22.8, 175),
    "sgd": (23.3, 176),
    "gd": (22.9, 198),
    "saga": (22.9, 149),
    "sarah": (22.1, 159),
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--eta-scale", choices=["auto", "ref"], default="auto")
    parser.add_argument("--seed", type=int, default=3)
    parser.add_argument("--save", default=None, help="CSV output path")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from pnp_svrg_tpu import pnp_gd, pnp_sgd, pnp_svrg, pnp_saga, pnp_sarah
    from pnp_svrg_tpu.denoisers import BM3DDenoiser
    from pnp_svrg_tpu.denoisers.bm3d import BM3DParams
    from pnp_svrg_tpu.ops.metrics import ssim
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.utils import load_image
    from pnp_svrg_tpu.utils.viz import write_metrics_csv

    img = load_image("13.png", 128, 128)
    prob = make_csmri(jax.random.PRNGKey(args.seed), img, sample_prob=0.5, snr=10)
    init_psnr = float(prob.psnr(prob.x_init))
    print(f"init PSNR {init_psnr:.2f} dB  (sigma {float(prob.sigma):.4f}, "
          f"M0 {int(prob.m0)})")

    params = BM3DParams(search=8)
    key = jax.random.PRNGKey(1)

    if args.eta_scale == "auto":
        # Data-consistency steps for exact gradients (stability: eta < 2*M0
        # for full grads, eta < mb for control-variate terms).
        runs = {
            "gd": lambda: pnp_gd(
                prob, BM3DDenoiser(sigma_modifier=1.5, params=params),
                eta=6000.0, n_iters=198),
            "sgd": lambda: pnp_sgd(
                prob, BM3DDenoiser(sigma_modifier=1.5, params=params),
                eta=6000.0, n_iters=176, mini_batch_size=4000, key=key),
            "svrg": lambda: pnp_svrg(
                prob, BM3DDenoiser(sigma_modifier=1.5, params=params),
                eta=6000.0, n_outer=16, t2=10, mini_batch_size=4000, key=key),
            "saga": lambda: pnp_saga(
                prob, BM3DDenoiser(sigma_modifier=1.0, params=params),
                eta=3000.0, n_iters=149, mini_batch_size=5000, hist_size=10,
                key=key),
            "sarah": lambda: pnp_sarah(
                prob, BM3DDenoiser(sigma_modifier=1.5, params=params),
                eta=1500.0, n_outer=15, t2=10, mini_batch_size=4000, key=key),
        }
    else:
        # The notebook's recorded hyperparameters (csmri nb cells 4-15).
        runs = {
            "svrg": lambda: pnp_svrg(
                prob, BM3DDenoiser(sigma_modifier=0.7, params=params),
                eta=0.1, n_outer=16, t2=10, mini_batch_size=500, key=key,
                variant="faithful"),
            "sgd": lambda: pnp_sgd(
                prob, BM3DDenoiser(sigma_modifier=0.6, params=params),
                eta=0.1, n_iters=176, mini_batch_size=1000, key=key),
            "gd": lambda: pnp_gd(
                prob, BM3DDenoiser(sigma_modifier=0.6, params=params),
                eta=0.1, n_iters=198),
            "saga": lambda: pnp_saga(
                prob, BM3DDenoiser(sigma_modifier=0.6, params=params),
                eta=0.1, n_iters=149, mini_batch_size=5000, hist_size=10,
                key=key),
            "sarah": lambda: pnp_sarah(
                prob, BM3DDenoiser(sigma_modifier=0.6, params=params),
                eta=0.05, n_outer=15, t2=10, mini_batch_size=1000, key=key,
                variant="faithful"),
        }

    rows = []
    for name, fn in runs.items():
        t0 = time.time()
        out = fn()
        final = float(out["final_psnr"])
        ref_psnr, ref_iters = REFERENCE_RESULTS[name]
        rows.append({
            "algorithm": out["algo_name"],
            "final_psnr": round(final, 2),
            "final_ssim": round(float(np.asarray(ssim(prob.x, out["image"]))), 4),
            "delta_psnr": round(final - init_psnr, 2),
            "reference_psnr": ref_psnr,
            "margin_vs_reference": round(final - ref_psnr, 2),
            "iters": len(np.asarray(out["psnr_per_iter"])) - 1,
            "seconds": round(time.time() - t0, 2),
        })
        print(rows[-1])
    if args.save:
        write_metrics_csv(rows, args.save)
    return rows


if __name__ == "__main__":
    main()
