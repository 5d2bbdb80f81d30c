"""Reproduce the paper's phase-retrieval experiment (reference
``create_paper_figures_pr.ipynb`` cells 2-22, recorded outputs in
BASELINE.md): Set12/04.png at 128x128, alpha=0.5 (8192 measurements),
SNR 20 dB, with BM3D and MMO-DnCNN denoisers — plus the BASELINE
``configs[3]`` combination (PnP-SARAH + RealSN-DnCNN checkpoint denoiser,
reference ``problems/PR.py:12-87`` + ``denoisers/RealSN_DnCNN.py:8-42``),
run on the framework-trained ``checkpoints/realsn_dncnn_noise5.npz``. The
reference notebook recorded no PSNR for that combination, so this script
pins our own number.

Usage: python examples/paper_pr.py [--cpu] [--small] [--config auto|ref]

``--config ref`` uses the notebook's exact hyperparameters (eta, lr_decay,
T2, minibatch; iteration counts matched to its ~2-3 it/s wall budgets).
The default ``auto`` keeps the notebook's structure but re-tunes eta /
lr_decay / budgets for this implementation — every run then beats the
reference's recorded PSNR (e.g. gd+bm3d 28.9 vs 25.9 dB) while still
finishing far inside the reference's 30/60 s wall budgets on one chip.
The reference's sgd+mmo cell diverges under its published eta=0.2 here —
this implementation's exact gradients are normalized differently, so the
notebook's eta does not transfer; auto uses eta=0.02, which converges to
23.9 dB. (The notebook's own 313-iteration log does reach its recorded
20.5 dB — verified in ``data/pr_sgd_mmo_ref_inconsistency.json``, which
also retracts an earlier "internally inconsistent bookkeeping" claim that
was based on a truncated read of that log.)
"""

import argparse
import time

import numpy as np

REFERENCE_RESULTS = {  # run label -> reference final PSNR (BASELINE.md)
    "svrg+bm3d": 26.8,
    "sgd+bm3d": 25.1,
    "gd+bm3d": 25.9,
    "svrg+mmo": 19.0,
    "sgd+mmo": 20.5,
    "gd+mmo": 12.8,
    "sarah+realsn": None,  # BASELINE configs[3]; no recorded upstream PSNR
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--config", choices=["auto", "ref"], default="auto")
    parser.add_argument("--save", default=None)
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from pnp_svrg_tpu import pnp_gd, pnp_sarah, pnp_sgd, pnp_svrg
    from pnp_svrg_tpu.denoisers import BM3DDenoiser, DnCNNDenoiser, MMODenoiser
    from pnp_svrg_tpu.denoisers.bm3d import BM3DParams
    from pnp_svrg_tpu.ops.metrics import ssim
    from pnp_svrg_tpu.problems import make_phase_retrieval
    from pnp_svrg_tpu.utils import load_image
    from pnp_svrg_tpu.utils.viz import write_metrics_csv

    h = 64 if args.small else 128
    m = 2048 if args.small else 8192
    img = load_image("Set12/04.png", h, h)
    prob = make_phase_retrieval(jax.random.PRNGKey(0), img, num_meas=m, snr=20)
    init_psnr = float(prob.psnr(prob.x_init))
    print(f"init PSNR {init_psnr:.2f} dB (spectral init)")

    bm3d = BM3DDenoiser(sigma_modifier=1.0, params=BM3DParams(search=8))
    mmo = MMODenoiser.from_pretrained(channels=1, n_lev=0.009)
    # BASELINE configs[3]: SARAH + RealSN-DnCNN, framework-trained sigma=5
    # checkpoint (PR at SNR 20 leaves small residual noise; the sigma=15
    # model over-smooths here).
    realsn = DnCNNDenoiser.from_pretrained("RealSN_DnCNN", sigma=5)
    key = jax.random.PRNGKey(1)

    if args.config == "ref":
        # The notebook's exact hyperparameters (cells 9-21), iteration
        # budgets matched to its ~2-3 it/s wall budgets.
        runs = {
            "svrg+bm3d": lambda: pnp_svrg(
                prob, bm3d, eta=0.2, n_outer=8, t2=8, mini_batch_size=800,
                lr_decay=0.99, key=key),
            "sgd+bm3d": lambda: pnp_sgd(
                prob, bm3d, eta=0.3, n_iters=72, mini_batch_size=1000,
                lr_decay=0.99, key=key),
            "gd+bm3d": lambda: pnp_gd(prob, bm3d, eta=0.5, n_iters=60),
            "svrg+mmo": lambda: pnp_svrg(
                prob, mmo, eta=0.01, n_outer=12, t2=5, mini_batch_size=100,
                lr_decay=0.99, key=key),
            "sgd+mmo": lambda: pnp_sgd(
                prob, mmo, eta=0.2, n_iters=72, mini_batch_size=1000, key=key),
            "gd+mmo": lambda: pnp_gd(prob, mmo, eta=0.1, n_iters=60),
            "sarah+realsn": lambda: pnp_sarah(
                prob, realsn, eta=0.05, n_outer=8, t2=8,
                mini_batch_size=800, lr_decay=0.99, key=key),
        }
    else:
        # Re-tuned for this implementation; all runs beat the recorded
        # reference PSNRs and still finish inside its wall budgets.
        runs = {
            "svrg+bm3d": lambda: pnp_svrg(
                prob, bm3d, eta=0.2, n_outer=20, t2=8, mini_batch_size=800,
                lr_decay=0.99, key=key),
            "sgd+bm3d": lambda: pnp_sgd(
                prob, bm3d, eta=0.3, n_iters=160, mini_batch_size=1000,
                lr_decay=0.99, key=key),
            "gd+bm3d": lambda: pnp_gd(
                prob, bm3d, eta=1.0, n_iters=90, lr_decay=0.99),
            "svrg+mmo": lambda: pnp_svrg(
                prob, mmo, eta=0.02, n_outer=60, t2=5, mini_batch_size=100,
                lr_decay=0.99, key=key),
            "sgd+mmo": lambda: pnp_sgd(
                prob, mmo, eta=0.02, n_iters=400, mini_batch_size=1000, key=key),
            "gd+mmo": lambda: pnp_gd(prob, mmo, eta=0.1, n_iters=400),
            # Tuned winner (data/pr_sarah_realsn_tuned.json): 21.8 dB.
            "sarah+realsn": lambda: pnp_sarah(
                prob, realsn, eta=0.05, n_outer=30, t2=8,
                mini_batch_size=800, lr_decay=1.0, key=key),
        }

    rows = []
    for name, fn in runs.items():
        t0 = time.time()
        out = fn()
        final = float(out["final_psnr"])
        ref = REFERENCE_RESULTS[name]
        rows.append({
            "run": name,
            "final_psnr": round(final, 2),
            "final_ssim": round(float(np.asarray(ssim(prob.x, out["image"]))), 4),
            "delta_psnr": round(final - init_psnr, 2),
            "reference_psnr": ref,
            "margin_vs_reference": round(final - ref, 2) if ref else None,
            "seconds": round(time.time() - t0, 2),
        })
        print(rows[-1])
    if args.save:
        write_metrics_csv(rows, args.save)
    return rows


if __name__ == "__main__":
    main()
