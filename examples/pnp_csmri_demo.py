"""Standalone CSMRI demo — equivalent of the reference's ``pnp_csmri.py``:
CSMRI on 13.png (256x256, p=0.5, SNR 30), RealSN-DnCNN sigma=5 denoiser
(reference ``pnp_csmri.py:21``, ``denoisers/RealSN_DnCNN.py:8-42``), GD vs
SGD vs SVRG comparison figure.

The RealSN weights are trained BY THIS FRAMEWORK (``examples/
train_realsn.py --lip 0.3 --noiseL 5 --export realsn_dncnn_noise5``; the
upstream ``RealSN_DnCNN_noise5.pth`` blob is missing from the reference
checkout). Falls back to the converted plain-DnCNN checkpoint when the
trained file is absent.

Usage: python examples/pnp_csmri_demo.py [--cpu] [--small] [--out demo.png]
"""

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--small", action="store_true", help="128x128")
    parser.add_argument("--out", default="figures/pnp_csmri_demo.png")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from pnp_svrg_tpu import pnp_gd, pnp_sgd, pnp_svrg
    from pnp_svrg_tpu.denoisers import DnCNNDenoiser
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.utils import load_image
    from pnp_svrg_tpu.utils.viz import show_grid

    h = 128 if args.small else 256
    img = load_image("13.png", h, h)
    prob = make_csmri(jax.random.PRNGKey(0), img, sample_prob=0.5, snr=30)
    try:
        # The reference demo's denoiser: RealSN_DnCNN sigma=5, here on
        # weights this framework trained (Lipschitz-0.3 RealSN recipe).
        den = DnCNNDenoiser.from_pretrained("RealSN_DnCNN", 5)
        print("denoiser: RealSN_DnCNN sigma=5 (framework-trained)")
    except FileNotFoundError:
        den = DnCNNDenoiser.from_pretrained("DnCNN", 5)
        print("denoiser: DnCNN sigma=5 (realsn_dncnn_noise5.npz not found — "
              "train it with examples/train_realsn.py --export)")
    key = jax.random.PRNGKey(1)

    n = h * h
    outs = {}
    for name, fn in {
        "PnP-GD": lambda: pnp_gd(prob, den, eta=0.6 * n, n_iters=30),
        "PnP-SGD": lambda: pnp_sgd(
            prob, den, eta=0.3 * n, n_iters=30, mini_batch_size=4000, key=key),
        "PnP-SVRG": lambda: pnp_svrg(
            prob, den, eta=0.3 * n, n_outer=3, t2=10, mini_batch_size=4000,
            key=key),
    }.items():
        t0 = time.time()
        outs[name] = fn()
        print(f"{name}: {float(outs[name]['final_psnr']):.2f} dB "
              f"({time.time()-t0:.1f}s)")

    images = [prob.x, prob.x_init] + [o["image"] for o in outs.values()]
    titles = (
        ["original", f"init {float(prob.psnr(prob.x_init)):.1f} dB"]
        + [f"{k} {float(v['final_psnr']):.1f} dB" for k, v in outs.items()]
    )
    fig = show_grid([np.asarray(im) for im in images], titles, ncols=5)
    if args.out:
        from pathlib import Path

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(args.out, dpi=130, bbox_inches="tight")
        print(f"saved {args.out}")
    return outs


if __name__ == "__main__":
    main()
