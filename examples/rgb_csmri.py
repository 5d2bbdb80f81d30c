"""RGB CSMRI comparison figure — the working form of the reference's RGB
path (reference ``utils.py:66-92`` ``denoise_rgb``, commented out upstream,
and the ``data/RGB/*.jpg`` assets).

Reconstructs each color channel of a BSDS image as a CSMRI problem, all
three channels batched into ONE compiled PnP run, and writes an
original / zero-filled / reconstructed comparison figure.

Usage:
    python examples/rgb_csmri.py --cpu --size 64 --out figures/rgb_csmri.png
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--image", default="RGB/12084.jpg")
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--algo", default="svrg")
    parser.add_argument("--snr", type=float, default=30.0)
    parser.add_argument("--eta", type=float, default=2000.0)
    parser.add_argument("--n-outer", type=int, default=8)
    parser.add_argument("--t2", type=int, default=10)
    parser.add_argument("--mb", type=int, default=2000)
    parser.add_argument("--out", default="figures/rgb_csmri.png")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image

    from pnp_svrg_tpu.denoisers import TVDenoiser
    from pnp_svrg_tpu.utils.io import resolve_data_path
    from pnp_svrg_tpu.utils.viz import reconstruct_rgb, show_grid

    img = Image.open(resolve_data_path(args.image)).convert("RGB")
    img = np.asarray(img.resize((args.size, args.size)), np.float64) / 255.0

    hp = dict(
        eta=args.eta, n_outer=args.n_outer, t2=args.t2,
        mini_batch_size=min(args.mb, args.size * args.size // 2),
    )
    if args.algo in ("gd",):
        hp = dict(eta=args.eta, n_iters=args.n_outer * (args.t2 + 1))
    elif args.algo in ("sgd", "saga"):
        hp = dict(
            eta=args.eta, n_iters=args.n_outer * (args.t2 + 1),
            mini_batch_size=min(args.mb, args.size * args.size // 2),
        )
    orig, init, recon = reconstruct_rgb(
        img, algo=args.algo, denoiser=TVDenoiser(sigma_modifier=1.0),
        snr=args.snr, **hp,
    )
    mse_i = float(np.mean((init - orig) ** 2))
    mse_r = float(np.mean((recon - orig) ** 2))
    psnr_i = -10 * np.log10(mse_i)
    psnr_r = -10 * np.log10(mse_r)
    print(f"zero-filled {psnr_i:.2f} dB -> reconstructed {psnr_r:.2f} dB")
    for c, name in enumerate("RGB"):
        m_i = float(np.mean((init[..., c] - orig[..., c]) ** 2))
        m_r = float(np.mean((recon[..., c] - orig[..., c]) ** 2))
        print(f"  channel {name}: {-10 * np.log10(m_i):.2f} -> "
              f"{-10 * np.log10(m_r):.2f} dB")

    fig = show_grid(
        [orig, init, recon],
        titles=[
            "original",
            f"zero-filled ({psnr_i:.1f} dB)",
            f"PnP-{args.algo.upper()} ({psnr_r:.1f} dB)",
        ],
        ncols=3,
        color_map=None,
    )
    from pathlib import Path

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
