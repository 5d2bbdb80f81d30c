"""Train a (RealSN-)DnCNN denoiser — CLI port of the reference
``DeepDenoisers/training/train_full_realsn.py`` argparse surface.

Usage:
    python examples/train_realsn.py --exp checkpoints/exp_realsn40 \
        --layers 17 --lip 1.0 --noiseL 40 --epochs 50
Quick smoke:
    python examples/train_realsn.py --exp /tmp/exp --layers 3 --features 8 \
        --no-bn --epochs 1 --max-images 2 --max-steps 10 --cpu
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", required=True, help="experiment directory")
    parser.add_argument("--layers", type=int, default=17)
    parser.add_argument("--features", type=int, default=64)
    parser.add_argument("--batchSize", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--milestone", type=int, default=30)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--lip", type=float, default=0.0,
                        help=">0 enables the RealSN per-layer constraint")
    parser.add_argument("--no-bn", action="store_true")
    parser.add_argument("--mode", choices=["S", "B"], default="S")
    parser.add_argument("--noiseL", type=float, default=40.0)
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--adaptive", action="store_true",
                        help="use the reference's adaptive per-layer sigma "
                        "list instead of the uniform lip^(1/L) recipe "
                        "(requires --layers 6, SimpleCNN_models.py:18-22)")
    parser.add_argument("--export", default=None,
                        help="also save the final weights as "
                        "checkpoints/<EXPORT>.npz for the denoiser loaders "
                        "(e.g. realsn_dncnn_noise5)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pnp_svrg_tpu.training import TrainConfig, train

    adaptive = None
    if args.adaptive:
        from pnp_svrg_tpu.models.spectral_norm import ADAPTIVE_SIGMAS_6

        adaptive = ADAPTIVE_SIGMAS_6

    cfg = TrainConfig(
        depth=args.layers,
        features=args.features,
        use_bn=not args.no_bn,
        lip=args.lip,
        adaptive_sigmas=adaptive,
        batch_size=args.batchSize,
        epochs=args.epochs,
        milestone=args.milestone,
        lr=args.lr,
        mode=args.mode,
        noise_level=args.noiseL,
    )
    variables, history = train(
        cfg, args.exp, max_images=args.max_images,
        max_steps_per_epoch=args.max_steps,
    )
    if history:
        last = history[-1]
        print(f"final: val PSNR {last['val_psnr']:.2f} dB, "
              f"SSIM {last['val_ssim']:.4f}")
    if args.export:
        from pathlib import Path

        from pnp_svrg_tpu.models.convert import save_flax_npz

        out = Path(__file__).resolve().parents[1] / "checkpoints" / (
            args.export + ".npz"
        )
        save_flax_npz(variables, out)
        print(f"exported {out}")
    return variables, history


if __name__ == "__main__":
    main()
