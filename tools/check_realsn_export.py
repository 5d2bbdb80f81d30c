#!/usr/bin/env python
"""Verify an exported RealSN-DnCNN checkpoint and record its val metrics.

Checks (VERDICT r2 "next round" #1 done-criteria):
1. every conv layer's spectral norm is at its per-layer Lipschitz target —
   primary check via converged conv-space power iteration (3 random
   restarts), cross-checked on the exact DENSE operator built by
   ``training/utils.unroll_kernel`` (reference ``utils.py:204-243``) for a
   small VALID probe (its top singular value lower-bounds the SAME-conv
   operator norm);
2. validation PSNR/SSIM over the reference training val set (Set12),
   recomputed with the current (precision-fixed) SSIM, written to
   ``checkpoints/<name>.val.json``.

Usage: python tools/check_realsn_export.py realsn_dncnn_noise5 \
           --lip 0.3 [--sigma 5] [--cpu]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def unroll_multi(kernel: np.ndarray, n: int) -> np.ndarray:
    """Dense matrix of the VALID 2-D correlation for a multi-channel
    (m, m, cin, cout) HWIO kernel on an (n, n, cin) input — the
    multi-channel generalization of ``training/utils.unroll_kernel``."""
    m, _, cin, cout = kernel.shape
    out_n = n - m + 1
    mat = np.zeros((cout * out_n * out_n, cin * n * n), np.float64)
    for co in range(cout):
        for ci in range(cin):
            k = kernel[:, :, ci, co]
            for oy in range(out_n):
                for ox in range(out_n):
                    r = co * out_n * out_n + oy * out_n + ox
                    base = ci * n * n
                    for j in range(m):
                        mat[r, base + (oy + j) * n + ox : base + (oy + j) * n + ox + m] = k[j]
    return mat


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("name", help="checkpoint name, e.g. realsn_dncnn_noise5")
    ap.add_argument("--lip", type=float, default=0.3)
    ap.add_argument("--sigma", type=float, default=None,
                    help="val noise sigma /255 (default: parsed from name)")
    ap.add_argument("--dense-probe", type=int, default=10)
    ap.add_argument("--dense-layers", type=int, default=3,
                    help="how many layers get the exact dense-SVD cross-check "
                    "(all layers get the power-iteration check)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pnp_svrg_tpu.models.convert import load_flax_npz
    from pnp_svrg_tpu.models.spectral_norm import conv_power_iteration, init_u
    from pnp_svrg_tpu.models.dncnn import DnCNN
    from pnp_svrg_tpu.ops.metrics import psnr, ssim
    from pnp_svrg_tpu.training import data as data_lib

    path = REPO / "checkpoints" / f"{args.name}.npz"
    variables = load_flax_npz(path)
    params = variables["params"]
    convs = sorted(
        (k for k in params if k.startswith("Conv_")),
        key=lambda s: int(s.split("_")[1]),
    )
    depth = len(convs)
    target = args.lip ** (1.0 / depth)
    print(f"{path.name}: {depth} convs, per-layer target {target:.4f} "
          f"(lip={args.lip})")

    sigmas = []
    ok = True
    for i, name in enumerate(convs):
        kern = jnp.asarray(params[name]["kernel"])
        best = 0.0
        for r in range(3):
            u = init_u(jax.random.PRNGKey(100 * i + r), kern.shape[-1], hw=40)
            s, _ = conv_power_iteration(kern, u, n_iters=60)
            best = max(best, float(s))
        sigmas.append(best)
        line = f"  {name}: sigma={best:.4f}"
        if i < args.dense_layers or i == depth - 1:
            dense = unroll_multi(np.asarray(kern), args.dense_probe)
            sv = np.linalg.svd(dense, compute_uv=False)[0]
            line += f"  dense-VALID svd={sv:.4f}"
            if sv > target * 1.05:
                ok = False
                line += "  <-- EXCEEDS TARGET"
        if best > target * 1.05:
            ok = False
            line += "  <-- EXCEEDS TARGET"
        print(line)
    product = float(np.prod(sigmas))
    print(f"product bound: {product:.5f} (<= lip={args.lip} required)")
    if product > args.lip * 1.1:
        ok = False

    # ---- validation metrics with the current (fixed) SSIM -----------------
    sigma = args.sigma
    if sigma is None:
        sigma = float(args.name.rsplit("noise", 1)[-1])
    model = DnCNN(channels=1, depth=depth, use_bn=any(
        k.startswith("BatchNorm") for k in params
    ))
    vs = jax.tree_util.tree_map(jnp.asarray, variables)
    rng = np.random.default_rng(1234)

    @jax.jit
    def eval_one(clean, noisy):
        r = model.apply(vs, noisy[None, ..., None])[0, ..., 0]
        den = jnp.clip(noisy - r, 0.0, 1.0)
        return jnp.stack([psnr(clean, den), ssim(clean, den)])

    vals = []
    for p in sorted(Path(data_lib.REFERENCE_VAL_DIR).glob("*.png")):
        clean = jnp.asarray(data_lib.load_gray(p), jnp.float32)
        noisy = clean + (sigma / 255.0) * jnp.asarray(
            rng.standard_normal(clean.shape), jnp.float32
        )
        vals.append(np.asarray(eval_one(clean, noisy)))
    vals = np.stack(vals)
    val_psnr, val_ssim = float(vals[:, 0].mean()), float(vals[:, 1].mean())
    noisy_psnr = 20 * np.log10(255.0 / sigma)
    print(f"val (Set12, sigma={sigma:g}): PSNR {val_psnr:.2f} dB "
          f"(noisy input: {noisy_psnr:.2f}), SSIM {val_ssim:.4f}")
    out = REPO / "checkpoints" / f"{args.name}.val.json"
    out.write_text(json.dumps({
        "val_psnr_db": round(val_psnr, 3),
        "val_ssim": round(val_ssim, 4),
        "noisy_input_psnr_db": round(float(noisy_psnr), 3),
        "val_set": "Set12 (reference training val set)",
        "noise_sigma": sigma,
        "lip": args.lip,
        "per_layer_sigma": [round(s, 5) for s in sigmas],
        "per_layer_target": round(target, 5),
        "lipschitz_product_bound": round(product, 6),
    }, indent=1))
    print(f"wrote {out}")
    if not ok:
        raise SystemExit("SPECTRAL NORM TARGETS VIOLATED")


if __name__ == "__main__":
    main()
