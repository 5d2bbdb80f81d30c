"""Tune the bench's CSMRI + NLM quality lane (BASELINE configs[1]:
"CSMRI on 13.png: PnP-SVRG + NLM denoiser" — reference ``pnp_csmri.py``
problem family with the ``denoisers/NLM.py`` prior; the reference notebooks
recorded no number for this pairing, so this pins OURS).

Batched-grid trick: C lanes of the SAME 13.png problem (reference-exact
uniform Bernoulli mask, PRNGKey(0)) carry per-lane traced
(eta, sigma_modifier); one compiled program evaluates the whole chunk. On
TPU the default NLM path is the fused Pallas kernel
(``use_pallas=None`` + ``data/nlm_pallas_v5e.json``), so this tuner and the
bench lane exercise the production kernel.

Run on the real TPU: python examples/tune_csmri_nlm.py --out data/csmri_nlm_tuned.json
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
    parser.add_argument("--image", default="13.png")
    parser.add_argument("--n-outer", type=int, default=16)
    parser.add_argument("--t2", type=int, default=10)
    parser.add_argument("--mb", type=int, default=4000)
    parser.add_argument("--etas", type=float, nargs="+",
                        default=[2000, 4000, 7000])
    parser.add_argument("--mods", type=float, nargs="+",
                        default=[0.7, 1.0, 1.4])
    parser.add_argument("--decays", type=float, nargs="+", default=[1.0])
    parser.add_argument("--chunk", type=int, default=9)
    parser.add_argument("--out", default=None)
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
    from pnp_svrg_tpu.denoisers import NLMDenoiser
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.utils.io import load_image, resolve_data_path

    h = args.size
    img = jnp.asarray(load_image(resolve_data_path(args.image), h, h))

    configs = list(itertools.product(args.etas, args.decays, args.mods))
    C = args.chunk
    while len(configs) % C:
        configs.append(configs[-1])

    def eval_batch(chunk):
        # Bench-exact problem (key PRNGKey(0), reference-exact mask),
        # replicated per lane; run key = the bench's steady-phase key.
        probs = [
            make_csmri(jax.random.PRNGKey(0), img, sample_prob=0.5, snr=10,
                       keep_low_freq=0)
            for _ in chunk
        ]
        batched = stack_problems(probs)
        eta = jnp.asarray([c[0] for c in chunk], jnp.float32)
        dec = jnp.asarray([c[1] for c in chunk], jnp.float32)
        mod = jnp.asarray([c[2] for c in chunk], jnp.float32)
        den = NLMDenoiser(sigma_modifier=mod)
        out = pnp_svrg(
            batched, den, eta=eta, n_outer=args.n_outer, t2=args.t2,
            mini_batch_size=args.mb, lr_decay=dec, key=jax.random.PRNGKey(2),
        )
        return np.asarray(out["final_psnr"], float)

    best = (-1e9, None)
    for i in range(0, len(configs), C):
        chunk = configs[i : i + C]
        t0 = time.time()
        psnr = eval_batch(chunk)
        for (eta, dec, mod), p in zip(chunk, psnr):
            if p > best[0]:
                best = (float(p), dict(eta=eta, lr_decay=dec,
                                       sigma_modifier=mod,
                                       n_outer=args.n_outer, t2=args.t2,
                                       mini_batch_size=args.mb))
        print(
            f"chunk {i // C}: best in chunk {psnr.max():.2f} dB "
            f"(running best {best[0]:.2f}) ({time.time() - t0:.1f}s)",
            file=sys.stderr,
        )
    print(f"winner: {best[0]:.2f} dB  config={best[1]}", file=sys.stderr)
    provenance = {
        "tuner": "examples/tune_csmri_nlm.py",
        "etas": args.etas, "decays": args.decays, "mods": args.mods,
        "n_outer": args.n_outer, "t2": args.t2, "mb": args.mb,
        "size": args.size, "image": args.image,
    }
    record = {"psnr_db": best[0], **best[1], "provenance": provenance}
    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
