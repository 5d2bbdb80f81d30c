"""Benchmark: batched Set12 CSMRI reconstruction throughput on one TPU chip.

Headline metric: PnP iterations/second (image-iterations, i.e. summed over
the batch) for PnP-SVRG + native BM3D on 128x128 CSMRI — directly comparable
to the reference's ~2.5-3.3 it/s single-image CPU baseline (BASELINE.md
"Throughput baseline": iteration counts / 60 s wall budget).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "pnp_iters_per_sec", "vs_baseline": N}
Reconstruction quality (mean final PSNR) is printed to stderr for the record.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: repeated bench runs skip the (slow) first
# XLA compile of the batched scan program.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

BASELINE_ITERS_PER_SEC = 2.9  # midpoint of the reference's 2.5-3.3 it/s


def main():
    import jax
    import jax.numpy as jnp

    # The env var alone is not sufficient on the axon PJRT plugin; force the
    # persistent cache on so repeated bench runs skip the multi-minute compile.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pnp_svrg_tpu.algorithms.loops import pnp_svrg
    from pnp_svrg_tpu.core.batched import stack_problems
    from pnp_svrg_tpu.denoisers.bm3d import BM3DDenoiser, BM3DParams
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.utils.io import set12_paths, load_image

    h = w = 128
    n_outer = int(os.environ.get("BENCH_OUTER", 16))
    t2, mb = 10, 4000
    eta = 6000.0

    paths = set12_paths()
    paths = paths[: int(os.environ.get("BENCH_BSZ", len(paths)))]
    # The reference's flagship quality config (BASELINE.md: 13.png, 128x128,
    # p=0.5, SNR 10, BM3D -> 22.8 dB) rides along as an extra batch lane so
    # quality-vs-reference is checked by the same compiled program.
    from pnp_svrg_tpu.utils.io import resolve_data_path

    paths = list(paths) + [resolve_data_path("13.png")]
    keys = list(jax.random.split(jax.random.PRNGKey(0), len(paths) - 1))
    keys.append(jax.random.PRNGKey(0))  # fixed key for the flagship lane
    problems = [
        make_csmri(k, jnp.asarray(load_image(p, h, w)), sample_prob=0.5, snr=10)
        for k, p in zip(keys, paths)
    ]
    batched = stack_problems(problems)
    bsz = len(problems)
    den = BM3DDenoiser(sigma_modifier=1.0, params=BM3DParams(search=8))

    def run(problem_batch, key):
        # Batch-polymorphic loop: (B, N) state, denoiser sees (B, H, W).
        out = pnp_svrg(
            problem_batch,
            den,
            eta=eta,
            n_outer=n_outer,
            t2=t2,
            mini_batch_size=mb,
            key=key,
        )
        return {k: out[k] for k in ("z", "psnr_per_iter", "final_psnr")}

    t0 = time.time()
    out = run(batched, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0

    t0 = time.time()
    out = run(batched, jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    steady = time.time() - t0

    iters = n_outer * (t2 + 1)  # inner steps + snapshot entries, ref layout
    image_iters = bsz * iters
    its_per_sec = image_iters / steady
    psnrs = np.asarray(out["final_psnr"])

    print(
        f"bench: {bsz} images x {iters} iters, steady {steady:.2f}s "
        f"(first+compile {compile_and_first:.1f}s), mean final PSNR "
        f"{psnrs.mean():.2f} dB (per-image: {psnrs.round(2).tolist()})",
        file=sys.stderr,
    )
    print(
        f"bench quality: 13.png flagship config {psnrs[-1]:.2f} dB "
        f"vs reference 22.8 dB (BASELINE.md CSMRI/SVRG/BM3D)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "set12_csmri_128_svrg_bm3d_image_iters_per_sec",
                "value": round(its_per_sec, 2),
                "unit": "pnp_iters_per_sec",
                "vs_baseline": round(its_per_sec / BASELINE_ITERS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
