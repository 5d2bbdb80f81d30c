#!/usr/bin/env python
"""Measure the Pallas NLM kernel against the XLA shift-and-accumulate path
on the real TPU, at the shapes the framework actually runs (single 128^2 and
256^2 images, and the bench's 13-lane 128^2 batch).

Writes the decision artifact ``data/nlm_pallas_v5e.json`` — the evidence
behind ``NLMDenoiser.use_pallas=None`` auto-selecting the Pallas kernel on
TPU backends (VERDICT r3 weak #5: the default must be evidence-based).

Each timing point runs K back-to-back denoises inside ONE jitted lax.scan
(the iterate feeds forward, so steps serialize) and is fenced with a scalar
readback — the axon tunnel makes per-dispatch timing meaningless
(CLAUDE.md "Measuring performance").

Usage: python tools/measure_nlm_pallas.py [--out data/nlm_pallas_v5e.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pnp_svrg_tpu.denoisers.nlm import nlm_denoise
    from pnp_svrg_tpu.ops.pallas.nlm_kernel import nlm_denoise_pallas

    K = args.steps

    def chain(fn, x0, h):
        """K serialized denoises in one compiled scan (one dispatch)."""

        @jax.jit
        def run(x0):
            def body(x, _):
                y = fn(x, h, h)
                # tiny mix keeps the chain from converging to a fixpoint
                return 0.9 * y + 0.1 * x0, ()

            out, _ = jax.lax.scan(body, x0, None, length=K)
            return out

        return run

    def timeit(run, x0):
        out = run(x0)
        float(np.asarray(out.reshape(-1)[0]))  # compile + first
        t0 = time.time()
        out = run(x0)
        float(np.asarray(out.reshape(-1)[0]))
        return (time.time() - t0) / K * 1e3  # ms per denoise

    rng = np.random.default_rng(0)
    results = []
    for shape in [(128, 128), (256, 256), (13, 128, 128)]:
        x = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        h = jnp.asarray(0.08, jnp.float32)
        ms_xla = timeit(chain(nlm_denoise, x, h), x)
        ms_pl = timeit(chain(nlm_denoise_pallas, x, h), x)
        # parity on real hardware (not just interpret mode)
        a = nlm_denoise(x, h, h)
        b = nlm_denoise_pallas(x, h, h)
        max_abs = float(jnp.max(jnp.abs(a - b)))
        row = {
            "shape": list(shape),
            "xla_ms_per_call": round(ms_xla, 3),
            "pallas_ms_per_call": round(ms_pl, 3),
            "pallas_speedup": round(ms_xla / ms_pl, 2),
            "max_abs_diff": max_abs,
        }
        results.append(row)
        print(row, file=sys.stderr)

    wins = all(r["pallas_speedup"] > 1.0 for r in results)
    record = {
        "chip": "TPU v5 lite (v5e), 1 chip",
        "method": f"{K} serialized denoises per compiled scan, scalar-fenced",
        "patch_size": 4,
        "patch_distance": 5,
        "results": results,
        "decision": (
            "use_pallas=None auto-selects Pallas on TPU"
            if wins else "XLA path stays the TPU default"
        ),
    }
    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
