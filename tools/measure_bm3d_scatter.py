#!/usr/bin/env python
"""Measure the Pallas VMEM-resident scatter kernel against XLA's scatter-add
at the flagship aggregation shape (B=13, P=961*16 update rows of width
2*b*b=128 into a 121*121-row table per image).

Completes the VERDICT r4 #1 option-(b) evidence: can a hand-written kernel
beat XLA's HBM scatter for BM3D patch aggregation? Writes
``data/bm3d_scatter_v5e.json`` either way.

Usage: python tools/measure_bm3d_scatter.py [--out data/bm3d_scatter_v5e.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--bsz", type=int, default=13)
    ap.add_argument("--chunks", type=int, nargs="+", default=[512, 2048])
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pnp_svrg_tpu.ops.pallas.bm3d_scatter import bm3d_scatter_pallas

    def note(msg):
        print(f"[scatter-measure] {msg}", file=sys.stderr, flush=True)

    b = args.bsz
    nr = nc = 31
    k = 16
    p = nr * nc * k  # 15376 update rows per image
    w = 128
    t = 121 * 121  # patch-position table rows per image
    K = args.steps

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, t, (b, p)), jnp.int32)
    upd = jnp.asarray(rng.standard_normal((b, p, w)) * 0.01, jnp.float32)

    def xla_scatter(idx_, upd_):
        flat_idx = (idx_ + (jnp.arange(b) * t)[:, None]).reshape(-1)
        table = jnp.zeros((b * t, w), jnp.float32).at[flat_idx].add(
            upd_.reshape(-1, w)
        )
        return table.reshape(b, t, w)

    def chain(fn):
        @jax.jit
        def run(upd0):
            def body(u, _):
                table = fn(idx, u)
                # fold a table row back so steps serialize
                return u + table[:, :1] * 1e-6, ()

            out, _ = jax.lax.scan(body, upd0, None, length=K)
            return out

        return run

    def timeit(run):
        out = run(upd)
        float(np.asarray(out.reshape(-1)[0]))
        t0 = time.time()
        out = run(upd)
        float(np.asarray(out.reshape(-1)[0]))
        return (time.time() - t0) / K * 1e3

    record = {
        "chip": "TPU v5 lite (v5e), 1 chip",
        "shape": f"B={b}, P={p} rows x {w} wide -> {t}-row table/image",
        "method": f"{K} serialized scatters per compiled scan, scalar-fenced",
    }
    note("XLA scatter (compiling if cold)")
    ms_xla = timeit(chain(xla_scatter))
    record["xla_ms_per_call"] = round(ms_xla, 3)
    note(f"XLA scatter: {ms_xla:.3f} ms/call")

    record["pallas"] = {}
    for chunk in args.chunks:
        note(f"Pallas scatter chunk={chunk} (compiling if cold)")
        try:
            fn = lambda i_, u_: bm3d_scatter_pallas(i_, u_, t, chunk=chunk)
            ms = timeit(chain(fn))
            # hardware parity
            a = np.asarray(xla_scatter(idx, upd))
            g = np.asarray(bm3d_scatter_pallas(idx, upd, t, chunk=chunk))
            max_diff = float(np.abs(a - g).max())
            record["pallas"][str(chunk)] = {
                "ms_per_call": round(ms, 3),
                "speedup_vs_xla": round(ms_xla / ms, 2),
                "max_abs_diff": max_diff,
            }
            note(f"chunk={chunk}: {ms:.3f} ms/call "
                 f"({ms_xla / ms:.2f}x), max diff {max_diff:.2e}")
        except Exception as e:
            record["pallas"][str(chunk)] = {"error": str(e)[:1500]}
            note(f"chunk={chunk} FAILED: {e}")

    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
