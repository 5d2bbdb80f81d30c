"""Scaling harness: batched CSMRI reconstruction throughput vs. mesh size.

The north-star deliverable of the distributed layer (SURVEY.md §7.6):
measure images/s for the flagship PnP-SVRG + BM3D workload at increasing
data-parallel mesh widths. On a real multi-chip slice this sweeps actual
chips; on a dev box run it against the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/scaling.py --devices 1 2 4 8 --size 64

Prints one JSON line per mesh size:
    {"devices": D, "images_per_sec": ..., "iters_per_sec": ..., "psnr": ...}

Multi-host: call with the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID env vars set (``init_distributed`` picks them up) and a
--devices value spanning all hosts' chips.
"""

import argparse
import json
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--devices", type=int, nargs="+", default=[1])
    parser.add_argument("--images-per-device", type=int, default=2)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--n-outer", type=int, default=4)
    parser.add_argument("--t2", type=int, default=10)
    parser.add_argument("--eta", type=float, default=1500.0)
    parser.add_argument("--mb", type=int, default=1000)
    parser.add_argument("--search", type=int, default=6)
    parser.add_argument("--out", default=None,
                        help="optional JSON artifact path (adds metadata + "
                             "weak-scaling efficiency vs the 1-device row)")
    parser.add_argument("--overhead-baseline", action="store_true",
                        help="also time each total batch UNSHARDED on one "
                             "device and report t_sharded/t_unsharded. On a "
                             "virtual CPU mesh (shared physical cores) this "
                             "isolates the SPMD partitioning/collective "
                             "overhead — raw weak-scaling efficiency there "
                             "measures core sharing, not the mesh.")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnp_svrg_tpu.core.batched import stack_problems
    from pnp_svrg_tpu.denoisers.bm3d import BM3DDenoiser, BM3DParams
    from pnp_svrg_tpu.parallel import init_distributed, make_mesh, run_batch
    from pnp_svrg_tpu.problems import make_csmri
    from pnp_svrg_tpu.utils.io import load_image, set12_paths

    init_distributed()
    all_devices = jax.devices()
    den = BM3DDenoiser(sigma_modifier=1.0, params=BM3DParams(search=args.search))
    paths = set12_paths()
    iters = args.n_outer * (args.t2 + 1)
    rows = []

    for d in args.devices:
        if d > len(all_devices):
            print(json.dumps({"devices": d, "skipped": "not enough devices"}))
            continue
        mesh = make_mesh((d, 1), devices=all_devices[:d])
        bsz = d * args.images_per_device
        keys = jax.random.split(jax.random.PRNGKey(0), bsz)
        problems = [
            make_csmri(
                keys[i],
                jnp.asarray(load_image(paths[i % len(paths)], args.size, args.size)),
                sample_prob=0.5,
                snr=10,
            )
            for i in range(bsz)
        ]
        batched = stack_problems(problems)

        def run(use_mesh):
            return run_batch(
                "svrg",
                batched,
                den,
                key=jax.random.PRNGKey(1),
                mesh=use_mesh,
                eta=args.eta,
                n_outer=args.n_outer,
                t2=args.t2,
                mini_batch_size=args.mb,
            )

        def timed(use_mesh):
            out = run(use_mesh)
            jax.block_until_ready(out["z"])  # compile + first run
            t0 = time.time()
            out = run(use_mesh)
            psnr = np.asarray(out["final_psnr"])  # host transfer = true sync
            return time.time() - t0, psnr

        dt, psnr = timed(mesh)
        row = {
            "devices": d,
            "batch": bsz,
            "images_per_sec": round(bsz * iters / dt / iters, 3),
            "image_iters_per_sec": round(bsz * iters / dt, 2),
            "wall_s": round(dt, 3),
            "mean_psnr": round(float(psnr.mean()), 2),
        }
        if args.overhead_baseline:
            dt0, _ = timed(None)  # same total batch, no mesh
            row["unsharded_wall_s"] = round(dt0, 3)
            row["sharding_overhead"] = round(dt / dt0, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out and rows:
        base = rows[0]["image_iters_per_sec"] / rows[0]["devices"]
        for row in rows:
            # weak-scaling efficiency: throughput per device vs the smallest
            # mesh's per-device throughput (batch grows with the mesh)
            row["weak_scaling_efficiency"] = round(
                row["image_iters_per_sec"] / row["devices"] / base, 3
            )
        record = {
            "program": (
                f"run_batch svrg+BM3D(search={args.search}), "
                f"{args.images_per_device} x {args.size}^2 CSMRI images per "
                f"device, {args.n_outer}x({args.t2}+1) iters, mesh (d, 1) "
                f"batch axis"
            ),
            "backend": jax.default_backend(),
            "device_kind": str(all_devices[0].device_kind),
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
