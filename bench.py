"""Benchmark: batched Set12 CSMRI reconstruction throughput on one TPU chip.

Headline metric: PnP iterations/second (image-iterations, i.e. summed over
the batch) for PnP-SVRG + native BM3D on 128x128 CSMRI — directly comparable
to the reference's ~2.5-3.3 it/s single-image CPU baseline (BASELINE.md
"Throughput baseline": iteration counts / 60 s wall budget).

Structured so the ONE JSON line is guaranteed out under a cold compile cache
(round 3's capture timed out compiling three full programs before the first
print — VERDICT.md "What's weak" #1):

* The DEFAULT run times exactly ONE compiled program (the bf16 headline
  operating point) and then adds quality-only lanes, each gated by an
  internal wall-clock budget (``BENCH_BUDGET_S``, default 480 s). Lanes that
  would blow the budget are skipped and recorded in the JSON as
  ``"skipped": [...]`` — the line always prints.
* ``BENCH_FULL=1`` re-enables the comparison lanes (f32-match and search=12
  throughput/quality), each its own XLA compile.
* ``BENCH_BSZ`` / ``BENCH_OUTER`` shrink every lane (Set12 lane count /
  iteration budgets, including the PR and deblur lanes):
  ``BENCH_BSZ=2 BENCH_OUTER=2 python bench.py`` exits 0 in ~4 min with a
  cold compile cache (shrunken shapes are fresh XLA programs) and well
  under a minute warm. Per-lane tuned configs are sliced by lane NAME, so
  any subset works.

Lanes (in order; details on stderr):

* Headline: 12 Set12 images with per-lane tuned (eta, sigma_modifier) from
  ``data/set12_csmri_tuned.json`` (produced by ``examples/tune_set12.py`` on
  this hardware) and variable-density masks (``make_csmri(keep_low_freq=4)``
  — the reference's uniform Bernoulli mask leaves the DC coefficient present
  only by coin flip, which makes the image mean unidentifiable and caps
  unlucky lanes at single-digit PSNR regardless of algorithm; see
  ``problems/csmri.py``). Quality fields are named ``set12_vd_*`` to mark
  the variable-density variant; the reference-exact numbers are the
  ``set12_uniform_*`` and ``flagship_*`` fields.
* Riding along in the same batch: the reference flagship lane — 13.png,
  reference-EXACT Bernoulli mask, p=0.5, SNR 10 (BASELINE.md
  CSMRI/SVRG/BM3D: 22.8 dB).
* A TURBO lane: the same batch at the grid-aligned stride-2 search +
  Pallas-matcher operating point (data/bm3d_pallas_v5e.json) with its own
  per-lane tuned configs (data/set12_csmri_turbo_tuned.json) — recorded as
  ``turbo_*`` fields (faster AND better on the VD lanes; the headline
  metric stays at the full-search point for flagship-lane quality).
* A reference-exact-mask Set12 aggregate: the same images with uniform
  Bernoulli masks (keep_low_freq=0, the reference's exact problem,
  ``/root/reference/problems/CSMRI.py:43-45``), per-lane tuned from
  ``data/set12_csmri_uniform_tuned.json``. Same compiled program — data
  differs, shapes don't.
* A CSMRI + NLM lane — 13.png, reference-exact mask, PnP-SVRG with the
  default (Pallas on TPU) NLM kernel (BASELINE configs[1]), config from
  ``data/csmri_nlm_tuned.json`` (``examples/tune_csmri_nlm.py``).
* A PR + BM3D lane — Set12/04, alpha=0.5, SNR 20 (BASELINE.md PR table:
  SVRG+BM3D 26.8 dB), config loaded from ``data/pr_tuned.json``
  (``examples/tune_pr.py``).
* A PR + PnP-SARAH + RealSN-DnCNN lane (BASELINE configs[3]) certifying the
  replica-mean PSNR over 4 minibatch key streams, config from
  ``data/pr_sarah_realsn_tuned.json`` (``examples/tune_pr.py --algo sarah
  --denoiser realsn --replicas 4``).
* A Deblur + BM3D lane — Set12/01 at 256x256, "Minimal" kernel, SNR 5 (the
  reference deblur notebook's configuration, which saved no outputs; this
  pins our own number) from ``data/deblur_tuned.json``.
* A Deblur-SR + BM3D lane — 25x25 ``kernel25.png`` blur + 50% bilinear
  downsampling at SNR 20 (BASELINE configs[2]) from
  ``data/deblur_sr_tuned.json``.

Every quality lane records SSIM next to PSNR (the north-star metric is
"PSNR/SSIM"; SSIM via ``ops/metrics.ssim``, skimage-convention).

The headline uses bfloat16 block-matching distances (selection-only
precision; filtering stays f32) — the operating point picked from the
measured knob matrix ``data/bm3d_knobs_v5e.json``.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N, ...}
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
DATA = os.path.join(os.path.dirname(__file__), "data")
TUNED_JSON = os.path.join(DATA, "set12_csmri_tuned.json")
UNIFORM_TUNED_JSON = os.path.join(DATA, "set12_csmri_uniform_tuned.json")
PR_TUNED_JSON = os.path.join(DATA, "pr_tuned.json")
DEBLUR_TUNED_JSON = os.path.join(DATA, "deblur_tuned.json")

T_START = time.time()


def note(msg: str) -> None:
    print(f"[bench t={time.time() - T_START:5.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _sync(tree):
    """Scalar host-readback fence — block_until_ready is unreliable over the
    axon PJRT tunnel (see CLAUDE.md 'Measuring performance')."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "reshape") and getattr(leaf, "size", 0):
            float(np.real(np.asarray(leaf.reshape(-1)[0])))


def _lane_params(tuned, lane_names, default_eta, default_mod):
    """Per-lane (eta, sigma_modifier) arrays sliced from a tuned JSON by lane
    NAME — works for any BENCH_BSZ subset (the round-3 crash applied a
    13-entry table to a shrunken batch; VERDICT.md weak #2)."""
    import jax.numpy as jnp

    etas, mods = [], []
    by_name = {}
    if tuned:
        by_name = {
            n: (e, m)
            for n, e, m in zip(tuned["lanes"], tuned["eta"],
                               tuned["sigma_modifier"])
        }
    for name in lane_names:
        e, m = by_name.get(name, (default_eta, default_mod))
        etas.append(e)
        mods.append(m)
    return jnp.asarray(etas, jnp.float32), jnp.asarray(mods, jnp.float32)


def _load_json(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


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
    from pnp_svrg_tpu.ops.metrics import ssim
    from pnp_svrg_tpu.problems import make_csmri, make_deblur, make_phase_retrieval
    from pnp_svrg_tpu.utils.io import set12_paths, load_image, resolve_data_path

    budget_s = float(os.environ.get("BENCH_BUDGET_S", 480))
    full = os.environ.get("BENCH_FULL") == "1"
    skipped = []
    # The budget clock starts at the first device work (set below), not at
    # import: the axon tunnel sometimes takes minutes to accept a new client
    # and that stall should not consume the lane budget.
    t_budget0 = [T_START]

    def have_time(lane: str) -> bool:
        if time.time() - t_budget0[0] < budget_s:
            return True
        note(f"budget {budget_s:.0f}s exceeded — skipping lane '{lane}'")
        skipped.append(lane)
        return False

    ssim_batch = jax.jit(jax.vmap(ssim))

    h = w = 128
    n_outer = int(os.environ.get("BENCH_OUTER", 16))
    t2, mb = 10, 4000

    tuned = _load_json(TUNED_JSON)

    paths = set12_paths()
    paths = paths[: int(os.environ.get("BENCH_BSZ", len(paths)))]
    n_set12 = len(paths)
    # The reference's flagship quality config (BASELINE.md: 13.png, 128x128,
    # p=0.5, SNR 10, BM3D -> 22.8 dB) rides along as an extra batch lane so
    # quality-vs-reference is checked by the same compiled program. It keeps
    # the reference-exact uniform Bernoulli mask (keep_low_freq=0).
    paths = list(paths) + [resolve_data_path("13.png")]
    lane_names = [os.path.basename(p) for p in paths]
    keep = int(tuned["config"].get("keep_low_freq", 4)) if tuned else 4
    keeps = [keep] * n_set12 + [0]
    keys = list(jax.random.split(jax.random.PRNGKey(0), len(paths) - 1))
    keys.append(jax.random.PRNGKey(0))  # fixed key for the flagship lane
    problems = [
        make_csmri(
            k, jnp.asarray(load_image(p, h, w)), sample_prob=0.5, snr=10,
            keep_low_freq=kl,
        )
        for k, p, kl in zip(keys, paths, keeps)
    ]
    batched = stack_problems(problems)
    bsz = len(problems)

    eta, mod = _lane_params(tuned, lane_names, 6000.0, 1.0)

    def run(problem_batch, key, search, eta_v, mod_v, match_dtype="float32"):
        den = BM3DDenoiser(
            sigma_modifier=mod_v,
            params=BM3DParams(search=search, match_dtype=match_dtype),
        )
        out = pnp_svrg(
            problem_batch,
            den,
            eta=eta_v,
            n_outer=n_outer,
            t2=t2,
            mini_batch_size=mb,
            key=key,
        )
        return {k: out[k] for k in ("image", "final_psnr")}

    def timed(search, match_dtype="float32"):
        t0 = time.time()
        out = run(batched, jax.random.PRNGKey(1), search, eta, mod, match_dtype)
        _sync(out)
        first = time.time() - t0
        t0 = time.time()
        out = run(batched, jax.random.PRNGKey(2), search, eta, mod, match_dtype)
        _sync(out)
        return out, time.time() - t0, first

    # ---- Headline lane: search=8, bfloat16 block-matching distances --------
    # (selection-only precision — the filtering math stays f32). Knob matrix
    # measured on v5e (tools/measure_bm3d_knobs.py, data/bm3d_knobs_v5e.json):
    # bf16 matching is +6.5-7.4% it/s at statistically unchanged PSNR;
    # lax.approx_min_k is SLOWER than the iterative exact k-argmin at every
    # config (S<=625, K=16), so topk stays "exact".
    t_budget0[0] = time.time()
    note(f"headline lane: {bsz} lanes x {n_outer}x({t2}+1) iters, "
         f"search=8 bf16-match (compiling if cache cold)")
    out, steady, compile_and_first = timed(8, "bfloat16")
    note(f"headline steady {steady:.2f}s (first+compile {compile_and_first:.1f}s)")

    iters = n_outer * (t2 + 1)  # inner steps + snapshot entries, ref layout
    image_iters = bsz * iters
    its_per_sec = image_iters / steady
    psnrs = np.asarray(out["final_psnr"])
    ssims = np.asarray(ssim_batch(batched.x, out["image"]))
    set12_psnrs = psnrs[:n_set12]
    set12_ssims = ssims[:n_set12]
    flagship = float(psnrs[-1])
    flagship_ssim = float(ssims[-1])

    print(
        f"bench: {bsz} images x {iters} iters, steady {steady:.2f}s "
        f"(first+compile {compile_and_first:.1f}s), Set12-VD mean final "
        f"PSNR {set12_psnrs.mean():.2f} dB min {set12_psnrs.min():.2f} dB "
        f"SSIM {set12_ssims.mean():.3f} "
        f"(per-image: {psnrs.round(2).tolist()})",
        file=sys.stderr,
    )
    print(
        f"bench quality: 13.png flagship (reference-exact mask) {flagship:.2f} dB "
        f"SSIM {flagship_ssim:.3f} vs reference 22.8 dB (BASELINE.md "
        f"CSMRI/SVRG/BM3D)",
        file=sys.stderr,
    )

    record = {
        "metric": "set12_csmri_128_svrg_bm3d_image_iters_per_sec",
        "value": round(its_per_sec, 2),
        "unit": "pnp_iters_per_sec",
        "vs_baseline": round(its_per_sec / BASELINE_ITERS_PER_SEC, 2),
        # Set12 quality on the variable-density mask variant (keep_low_freq=4
        # — an improvement over the reference's uniform Bernoulli mask; the
        # reference-exact numbers are set12_uniform_* and flagship_*).
        "problem_variant": "set12_vd_* = variable-density masks (keep_low_freq=4); set12_uniform_* and flagship_* are reference-exact uniform Bernoulli",
        "set12_vd_mean_psnr_db": round(float(set12_psnrs.mean()), 2),
        "set12_vd_min_psnr_db": round(float(set12_psnrs.min()), 2),
        "set12_vd_mean_ssim": round(float(set12_ssims.mean()), 4),
        "flagship_13png_psnr_db": round(flagship, 2),
        "flagship_13png_ssim": round(flagship_ssim, 4),
        "flagship_ref_psnr_db": 22.8,
    }

    # ---- Turbo lane: grid-aligned stride-2 search + Pallas matcher --------
    # The fastest measured operating point that does NOT give up Set12-VD
    # quality (data/bm3d_pallas_v5e.json flagship table: 966.6 vs 842.6
    # it/s with VD mean 26.69 vs 26.50 dB). The full-search tuned etas sit
    # at the stability edge under the slightly weaker stride-2 denoiser
    # (the 13.png lane diverges), so this lane REQUIRES its own per-lane
    # configs from examples/tune_set12.py --search-step 2 --matcher pallas
    # --match-dtype bfloat16 (data/set12_csmri_turbo_tuned.json).
    turbo_tuned = _load_json(os.path.join(DATA, "set12_csmri_turbo_tuned.json"))
    if turbo_tuned and have_time("turbo"):
        note("turbo lane: search_step=2 + Pallas matcher (compiling if cold)")
        teta, tmod = _lane_params(turbo_tuned, lane_names, 4000.0, 1.0)

        def run_turbo(key):
            den_t = BM3DDenoiser(
                sigma_modifier=tmod,
                params=BM3DParams(search=8, search_step=2, matcher="pallas",
                                  match_dtype="bfloat16"),
            )
            out_t = pnp_svrg(
                batched, den_t, eta=teta, n_outer=n_outer, t2=t2,
                mini_batch_size=mb, key=key,
            )
            return {k: out_t[k] for k in ("image", "final_psnr")}

        out_t = run_turbo(jax.random.PRNGKey(1))
        _sync(out_t)
        t0 = time.time()
        out_t = run_turbo(jax.random.PRNGKey(2))
        _sync(out_t)
        turbo_steady = time.time() - t0
        tpsnrs = np.asarray(out_t["final_psnr"])
        tssims = np.asarray(ssim_batch(batched.x, out_t["image"]))
        record["turbo_iters_per_sec"] = round(image_iters / turbo_steady, 2)
        record["turbo_set12_vd_mean_psnr_db"] = round(
            float(tpsnrs[:n_set12].mean()), 2
        )
        record["turbo_set12_vd_mean_ssim"] = round(
            float(tssims[:n_set12].mean()), 4
        )
        record["turbo_flagship_13png_psnr_db"] = round(float(tpsnrs[-1]), 2)
        record["turbo_operating_point"] = (
            "BM3D search=8 search_step=2 matcher=pallas match_dtype=bfloat16"
        )
        print(
            f"bench turbo: {image_iters / turbo_steady:.0f} it/s "
            f"(headline {its_per_sec:.0f}), Set12-VD mean "
            f"{tpsnrs[:n_set12].mean():.2f} dB, flagship "
            f"{tpsnrs[-1]:.2f} dB",
            file=sys.stderr,
        )

    # ---- Turbo-4 lane: stride-4 grid-aligned search (the 1.82x point) ------
    # data/bm3d_pallas_v5e.json: 1537 it/s; per-lane retuned configs give
    # VD mean 26.08 (-0.42 vs headline) / flagship 24.63 (-0.91, still well
    # above the reference's 22.8) — the throughput-maximal operating point.
    turbo4_tuned = _load_json(
        os.path.join(DATA, "set12_csmri_turbo4_tuned.json")
    )
    if turbo4_tuned and have_time("turbo4"):
        note("turbo4 lane: search_step=4 + Pallas matcher (compiling if cold)")
        t4eta, t4mod = _lane_params(turbo4_tuned, lane_names, 4000.0, 1.5)

        def run_turbo4(key):
            den_t = BM3DDenoiser(
                sigma_modifier=t4mod,
                params=BM3DParams(search=8, search_step=4, matcher="pallas",
                                  match_dtype="bfloat16"),
            )
            out_t = pnp_svrg(
                batched, den_t, eta=t4eta, n_outer=n_outer, t2=t2,
                mini_batch_size=mb, key=key,
            )
            return {k: out_t[k] for k in ("image", "final_psnr")}

        out_t4 = run_turbo4(jax.random.PRNGKey(1))
        _sync(out_t4)
        t0 = time.time()
        out_t4 = run_turbo4(jax.random.PRNGKey(2))
        _sync(out_t4)
        turbo4_steady = time.time() - t0
        t4psnrs = np.asarray(out_t4["final_psnr"])
        record["turbo4_iters_per_sec"] = round(image_iters / turbo4_steady, 2)
        record["turbo4_set12_vd_mean_psnr_db"] = round(
            float(t4psnrs[:n_set12].mean()), 2
        )
        record["turbo4_flagship_13png_psnr_db"] = round(float(t4psnrs[-1]), 2)
        record["turbo4_operating_point"] = (
            "BM3D search=8 search_step=4 matcher=pallas match_dtype=bfloat16"
        )
        print(
            f"bench turbo4: {image_iters / turbo4_steady:.0f} it/s, "
            f"Set12-VD mean {t4psnrs[:n_set12].mean():.2f} dB, flagship "
            f"{t4psnrs[-1]:.2f} dB",
            file=sys.stderr,
        )

    # ---- Comparison lanes (each a separate XLA compile): BENCH_FULL=1 only -
    if full and have_time("f32_match"):
        note("f32-match comparison lane")
        out_f32, steady_f32, _ = timed(8, "float32")
        psnrs_f32 = np.asarray(out_f32["final_psnr"])[:n_set12]
        record["iters_per_sec_f32_match"] = round(image_iters / steady_f32, 2)
        record["set12_vd_f32_match_mean_psnr_db"] = round(
            float(psnrs_f32.mean()), 2
        )
        note(f"f32-match steady {steady_f32:.2f}s "
             f"mean {psnrs_f32.mean():.2f} dB")
    if full and have_time("search12"):
        note("search=12 comparison lane")
        out12, steady12, _ = timed(12)
        psnrs12 = np.asarray(out12["final_psnr"])[:n_set12]
        record["iters_per_sec_bm3d_search12"] = round(image_iters / steady12, 2)
        record["set12_vd_search12_mean_psnr_db"] = round(float(psnrs12.mean()), 2)
        note(f"search=12 steady {steady12:.2f}s mean {psnrs12.mean():.2f} dB")

    # ---- Reference-exact-mask Set12 aggregate (uniform Bernoulli) ---------
    # Same batch shapes/keys as the headline run -> the compiled program is
    # reused; only the mask data and the per-lane tuned (eta, mod) differ.
    # NOTE on the absolute level of these numbers: with the reference's exact
    # uniform Bernoulli(p=0.5) mask, each Fourier coefficient — including DC
    # and the other low frequencies — survives by coin flip. Under PRNGKey(0)
    # lanes, 7 of 12 Set12 masks LOSE the DC coefficient (init PSNRs 4.7-10.9
    # dB); those lanes are mean-unidentifiable and cap in the low teens no
    # matter the algorithm (measured: f32 vs bf16 matching differ < 0.1 dB
    # here). Every lane still improves on its zero-filled init; the
    # delta fields below record that. The variable-density headline
    # (keep_low_freq=4) is the documented fix.
    utuned = _load_json(UNIFORM_TUNED_JSON)
    if utuned and have_time("set12_uniform"):
        note("reference-exact uniform-mask Set12 lane (reuses headline program)")
        ueta, umod = _lane_params(utuned, lane_names, 6000.0, 1.0)
        uproblems = [
            make_csmri(
                k, jnp.asarray(load_image(p, h, w)), sample_prob=0.5, snr=10,
                keep_low_freq=0,
            )
            for k, p in zip(keys, paths)
        ]
        ubatched = stack_problems(uproblems)
        uinit = np.asarray(
            jax.jit(lambda b: b.psnr(b.x_init))(ubatched)
        )[:n_set12]
        out_u = run(ubatched, jax.random.PRNGKey(2), 8, ueta, umod, "bfloat16")
        upsnrs = np.asarray(out_u["final_psnr"])[:n_set12]
        ussims = np.asarray(ssim_batch(ubatched.x, out_u["image"]))[:n_set12]
        record["set12_uniform_mean_psnr_db"] = round(float(upsnrs.mean()), 2)
        record["set12_uniform_min_psnr_db"] = round(float(upsnrs.min()), 2)
        record["set12_uniform_mean_ssim"] = round(float(ussims.mean()), 4)
        record["set12_uniform_mean_init_psnr_db"] = round(float(uinit.mean()), 2)
        record["set12_uniform_mean_delta_db"] = round(
            float((upsnrs - uinit).mean()), 2
        )
        # Per-lane identifiability: a lane whose uniform Bernoulli mask lost
        # the DC coefficient cannot recover the image mean — its final PSNR
        # caps in the low teens regardless of algorithm. Recording per-image
        # init/final PSNR + the dc_lost flag makes that machine-readable
        # (separates "mask unidentifiable" from tuning regressions).
        udc = [
            bool(np.asarray(p.mask)[0, 0] == 0) for p in uproblems[:n_set12]
        ]
        record["set12_uniform_lanes"] = lane_names[:n_set12]
        record["set12_uniform_psnr_db_per_image"] = [
            round(float(v), 2) for v in upsnrs
        ]
        record["set12_uniform_init_psnr_db_per_image"] = [
            round(float(v), 2) for v in uinit
        ]
        record["set12_uniform_dc_lost_per_image"] = udc
        print(
            f"bench quality: Set12 uniform (reference-exact) masks mean "
            f"{upsnrs.mean():.2f} dB (init {uinit.mean():.2f}, delta "
            f"+{(upsnrs - uinit).mean():.2f}) min {upsnrs.min():.2f} dB SSIM "
            f"{ussims.mean():.3f} (per-image: {upsnrs.round(2).tolist()}; "
            f"7/12 masks lose DC by the reference's coin flip — see note "
            f"above)",
            file=sys.stderr,
        )

    # ---- CSMRI + NLM quality lane (BASELINE configs[1]: "CSMRI on 13.png:
    # PnP-SVRG + NLM denoiser" — reference pnp_csmri.py problem family with
    # the denoisers/NLM.py prior; no recorded upstream number, this pins
    # ours). On TPU the default NLM path is the fused Pallas kernel
    # (use_pallas=None auto-select, data/nlm_pallas_v5e.json), so this lane
    # exercises the production kernel end-to-end. Config from
    # examples/tune_csmri_nlm.py. NOTE: the tuner scored this config in a
    # batched grid (fold_in(key, lane) minibatch streams) while this lane
    # replays it single-problem (raw key stream) — expect a small
    # tuned-vs-bench gap (measured 27.16 tuned vs 27.09 here; NLM is far
    # less key-stream-sensitive than PR+SARAH).
    nlm_tuned = _load_json(os.path.join(DATA, "csmri_nlm_tuned.json"))
    if nlm_tuned and have_time("csmri_nlm"):
        from pnp_svrg_tpu.denoisers import NLMDenoiser

        nl_cfg = {"eta": 4000.0, "lr_decay": 1.0, "sigma_modifier": 1.0,
                  "n_outer": 16, "t2": 10, "mini_batch_size": 4000}
        nl_cfg.update({k: v for k, v in nlm_tuned.items() if k in nl_cfg})
        nl_outer = min(int(nl_cfg["n_outer"]), n_outer) if "BENCH_OUTER" in os.environ else int(nl_cfg["n_outer"])
        note(f"CSMRI+NLM lane (13.png, n_outer={nl_outer}, Pallas-default "
             f"NLM, compiling if cache cold)")
        nlp = make_csmri(
            jax.random.PRNGKey(0),
            jnp.asarray(load_image(resolve_data_path("13.png"), h, w)),
            sample_prob=0.5, snr=10, keep_low_freq=0,
        )
        nl_out = pnp_svrg(
            nlp, NLMDenoiser(sigma_modifier=nl_cfg["sigma_modifier"]),
            eta=nl_cfg["eta"], n_outer=nl_outer, t2=int(nl_cfg["t2"]),
            mini_batch_size=int(nl_cfg["mini_batch_size"]),
            lr_decay=nl_cfg["lr_decay"], key=jax.random.PRNGKey(2),
        )
        nl_psnr = float(np.asarray(nl_out["final_psnr"]))
        nl_ssim = float(np.asarray(ssim(nlp.x, nl_out["image"])))
        record["csmri_nlm_psnr_db"] = round(nl_psnr, 2)
        record["csmri_nlm_ssim"] = round(nl_ssim, 4)
        print(
            f"bench quality: CSMRI+NLM (13.png, reference-exact mask, "
            f"BASELINE configs[1]) {nl_psnr:.2f} dB SSIM {nl_ssim:.3f} "
            f"(no recorded upstream number)",
            file=sys.stderr,
        )

    # ---- PR + BM3D quality lane (BASELINE.md PR table: 26.8 dB) -----------
    # Tuned config from examples/tune_pr.py (data/pr_tuned.json); falls back
    # to a known-good hand config. Honors BENCH_OUTER.
    if have_time("pr_bm3d"):
        pr_cfg = {"eta": 0.2, "lr_decay": 0.99, "sigma_modifier": 1.0,
                  "n_outer": 20, "t2": 8, "mini_batch_size": 800}
        pr_tuned = _load_json(PR_TUNED_JSON)
        if pr_tuned:
            pr_cfg.update({k: v for k, v in pr_tuned.items() if k in pr_cfg})
        pr_outer = min(int(pr_cfg["n_outer"]), n_outer) if "BENCH_OUTER" in os.environ else int(pr_cfg["n_outer"])
        note(f"PR+BM3D lane (n_outer={pr_outer}, compiling if cache cold)")
        img04 = jnp.asarray(load_image(resolve_data_path("Set12/04.png"), h, w))
        pr = make_phase_retrieval(
            jax.random.PRNGKey(4), img04, num_meas=8192, snr=20
        )
        den_pr = BM3DDenoiser(
            sigma_modifier=pr_cfg["sigma_modifier"], params=BM3DParams(search=8)
        )
        pr_out = pnp_svrg(
            pr, den_pr, eta=pr_cfg["eta"], n_outer=pr_outer,
            t2=int(pr_cfg["t2"]),
            mini_batch_size=int(pr_cfg["mini_batch_size"]),
            lr_decay=pr_cfg["lr_decay"], key=jax.random.PRNGKey(5),
        )
        pr_psnr = float(np.asarray(pr_out["final_psnr"]))
        pr_ssim = float(np.asarray(ssim(pr.x, pr_out["image"])))
        record["pr_bm3d_psnr_db"] = round(pr_psnr, 2)
        record["pr_bm3d_ssim"] = round(pr_ssim, 4)
        record["pr_bm3d_ref_psnr_db"] = 26.8
        print(
            f"bench quality: PR+BM3D (Set12/04, alpha=0.5, SNR 20) "
            f"{pr_psnr:.2f} dB SSIM {pr_ssim:.3f} vs reference 26.8 dB "
            f"(BASELINE.md PR/SVRG/BM3D)",
            file=sys.stderr,
        )

    # ---- PR + PnP-SARAH + RealSN-DnCNN lane (BASELINE configs[3]:
    # reference ``problems/PR.py:12-87`` + ``denoisers/RealSN_DnCNN.py:8-42``;
    # no recorded upstream PSNR — this pins ours). Framework-trained sigma=5
    # checkpoint; config from examples/tune_pr.py --algo sarah
    # --denoiser realsn --replicas 4 (data/pr_sarah_realsn_tuned.json).
    # PR+SARAH is several-dB sensitive to the minibatch key stream, so the
    # lane runs R identical problems in one batch (per-lane keys
    # fold_in(key, lane), core/batched.py select_mb) and certifies the
    # REPLICA-MEAN PSNR — the exact quantity the tuner optimizes, with the
    # exact same keys.
    sarah_tuned = _load_json(os.path.join(DATA, "pr_sarah_realsn_tuned.json"))
    if sarah_tuned and have_time("pr_sarah_realsn"):
        from pnp_svrg_tpu.algorithms.loops import pnp_sarah
        from pnp_svrg_tpu.denoisers import DnCNNDenoiser

        sa_cfg = {"eta": 0.05, "lr_decay": 0.99, "n_outer": 20, "t2": 8,
                  "mini_batch_size": 800}
        sa_cfg.update({k: v for k, v in sarah_tuned.items() if k in sa_cfg})
        sa_reps = int(sarah_tuned.get("replicas", 1))
        sa_outer = min(int(sa_cfg["n_outer"]), n_outer) if "BENCH_OUTER" in os.environ else int(sa_cfg["n_outer"])
        note(f"PR+SARAH+RealSN lane (n_outer={sa_outer}, {sa_reps} replica "
             f"lanes, compiling if cache cold)")
        img04s = jnp.asarray(load_image(resolve_data_path("Set12/04.png"), h, w))
        prs_list = [
            make_phase_retrieval(
                jax.random.PRNGKey(4), img04s, num_meas=8192, snr=20
            )
            for _ in range(sa_reps)
        ]
        prs = stack_problems(prs_list) if sa_reps > 1 else prs_list[0]
        realsn = DnCNNDenoiser.from_pretrained(
            "RealSN_DnCNN", sigma=int(sarah_tuned.get("realsn_sigma", 5))
        )
        sa_out = pnp_sarah(
            prs, realsn, eta=sa_cfg["eta"], n_outer=sa_outer,
            t2=int(sa_cfg["t2"]),
            mini_batch_size=int(sa_cfg["mini_batch_size"]),
            lr_decay=sa_cfg["lr_decay"], key=jax.random.PRNGKey(5),
            variant=str(sarah_tuned.get("variant", "sarah")),
        )
        sa_psnrs = np.atleast_1d(np.asarray(sa_out["final_psnr"]))
        if sa_reps > 1:
            sa_ssims = np.asarray(ssim_batch(prs.x, sa_out["image"]))
        else:
            sa_ssims = np.atleast_1d(np.asarray(ssim(prs.x, sa_out["image"])))
        sa_psnr, sa_ssim = float(sa_psnrs.mean()), float(sa_ssims.mean())
        record["pr_sarah_realsn_psnr_db"] = round(sa_psnr, 2)
        record["pr_sarah_realsn_min_psnr_db"] = round(float(sa_psnrs.min()), 2)
        record["pr_sarah_realsn_ssim"] = round(sa_ssim, 4)
        record["pr_sarah_realsn_replicas"] = sa_reps
        print(
            f"bench quality: PR+SARAH+RealSN-DnCNN (BASELINE configs[3]) "
            f"replica-mean {sa_psnr:.2f} dB min {sa_psnrs.min():.2f} dB "
            f"SSIM {sa_ssim:.3f} over {sa_reps} minibatch-key streams "
            f"(no recorded upstream number)",
            file=sys.stderr,
        )

    # ---- Deblur + BM3D lane (reference deblur notebook config, no saved
    # outputs upstream — this pins our own quality + throughput numbers).
    # Hyperparameters from examples/tune_deblur.py (data/deblur_tuned.json);
    # falls back to a known-good hand config. Honors BENCH_OUTER.
    if have_time("deblur_bm3d"):
        db_cfg = {"eta": 2e9, "lr_decay": 0.6, "sigma_modifier": 1.0,
                  "n_outer": 4, "t2": 6, "mini_batch_size": 5000}
        db_tuned = _load_json(DEBLUR_TUNED_JSON)
        if db_tuned:
            db_cfg.update({k: v for k, v in db_tuned.items() if k in db_cfg})
        db_outer = min(int(db_cfg["n_outer"]), n_outer) if "BENCH_OUTER" in os.environ else int(db_cfg["n_outer"])
        db_t2 = int(db_cfg["t2"])
        note(f"Deblur+BM3D lane (256^2, n_outer={db_outer}, compiling if "
             f"cache cold)")
        img01 = jnp.asarray(
            load_image(resolve_data_path("Set12/01.png"), 256, 256)
        )
        dprob = make_deblur(
            jax.random.PRNGKey(0), img01, kernel="Minimal", scale_percent=100,
            snr=5,
        )
        # The operating point travels with the tuned config (the stride
        # knobs need their own tuned eta/mod — see CLAUDE.md).
        den_db = BM3DDenoiser(
            sigma_modifier=db_cfg["sigma_modifier"],
            params=BM3DParams(
                search=8,
                search_step=int((db_tuned or {}).get("search_step", 1)),
                matcher=str((db_tuned or {}).get("matcher", "xla")),
                match_dtype=str((db_tuned or {}).get("match_dtype", "float32")),
            ),
        )

        def run_deblur(key):
            return pnp_svrg(
                dprob, den_db, eta=db_cfg["eta"], n_outer=db_outer, t2=db_t2,
                mini_batch_size=int(db_cfg["mini_batch_size"]),
                lr_decay=db_cfg["lr_decay"], key=key,
            )

        db_out = run_deblur(jax.random.PRNGKey(1))
        _sync(db_out["final_psnr"])
        t0 = time.time()
        db_out = run_deblur(jax.random.PRNGKey(2))
        _sync(db_out["final_psnr"])
        db_steady = time.time() - t0
        db_iters = db_outer * (db_t2 + 1)
        db_psnr = float(np.asarray(db_out["final_psnr"]))
        db_ssim = float(np.asarray(ssim(dprob.x, db_out["image"])))
        db_its_per_sec = db_iters / db_steady
        record["deblur_bm3d_psnr_db"] = round(db_psnr, 2)
        record["deblur_bm3d_ssim"] = round(db_ssim, 4)
        record["deblur_iters_per_sec"] = round(db_its_per_sec, 2)
        print(
            f"bench quality: Deblur+BM3D (Set12/01 256^2, Minimal kernel, "
            f"SNR 5) {db_psnr:.2f} dB SSIM {db_ssim:.3f}, "
            f"{db_its_per_sec:.0f} it/s "
            f"(reference saved no outputs for this experiment)",
            file=sys.stderr,
        )

    # ---- Deblur-SR + BM3D lane (BASELINE configs[2]: the 25x25 blur kernel
    # image data/kernel25.png + scale_percent=50 bilinear downsampling at
    # SNR 20 — the reference sweep scripts' SR setting,
    # ``script_diff_sampratio_set12.py:46`` + ``DeblurSR.py:95-108``).
    # Exercises the bilinear gather / scatter-add adjoint operator pair
    # end-to-end (ops/resize.py), not just in adjointness tests. Tuned via
    # ``examples/tune_deblur.py --kernel kernel25.png --scale 50 --snr 20``
    # (data/deblur_sr_tuned.json).
    # NOTE the eta scale: kernel25.png loads as raw uint8 pixel values
    # scaled only by 1/N (reference DeblurSR.py:72-75,93), so the blur
    # operator norm is ~10 decades above the "Minimal" kernel's — measured
    # Hessian spectral norms L~1.5 (kernel25/SR) vs L~2.3e-10 (Minimal),
    # hence eta ~1 here vs ~4e9 above.
    if have_time("deblur_sr_bm3d"):
        sr_cfg = {"eta": 1.2, "lr_decay": 1.0, "sigma_modifier": 12.0,
                  "n_outer": 24, "t2": 10, "mini_batch_size": 5000}
        sr_tuned = _load_json(os.path.join(DATA, "deblur_sr_tuned.json"))
        if sr_tuned:
            sr_cfg.update({k: v for k, v in sr_tuned.items() if k in sr_cfg})
        sr_outer = min(int(sr_cfg["n_outer"]), n_outer) if "BENCH_OUTER" in os.environ else int(sr_cfg["n_outer"])
        sr_t2 = int(sr_cfg["t2"])
        note(f"Deblur-SR+BM3D lane (256^2 -> 128^2, kernel25, "
             f"n_outer={sr_outer}, compiling if cache cold)")
        img01_sr = jnp.asarray(
            load_image(resolve_data_path("Set12/01.png"), 256, 256)
        )
        sprob = make_deblur(
            jax.random.PRNGKey(0), img01_sr,
            kernel=str(resolve_data_path("kernel25.png")),
            scale_percent=50, snr=20,
        )
        den_sr = BM3DDenoiser(
            sigma_modifier=sr_cfg["sigma_modifier"],
            params=BM3DParams(
                search=8,
                search_step=int((sr_tuned or {}).get("search_step", 1)),
                matcher=str((sr_tuned or {}).get("matcher", "xla")),
                match_dtype=str((sr_tuned or {}).get("match_dtype", "float32")),
            ),
        )
        sr_out = pnp_svrg(
            sprob, den_sr, eta=sr_cfg["eta"], n_outer=sr_outer, t2=sr_t2,
            mini_batch_size=int(sr_cfg["mini_batch_size"]),
            lr_decay=sr_cfg["lr_decay"], key=jax.random.PRNGKey(2),
        )
        sr_psnr = float(np.asarray(sr_out["final_psnr"]))
        sr_ssim = float(np.asarray(ssim(sprob.x, sr_out["image"])))
        record["deblur_sr_psnr_db"] = round(sr_psnr, 2)
        record["deblur_sr_ssim"] = round(sr_ssim, 4)
        print(
            f"bench quality: Deblur-SR+BM3D (Set12/01 256^2 -> 50% scale, "
            f"kernel25.png, SNR 20) {sr_psnr:.2f} dB SSIM {sr_ssim:.3f} "
            f"(reference saved no outputs for SR)",
            file=sys.stderr,
        )

    if skipped:
        record["skipped"] = skipped
    note(f"done ({len(skipped)} lanes skipped)")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
