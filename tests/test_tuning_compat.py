"""Tests for the TPE tuner, sweep runner, and reference-compat wall-clock API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.denoisers import TVDenoiser
from pnp_svrg_tpu.problems import make_csmri
from pnp_svrg_tpu.tuning import fmin, Uniform, LogUniform, QUniform, Choice
from pnp_svrg_tpu.tuning.sweep import sweep_grid, default_space
from pnp_svrg_tpu.algorithms import compat


def _problem(key=None, h=32):
    key = key or jax.random.PRNGKey(0)
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    img = jnp.asarray(np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5, jnp.float32)
    return make_csmri(key, img, sample_prob=0.5, snr=10)


class TestTPE:
    def test_minimizes_quadratic(self):
        best, trials = fmin(
            lambda p: (p["x"] - 0.3) ** 2 + (p["y"] - 2.0) ** 2,
            {"x": Uniform(0, 1), "y": Uniform(0, 5)},
            max_evals=60,
            seed=0,
        )
        assert abs(best["x"] - 0.3) < 0.15
        assert abs(best["y"] - 2.0) < 0.8

    def test_loguniform_handles_scale(self):
        best, _ = fmin(
            lambda p: abs(np.log10(p["eta"]) - 2.0),
            {"eta": LogUniform(1e-3, 1e5)},
            max_evals=50,
            seed=1,
        )
        assert 10 < best["eta"] < 1000

    def test_quniform_is_integer(self):
        best, trials = fmin(
            lambda p: abs(p["n"] - 7),
            {"n": QUniform(1, 20, 1)},
            max_evals=30,
            seed=0,
        )
        assert all(isinstance(t.params["n"], int) for t in trials.trials)
        assert best["n"] == 7

    def test_choice_sampling(self):
        best, _ = fmin(
            lambda p: 0.0 if p["c"] == "b" else 1.0,
            {"c": Choice(["a", "b", "c"])},
            max_evals=30,
            seed=0,
        )
        assert best["c"] == "b"

    def test_dict_objective(self):
        _, trials = fmin(
            lambda p: {"loss": p["x"], "aux": 42},
            {"x": Uniform(0, 1)},
            max_evals=5,
        )
        assert trials.best.extra["aux"] == 42


class TestSweep:
    def test_single_cell_improves(self, tmp_path):
        prob = _problem()
        cells = [
            {
                "problem": prob,
                "algo": "gd",
                "denoiser_factory": lambda d: TVDenoiser(sigma_modifier=d),
                "problem_name": "csmri",
                "denoiser_name": "tv",
                "image": "synthetic",
                "ratio": 0.5,
                "snr": 10,
            }
        ]
        out = sweep_grid(
            cells, max_evals=6, n_iters=15,
            csv_path=tmp_path / "sweep.csv", verbose=False,
        )
        assert len(out) == 1
        assert out[0].best_loss < 0  # PSNR improved over init
        assert (tmp_path / "sweep.csv").exists()
        text = (tmp_path / "sweep.csv").read_text()
        assert "csmri" in text and "tv" in text

    def test_lockstep_grid_improves_and_shares_statics(self, tmp_path):
        """sweep_grid_lockstep: per-cell searches improve on init, statics
        are shared within each group's final configs' key set, and the CSV
        checkpoint lands."""
        from pnp_svrg_tpu.tuning.sweep import sweep_grid_lockstep
        from pnp_svrg_tpu.tuning.tpe import LogUniform, Uniform, Choice

        import jax

        probs = [_problem(), _problem()]
        space = {
            "eta": LogUniform(1.0, 500.0),
            "dstrength": Uniform(0.3, 2.0),
            "mini_batch_size": Choice([64, 128]),
            "t2": Choice([2, 3]),
        }
        cells = [
            {
                "problem": p,
                "algo": "svrg",
                "denoiser_factory": lambda d: TVDenoiser(sigma_modifier=d),
                "problem_name": "csmri",
                "denoiser_name": "tv",
                "image": f"img{i}",
                "ratio": 0.5,
                "snr": 10,
                "seed": i,
                "space": space,
            }
            for i, p in enumerate(probs)
        ]
        out = sweep_grid_lockstep(
            cells, max_evals=4, n_iters=10, cand_per_round=2,
            csv_path=tmp_path / "lockstep.csv", verbose=False,
        )
        assert len(out) == 2
        for rec in out:
            assert np.isfinite(rec.best_loss)
            assert rec.best_params["mini_batch_size"] in (64, 128)
            assert rec.best_params["t2"] in (2, 3)
        assert min(r.best_loss for r in out) < 1.0  # at least one improves
        text = (tmp_path / "lockstep.csv").read_text()
        assert "img0" in text and "img1" in text

    def test_default_spaces(self):
        s = default_space("svrg", 1024)
        assert set(s) == {"eta", "dstrength", "mini_batch_size", "t2"}
        assert set(default_space("gd", 1024)) == {"eta", "dstrength"}
        assert "hist_size" in default_space("saga", 1024)


class TestCompat:
    def test_gd_reference_dict_shape(self):
        prob = _problem()
        den = TVDenoiser(sigma_modifier=0.7)
        out = compat.pnp_gd(prob, den, eta=100.0, tt=3.0, converge_check=False)
        assert set(out) == {
            "z", "time_per_iter", "psnr_per_iter", "gradient_time",
            "denoise_time", "algo_name",
        }
        assert out["algo_name"] == "PnP GD"
        assert len(out["time_per_iter"]) == len(out["psnr_per_iter"])
        assert out["gradient_time"] > 0 and out["denoise_time"] > 0
        # PSNRs rounded to 2 decimals like the reference.
        for p in out["psnr_per_iter"]:
            assert abs(p - round(p, 2)) < 1e-9
        assert out["psnr_per_iter"][-1] > out["psnr_per_iter"][0]

    def test_svrg_runs_and_improves(self):
        prob = _problem()
        den = TVDenoiser(sigma_modifier=0.7)
        out = compat.pnp_svrg(
            prob, den, eta=100.0, tt=3.0, T2=5, mini_batch_size=100,
            converge_check=False,
        )
        assert out["psnr_per_iter"][-1] > out["psnr_per_iter"][0]

    @pytest.mark.parametrize("fn,extra", [
        (compat.pnp_sgd, dict(mini_batch_size=100)),
        (compat.pnp_saga, dict(mini_batch_size=100, hist_size=5)),
        (compat.pnp_sarah, dict(T2=4, mini_batch_size=100)),
    ])
    def test_stochastic_variants_run(self, fn, extra):
        prob = _problem()
        den = TVDenoiser(sigma_modifier=0.7)
        out = fn(prob, den, eta=50.0, tt=2.0, converge_check=False, **extra)
        assert len(out["psnr_per_iter"]) > 1
        assert np.isfinite(out["psnr_per_iter"]).all()

    def test_wallclock_budget_respected(self):
        prob = _problem()
        den = TVDenoiser(sigma_modifier=0.7)
        import time

        t0 = time.time()
        compat.pnp_gd(prob, den, eta=100.0, tt=1.5, converge_check=False)
        # Budget + at most one straggler iteration (compile excluded is
        # impossible here, so allow generous slack for the first jit).
        assert time.time() - t0 < 60

    def test_tuner_adapter(self):
        prob = _problem()
        den = TVDenoiser()
        out = compat.tune_pnp_gd(
            (100.0, 0.7), prob, den, tt=2.0,
            converge_check=False, diverge_check=True,
        )
        assert "loss" in out and out["status"] == "ok"
        assert out["loss"] < 0  # improvement => negative loss


class TestBatchedTrials:
    """fmin(batch_size=...) + make_batched_cell_objective: C TPE candidates
    evaluated as one batched TPU run."""

    def test_fmin_batch_quadratic(self):
        from pnp_svrg_tpu.tuning import fmin, Uniform

        calls = []

        def batch_obj(params_list):
            calls.append(len(params_list))
            return [(p["x"] - 0.3) ** 2 for p in params_list]

        best, trials = fmin(
            None, {"x": Uniform(0, 1)}, max_evals=24, seed=0,
            batch_size=4, batch_objective=batch_obj,
        )
        assert len(trials) == 24
        assert max(calls) <= 4 and sum(calls) == 24
        assert abs(best["x"] - 0.3) < 0.15

    def test_batched_cell_matches_sequential(self, key=None):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pnp_svrg_tpu.denoisers import TVDenoiser
        from pnp_svrg_tpu.problems import make_csmri
        from pnp_svrg_tpu.tuning.sweep import (
            make_batched_cell_objective,
            make_cell_objective,
        )

        xx, yy = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
        img = jnp.asarray(np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5, jnp.float32)
        prob = make_csmri(jax.random.PRNGKey(0), img, sample_prob=0.5, snr=10)
        factory = lambda d: TVDenoiser(sigma_modifier=d)
        # GD is deterministic, so per-lane batched evaluation must match the
        # sequential objective exactly (stochastic algos draw per-lane
        # minibatch keys and only agree in distribution).
        params = [
            {"eta": 50.0, "dstrength": 0.7},
            {"eta": 120.0, "dstrength": 1.1},
        ]
        batched = make_batched_cell_objective("gd", prob, factory, n_iters=8)
        seq = make_cell_objective("gd", prob, factory, n_iters=8)
        outs_b = batched(params)
        outs_s = [seq(p) for p in params]
        for b, s in zip(outs_b, outs_s):
            np.testing.assert_allclose(b["loss"], s["loss"], atol=1e-3)

    def test_sweep_grid_trial_batch(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pnp_svrg_tpu.denoisers import TVDenoiser
        from pnp_svrg_tpu.problems import make_csmri
        from pnp_svrg_tpu.tuning.sweep import sweep_grid

        xx, yy = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
        img = jnp.asarray(np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5, jnp.float32)
        prob = make_csmri(jax.random.PRNGKey(0), img, sample_prob=0.5, snr=10)
        cells = [{
            "problem": prob, "algo": "gd",
            "denoiser_factory": lambda d: TVDenoiser(sigma_modifier=d),
            "problem_name": "csmri", "denoiser_name": "tv",
            "image": "synthetic", "ratio": 0.5, "snr": 10.0,
        }]
        res = sweep_grid(cells, max_evals=8, n_iters=5, trial_batch=4,
                         csv_path=tmp_path / "b.csv", verbose=False)
        assert len(res) == 1 and np.isfinite(res[0].best_loss)


class TestBenchTuners:
    """The examples/ bench tuners, driven end-to-end at toy sizes."""

    def test_tune_pr_replica_mean(self, tmp_path):
        """--replicas R: each config occupies R adjacent batch lanes
        (distinct fold_in(key, lane) minibatch streams) and is scored by
        the replica MEAN — the seed-robust quantity the bench SARAH lane
        certifies (data/pr_sarah_realsn_tuned.json)."""
        import json
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        out = tmp_path / "pr_tuned.json"
        proc = subprocess.run(
            [sys.executable, str(repo / "examples" / "tune_pr.py"),
             "--cpu", "--size", "32", "--num-meas", "128",
             "--etas", "0.05", "0.1", "--decays", "1.0",
             "--outers", "2", "--t2", "2", "--mb", "32",
             "--chunk", "4", "--replicas", "2",
             "--out", str(out)],
            capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rec = json.loads(out.read_text())
        assert rec["replicas"] == 2
        assert rec["provenance"]["replicas"] == 2
        assert np.isfinite(rec["psnr_db"])
        assert rec["eta"] in (0.05, 0.1)

    def test_summarize_sweep_table(self, tmp_path, capsys):
        """tools/summarize_sweep.py renders the per-cell mean table from a
        CSV with best_psnr columns (no init recomputation needed)."""
        import importlib.util
        from pathlib import Path

        csv_path = tmp_path / "s.csv"
        csv_path.write_text(
            "problem,denoiser,algorithm,ratio,snr,image,best_loss,best_psnr,"
            "best_params\n"
            "csmri,tv,gd,0.5,20.0,01.png,-2.0,22.0,{}\n"
            "csmri,tv,gd,0.5,20.0,02.png,-3.0,24.0,{}\n"
            "csmri,tv,gd,0.8,20.0,01.png,-4.0,28.0,{}\n"
        )
        repo = Path(__file__).resolve().parents[1]
        spec = importlib.util.spec_from_file_location(
            "summarize_sweep", repo / "tools" / "summarize_sweep.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main([str(csv_path)])
        out = capsys.readouterr().out
        assert "| csmri | tv | gd | 23.00 | 28.00 |" in out

    def test_sweep_sampratio_all_problem_factories(self, tmp_path):
        """The sweep example's three problem factories (reference get_problem
        parity: CSMRI / DeblurSR / PR) each run a tiny lockstep search
        end-to-end and land in one CSV."""
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        out = tmp_path / "sweep.csv"
        proc = subprocess.run(
            [sys.executable, str(repo / "examples" / "sweep_sampratio.py"),
             "--cpu", "--problems", "csmri", "deblur", "pr",
             "--images", "1", "--size", "32", "--ratios", "0.5",
             "--algos", "svrg", "--denoisers", "tv",
             "--max-evals", "2", "--cand", "2", "--n-iters", "6",
             "--out", str(out)],
            capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        text = out.read_text()
        for name in ("csmri", "deblur", "pr"):
            assert f"\n{name}," in text or text.startswith(f"{name},"), name

    def test_tune_pr_chunk_not_multiple_of_replicas(self):
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        proc = subprocess.run(
            [sys.executable, str(repo / "examples" / "tune_pr.py"),
             "--cpu", "--chunk", "3", "--replicas", "2"],
            capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode != 0
        assert "multiple of" in proc.stderr
