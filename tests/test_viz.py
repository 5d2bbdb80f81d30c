"""Viz/reporting tests (headless matplotlib)."""

import numpy as np
import jax

from pnp_svrg_tpu.algorithms import pnp_gd
from pnp_svrg_tpu.denoisers import TVDenoiser
from pnp_svrg_tpu.problems import make_csmri
from pnp_svrg_tpu.utils.viz import (
    summarize_results,
    write_metrics_csv,
    display_results,
    show_grid,
)
import jax.numpy as jnp


def _run(key):
    xx, yy = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
    img = jnp.asarray(np.sin(4 * xx) * np.cos(3 * yy) * 0.4 + 0.5, jnp.float32)
    prob = make_csmri(key, img, sample_prob=0.5, snr=10)
    out = pnp_gd(prob, TVDenoiser(sigma_modifier=0.7), eta=100.0, n_iters=3)
    return prob, out


def test_summarize(key):
    prob, out = _run(key)
    s = summarize_results(prob, out)
    assert s["n_iters"] == 3
    assert s["delta_psnr"] == s["output_psnr"] - float(out["psnr_per_iter"][0])


def test_display_and_csv(key, tmp_path):
    prob, out = _run(key)
    s = display_results(prob, out, save_results=True, save_dir=tmp_path)
    pngs = list(tmp_path.rglob("*.png"))
    csvs = list(tmp_path.rglob("metrics.csv"))
    assert pngs and csvs
    text = csvs[0].read_text()
    assert "output_psnr" in text

    write_metrics_csv([s, s], tmp_path / "multi.csv")
    assert len((tmp_path / "multi.csv").read_text().strip().splitlines()) == 3


def test_show_grid(key):
    imgs = [np.zeros((8, 8)), np.ones((8, 8))]
    fig = show_grid(imgs, titles=["a", "b"], ncols=2)
    assert fig is not None


def test_gif_writes_animated_file(tmp_path):
    from pnp_svrg_tpu.utils.viz import gif

    frames = [np.full((8, 8), v, np.float32) for v in (0.1, 0.5, 0.9)]
    out = gif(frames, path=tmp_path / "anim.gif")
    assert out.exists() and out.stat().st_size > 0
    from PIL import Image

    with Image.open(out) as im:
        assert getattr(im, "n_frames", 1) == 3


def test_gif_html():
    from pnp_svrg_tpu.utils.viz import gif

    frames = [np.zeros((4, 4)), np.ones((4, 4))]
    html = gif(frames, html=True)
    assert isinstance(html, str) and "animation" in html.lower()


def test_reconstruct_rgb_improves_over_init():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pnp_svrg_tpu.denoisers import TVDenoiser
    from pnp_svrg_tpu.utils.viz import reconstruct_rgb

    rng = np.random.default_rng(0)
    base = np.clip(
        0.5 + 0.3 * np.sin(np.arange(32) / 3)[:, None, None]
        + 0.05 * rng.standard_normal((32, 32, 3)),
        0,
        1,
    )
    orig, init, recon = reconstruct_rgb(
        base, algo="svrg", denoiser=TVDenoiser(sigma_modifier=1.0),
        snr=30, eta=100.0, n_outer=3, t2=4, mini_batch_size=128,
    )
    assert orig.shape == init.shape == recon.shape == (32, 32, 3)
    mse_i = np.mean((init - orig) ** 2)
    mse_r = np.mean((recon - orig) ** 2)
    assert mse_r < mse_i


def test_plot_training_curves(tmp_path):
    """The training-dashboard replacement renders curves from a run's
    scalars.jsonl (reference live dashboard: cnn/cnn.py:175-246)."""
    import json

    from pnp_svrg_tpu.utils.viz import plot_training_curves

    jsonl = tmp_path / "scalars.jsonl"
    with open(jsonl, "w") as f:
        for e in range(3):
            f.write(json.dumps({
                "epoch": e, "lr": 1e-3 / (10 if e >= 2 else 1),
                "train_loss": 1.0 / (e + 1), "val_psnr": 30.0 + e,
                "val_ssim": 0.8 + 0.01 * e, "seconds": 10.0,
            }) + "\n")
    out = tmp_path / "curves.png"
    fig = plot_training_curves(jsonl, out_path=out)
    assert out.exists() and out.stat().st_size > 1000
    assert len(fig.axes) == 4
