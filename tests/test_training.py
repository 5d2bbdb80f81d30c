"""Training subsystem tests: patch pipeline fidelity, checkpoint config
guard, and a short end-to-end training run that actually reduces loss."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.training import (
    TrainConfig,
    train,
    save_checkpoint,
    load_checkpoint,
    ConfigMismatch,
)
from pnp_svrg_tpu.training.data import (
    im2patch,
    augment,
    build_patch_dataset,
    batches,
    REFERENCE_TRAIN_DIR,
)

have_ref_data = REFERENCE_TRAIN_DIR.exists()


class TestPatchPipeline:
    def test_im2patch_counts_and_content(self, rng):
        img = rng.uniform(0, 1, (60, 50)).astype(np.float32)
        ps = im2patch(img, patch=40, stride=10)
        assert ps.shape == (3 * 2, 40, 40)
        np.testing.assert_array_equal(ps[0], img[:40, :40])
        np.testing.assert_array_equal(ps[-1], img[20:60, 10:50])

    def test_augment_modes_are_bijective(self, rng):
        p = rng.uniform(0, 1, (8, 8)).astype(np.float32)
        outs = [augment(p, m) for m in range(8)]
        # All 8 variants distinct for a generic patch, same multiset of pixels.
        for i in range(8):
            np.testing.assert_allclose(np.sort(outs[i].ravel()), np.sort(p.ravel()))
        assert len({o.tobytes() for o in outs}) == 8
        with pytest.raises(ValueError):
            augment(p, 8)

    def test_batches_noise_model(self, rng, tmp_path):
        patches = rng.uniform(0, 1, (300, 40, 40)).astype(np.float32)
        got = list(batches(patches, 64, 25 / 255.0, seed=0))
        assert len(got) == 4  # drop_last
        noisy, noise = got[0]
        assert noisy.shape == (64, 40, 40, 1)
        est = np.std(noise)
        assert abs(est - 25 / 255.0) / (25 / 255.0) < 0.1
        # blind mode: per-sample sigmas differ
        noisy_b, noise_b = next(iter(batches(patches, 64, (0.0, 55 / 255.0), seed=0)))
        per_sample = noise_b.reshape(64, -1).std(axis=1)
        assert per_sample.std() > 0.01

    @pytest.mark.skipif(not have_ref_data, reason="reference data not mounted")
    def test_build_dataset_from_reference(self):
        ps = build_patch_dataset(max_images=2)
        assert ps.ndim == 3 and ps.shape[1:] == (40, 40)
        assert len(ps) > 100
        assert 0.0 <= ps.min() and ps.max() <= 1.0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {
            "variables": {"params": {"Conv_0": {"kernel": np.ones((3, 3, 1, 4))}}},
            "epoch": 3,
        }
        cfg = {"depth": 17, "lr": 1e-3}
        save_checkpoint(tmp_path / "exp", state, cfg)
        loaded = load_checkpoint(tmp_path / "exp", cfg)
        assert loaded["epoch"] == 3
        np.testing.assert_array_equal(
            loaded["variables"]["params"]["Conv_0"]["kernel"],
            state["variables"]["params"]["Conv_0"]["kernel"],
        )

    def test_config_guard(self, tmp_path):
        save_checkpoint(tmp_path / "exp", {"epoch": 1}, {"depth": 17})
        with pytest.raises(ConfigMismatch):
            save_checkpoint(tmp_path / "exp", {"epoch": 2}, {"depth": 20})
        with pytest.raises(ConfigMismatch):
            load_checkpoint(tmp_path / "exp", {"depth": 20})

    def test_missing_returns_none(self, tmp_path):
        assert load_checkpoint(tmp_path / "nope") is None


@pytest.mark.skipif(not have_ref_data, reason="reference data not mounted")
class TestTrainEndToEnd:
    def test_short_run_reduces_loss_and_resumes(self, tmp_path):
        cfg = TrainConfig(
            depth=3, features=8, use_bn=False, lip=0.0, batch_size=16,
            epochs=2, milestone=1, lr=1e-3, noise_level=25.0,
        )
        exp = tmp_path / "exp"
        _, hist = train(
            cfg, exp, max_images=1, max_steps_per_epoch=8, verbose=False,
        )
        assert len(hist) == 2
        assert np.isfinite(hist[-1]["train_loss"])
        assert hist[1]["lr"] == cfg.lr / 10  # milestone decay applied
        assert (exp / "scalars.jsonl").exists()
        lines = (exp / "scalars.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2 and json.loads(lines[0])["epoch"] == 0
        # Resume: nothing left to do (epochs already reached), state loads.
        _, hist2 = train(
            cfg, exp, max_images=1, max_steps_per_epoch=8, verbose=False,
        )
        assert hist2 == []

    def test_realsn_training_beats_zero_predictor(self):
        """Regression for the round-3 collapse: with the spectral-norm
        constraint active (lip>0, BN on), training must beat the
        zero-residual predictor, whose loss is exactly
        ``HW sigma^2 / 2``. Both failure modes — post-step projection
        (multiplicative shrinkage compounding into the weights) and a BN
        clamp at 1.0 (BN forbidden from re-amplifying SN-shrunk
        activations) — pinned the loss AT the zero-predictor value."""
        import jax
        import optax

        from pnp_svrg_tpu.models.dncnn import DnCNN
        from pnp_svrg_tpu.models.spectral_norm import init_u
        from pnp_svrg_tpu.training.train_dncnn import TrainConfig, make_train_step

        sigma = 50.0
        cfg = TrainConfig(depth=3, features=8, use_bn=True, lip=0.5,
                          noise_level=sigma, batch_size=16, sn_probe_hw=16)
        model = DnCNN(channels=1, depth=3, features=8, use_bn=True)
        key = jax.random.PRNGKey(0)
        variables = dict(model.init(key, jnp.zeros((1, 16, 16, 1)), train=False))
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)
        opt_state = tx.init(variables["params"])
        u_state = {
            n: init_u(jax.random.fold_in(key, i), l["kernel"].shape[-1], hw=16)
            for i, (n, l) in enumerate(variables["params"].items())
            if n.startswith("Conv_")
        }
        step = make_train_step(model, tx, cfg)
        rng = np.random.default_rng(0)
        xx, yy = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
        pool = np.stack([
            np.sin(5 * xx + p) * np.cos(4 * yy + q) * 0.4 + 0.5
            for p in np.linspace(0, 3, 16) for q in np.linspace(0, 3, 16)
        ])
        losses = []
        for _ in range(200):
            sel = rng.integers(0, len(pool), 16)
            clean = pool[sel][..., None].astype(np.float32)
            noise = (sigma / 255.0 * rng.standard_normal(clean.shape)).astype(
                np.float32
            )
            variables, opt_state, u_state, loss = step(
                variables, opt_state, u_state,
                jnp.asarray(clean + noise), jnp.asarray(noise),
            )
            losses.append(float(loss))
        zero_pred = 16 * 16 * (sigma / 255.0) ** 2 / 2
        # The dead-model failure sits AT zero_pred; a learning model is
        # far below it (measured ~1.1 vs 4.9 at this budget).
        assert np.mean(losses[-10:]) < 0.6 * zero_pred, (
            np.mean(losses[-10:]), zero_pred,
        )

    def test_realsn_constraint_bounds_sigma(self, tmp_path):
        from pnp_svrg_tpu.models.spectral_norm import conv_power_iteration, init_u
        import jax

        cfg = TrainConfig(
            depth=3, features=8, use_bn=False, lip=1.0, batch_size=16,
            epochs=1, lr=1e-3, noise_level=25.0, sn_iters=5,
        )
        variables, _ = train(
            cfg, tmp_path / "exp_sn", max_images=1, max_steps_per_epoch=5,
            verbose=False,
        )
        target = 1.0 ** (1 / 3)
        for i, (name, layer) in enumerate(variables["params"].items()):
            if not name.startswith("Conv_"):
                continue
            u = init_u(jax.random.PRNGKey(i), layer["kernel"].shape[-1], hw=16)
            sigma, _ = conv_power_iteration(layer["kernel"], u, n_iters=30)
            assert float(sigma) < target * 1.2, (name, float(sigma))


class TestNative:
    """Native C++ patch pipeline vs the numpy fallback (exact for the
    deterministic kernels, statistical for the noise generator)."""

    def setup_method(self):
        from pnp_svrg_tpu import native

        if not native.available():
            pytest.skip("native library not built")

    def test_extract_matches_numpy(self, rng):
        from pnp_svrg_tpu import native

        img = rng.uniform(0, 1, (57, 49)).astype(np.float32)
        ours = native.extract_patches(img, 40, 10)
        ref = im2patch(img, 40, 10)
        np.testing.assert_array_equal(ours, ref)

    def test_augment_matches_numpy(self, rng):
        from pnp_svrg_tpu import native

        ps = rng.uniform(0, 1, (16, 40, 40)).astype(np.float32)
        modes = np.arange(16, dtype=np.uint8) % 8
        ours = native.augment_patches(ps, modes)
        ref = np.stack([augment(q, int(m)) for q, m in zip(ps, modes)])
        np.testing.assert_array_equal(ours, ref)

    def test_noise_statistics(self, rng):
        from pnp_svrg_tpu import native

        ps = rng.uniform(0, 1, (64, 40, 40)).astype(np.float32)
        idx = np.arange(64)
        noisy, noise = native.assemble_noisy_batch(ps, idx, 0.1, 0.1, seed=7)
        assert noisy.shape == (64, 40, 40, 1)
        np.testing.assert_allclose(noisy[..., 0] - noise[..., 0], ps, atol=1e-6)
        est = noise.std()
        assert abs(est - 0.1) / 0.1 < 0.05
        assert abs(noise.mean()) < 0.005
        # blind mode: per-sample sigma varies
        _, nb = native.assemble_noisy_batch(ps, idx, 0.0, 0.2, seed=7)
        per = nb.reshape(64, -1).std(axis=1)
        assert per.std() > 0.02

    def test_deterministic_given_seed(self, rng):
        from pnp_svrg_tpu import native

        ps = rng.uniform(0, 1, (8, 40, 40)).astype(np.float32)
        idx = np.arange(8)
        a = native.assemble_noisy_batch(ps, idx, 0.1, 0.1, seed=3)
        b = native.assemble_noisy_batch(ps, idx, 0.1, 0.1, seed=3)
        np.testing.assert_array_equal(a[0], b[0])


def test_adaptive_per_layer_sigma_targets():
    """The reference's adaptive SN option (SimpleCNN_models.py:18-22): an
    explicit per-layer sigma list replaces the uniform lip^(1/L) recipe."""
    import jax
    import jax.numpy as jnp

    from pnp_svrg_tpu.models.dncnn import DnCNN
    from pnp_svrg_tpu.models.spectral_norm import (
        conv_power_iteration,
        init_u,
        realsn_targets,
    )
    from pnp_svrg_tpu.training.train_dncnn import TrainConfig, effective_variables

    assert realsn_targets(0.3, 2) == (0.3 ** 0.5,) * 2
    with pytest.raises(ValueError):
        realsn_targets(0.3, 4, adaptive=(1.0, 0.5))

    sigmas = (2.0, 1.0, 0.25)
    cfg = TrainConfig(depth=3, features=8, use_bn=False, lip=1.0,
                      adaptive_sigmas=sigmas, sn_probe_hw=16, sn_iters=25)
    model = DnCNN(channels=1, depth=3, features=8, use_bn=False)
    key = jax.random.PRNGKey(0)
    variables = dict(model.init(key, jnp.zeros((1, 16, 16, 1)), train=False))
    u_state = {
        name: init_u(jax.random.fold_in(key, i), layer["kernel"].shape[-1], hw=16)
        for i, (name, layer) in enumerate(variables["params"].items())
        if name.startswith("Conv_")
    }
    eff = effective_variables(variables, u_state, cfg, n_iters=25)
    for i, (name, layer) in enumerate(sorted(eff["params"].items())):
        u = init_u(jax.random.fold_in(key, 100 + i), layer["kernel"].shape[-1], hw=16)
        sig, _ = conv_power_iteration(layer["kernel"], u, n_iters=30)
        assert abs(float(sig) - sigmas[i]) / sigmas[i] < 0.05, (name, float(sig))
