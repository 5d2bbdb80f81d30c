"""CNN denoiser tests: converted checkpoints load and denoise, spectral
normalization estimates true operator norms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_svrg_tpu.denoisers.dncnn import (
    DnCNNDenoiser,
    MMODenoiser,
    load_denoiser_params,
    CHECKPOINT_DIR,
)
from pnp_svrg_tpu.models.dncnn import DnCNN, MMOSimpleCNN, model_for_type
from pnp_svrg_tpu.models.spectral_norm import (
    conv_power_iteration,
    spectrally_normalize_kernel,
    bn_spectral_clamp,
    realsn_target,
    init_u,
)

needs_ckpt = pytest.mark.skipif(
    not (CHECKPOINT_DIR / "dncnn_noise15.npz").exists(),
    reason="converted checkpoints not present",
)


def _noisy_pair(rng, h=64, sigma=15 / 255):
    xx, yy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, h))
    clean = jnp.asarray(np.sin(5 * xx) * np.cos(4 * yy) * 0.3 + 0.5, jnp.float32)
    noisy = clean + sigma * jnp.asarray(rng.standard_normal((h, h)), jnp.float32)
    return clean, noisy


class TestModels:
    def test_dncnn_shapes(self, key):
        m = DnCNN(channels=1, depth=5)
        v = m.init(key, jnp.zeros((1, 32, 32, 1)))
        out = m.apply(v, jnp.zeros((2, 40, 40, 1)))
        assert out.shape == (2, 40, 40, 1)

    def test_mmo_residual_skip(self, key):
        # Zero-weight out conv -> output == input (residual skip).
        m = MMOSimpleCNN(channels=1, depth=3)
        v = m.init(key, jnp.zeros((1, 16, 16, 1)))
        v = jax.tree_util.tree_map(jnp.zeros_like, v)
        x = jnp.ones((1, 16, 16, 1)) * 0.3
        np.testing.assert_allclose(m.apply(v, x), x, atol=1e-7)

    def test_factory(self):
        assert model_for_type("DnCNN").depth == 17
        assert model_for_type("SimpleCNN").use_bn is False
        assert model_for_type("DnCNN_nobn").depth == 20
        with pytest.raises(ValueError):
            model_for_type("resnet")


@needs_ckpt
class TestPretrained:
    def test_dncnn_denoises(self, rng):
        clean, noisy = _noisy_pair(rng)
        den = DnCNNDenoiser.from_pretrained("DnCNN", 15)
        out = den.denoise(noisy)
        assert float(jnp.mean((out - clean) ** 2)) < 0.5 * float(
            jnp.mean((noisy - clean) ** 2)
        )

    def test_simplecnn_loads(self, rng):
        den = DnCNNDenoiser.from_pretrained("SimpleCNN", 15)
        den.model_type == "SimpleCNN"
        _, noisy = _noisy_pair(rng)
        out = den.denoise(noisy)
        assert out.shape == noisy.shape

    @pytest.mark.parametrize("model_type,sigma", [
        ("SimpleCNN", 15), ("RealSN_SimpleCNN", 5), ("RealSN_SimpleCNN", 15),
        ("RealSN_SimpleCNN", 40),
    ])
    def test_simplecnn_forward_matches_torch_replay(self, rng, model_type, sigma):
        """Converted-weight parity: the Flax forward on the converted .npz
        must match a torch-functional replay of the original .pth state dict
        (conv(pad=1, no bias) + ReLU x3, conv — the SimpleCNN topology,
        reference ``DeepDenoisers/model/SimpleCNN_models.py:6-33``)."""
        torch = pytest.importorskip("torch")
        from pnp_svrg_tpu.models.convert import (
            REFERENCE_ROOT, _load_torch_state_dict,
        )

        pth = (REFERENCE_ROOT / "denoisers/DeepDenoisers/Pretrained_models"
               / f"{model_type}_noise{sigma}.pth")
        if not pth.exists():
            pytest.skip(f"{pth} not present")
        sd = _load_torch_state_dict(pth)
        x = rng.standard_normal((1, 1, 24, 24)).astype(np.float32)

        with torch.no_grad():
            h = torch.as_tensor(x)
            idxs = sorted({int(k.split(".")[1]) for k in sd})
            for n, idx in enumerate(idxs):
                w = torch.as_tensor(np.asarray(sd[f"dncnn.{idx}.weight"]))
                h = torch.nn.functional.conv2d(h, w, padding=1)
                if n < len(idxs) - 1:
                    h = torch.nn.functional.relu(h)
            ref = h.numpy()

        den = DnCNNDenoiser.from_pretrained(model_type, sigma)
        model = model_for_type(model_type)
        out = model.apply(den.variables, jnp.asarray(x[0].transpose(1, 2, 0))[None])
        np.testing.assert_allclose(
            np.asarray(out)[0, ..., 0], ref[0, 0], rtol=1e-4, atol=1e-5
        )

    def test_realsn_simplecnn_end_to_end(self, key, rng):
        """A SimpleCNN-type converted checkpoint drives the full PnP loop."""
        from pnp_svrg_tpu.algorithms import pnp_gd
        from pnp_svrg_tpu.problems import make_csmri

        clean, _ = _noisy_pair(rng)
        prob = make_csmri(key, clean, sample_prob=0.5, snr=10)
        den = DnCNNDenoiser.from_pretrained("RealSN_SimpleCNN", 15)
        out = pnp_gd(prob, den, eta=100.0, n_iters=5)
        assert np.isfinite(np.asarray(out["psnr_per_iter"])).all()

    def test_mmo_denoises(self, rng):
        clean, noisy = _noisy_pair(rng, sigma=0.01)
        den = MMODenoiser.from_pretrained(channels=1, n_lev=0.01)
        out = den.denoise(noisy)
        assert out.shape == noisy.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_missing_checkpoint_raises(self):
        with pytest.raises(FileNotFoundError):
            load_denoiser_params("nonexistent_model")

    def test_in_pnp_loop(self, key, rng):
        # CNN denoiser inside the jitted scan loop end-to-end.
        from pnp_svrg_tpu.algorithms import pnp_gd
        from pnp_svrg_tpu.problems import make_csmri

        clean, _ = _noisy_pair(rng)
        prob = make_csmri(key, clean, sample_prob=0.5, snr=10)
        den = DnCNNDenoiser.from_pretrained("DnCNN", 15)
        out = pnp_gd(prob, den, eta=100.0, n_iters=5)
        assert np.isfinite(np.asarray(out["psnr_per_iter"])).all()


class TestSpectralNorm:
    def test_sigma_matches_dense_operator(self, key, rng):
        # Small domain: materialize the conv operator densely and compare
        # the power-iteration sigma against exact SVD.
        kh = kw = 3
        cin = cout = 2
        hw = 8
        kernel = jnp.asarray(
            rng.standard_normal((kh, kw, cin, cout)) * 0.5, jnp.float32
        )
        u = init_u(key, cout, hw=hw)
        sigma, _ = conv_power_iteration(kernel, u, n_iters=50)

        # Dense operator via jacobian of the conv on the same domain.
        from pnp_svrg_tpu.models.spectral_norm import _conv_same

        f = lambda v: _conv_same(v.reshape(1, hw, hw, cin), kernel).ravel()
        jac = jax.jacfwd(f)(jnp.zeros((hw * hw * cin,)))
        true_sigma = float(np.linalg.svd(np.asarray(jac), compute_uv=False)[0])
        assert abs(float(sigma) - true_sigma) / true_sigma < 0.05

    def test_normalized_kernel_hits_target(self, key, rng):
        kernel = jnp.asarray(rng.standard_normal((3, 3, 4, 4)), jnp.float32)
        u = init_u(key, 4, hw=16)
        k2, sigma, u = spectrally_normalize_kernel(kernel, u, target=0.5, n_iters=30)
        sigma2, _ = conv_power_iteration(k2, u, n_iters=30)
        assert abs(float(sigma2) - 0.5) < 0.05

    def test_realsn_target(self):
        assert abs(realsn_target(0.3, 17) - 0.3 ** (1 / 17)) < 1e-9

    def test_bn_clamp(self):
        scale = jnp.asarray([2.0, 0.5])
        bias = jnp.asarray([1.0, 1.0])
        var = jnp.asarray([1.0, 1.0])
        s2, b2 = bn_spectral_clamp(scale, bias, var, target=1.0)
        sigma_after = float(jnp.max(jnp.abs(s2) / jnp.sqrt(var + 1e-5)))
        assert sigma_after <= 1.0 + 1e-5
        # ratio preserved
        np.testing.assert_allclose(
            np.asarray(s2) / np.asarray(scale), np.asarray(b2) / np.asarray(bias)
        )

    def test_below_target_untouched(self):
        scale = jnp.asarray([0.5])
        bias = jnp.asarray([0.1])
        var = jnp.asarray([1.0])
        s2, b2 = bn_spectral_clamp(scale, bias, var, target=1.0)
        np.testing.assert_allclose(s2, scale)
        np.testing.assert_allclose(b2, bias)
