"""CNN denoisers: DnCNN-family residual denoiser and the MMO direct denoiser.

Native replacements for the reference's torch-CUDA denoise step (reference
``denoisers/RealSN_DnCNN.py:16-42`` and ``denoisers/MMODenoise.py:105-128``).
The reference crosses host->GPU per call (SURVEY.md §3.4); here the model is
a Flax apply embedded in the same XLA program as the PnP loop — zero copies,
fused with the surrounding gradient step.

Weights come from ``checkpoints/*.npz`` (converted from the reference's .pth
files by ``models/convert.py``).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

import jax
import jax.numpy as jnp

from pnp_svrg_tpu.models.dncnn import DnCNN, MMOSimpleCNN, model_for_type
from pnp_svrg_tpu.models.convert import load_flax_npz

CHECKPOINT_DIR = Path(__file__).resolve().parents[2] / "checkpoints"


def load_denoiser_params(name: str) -> dict:
    """Load converted Flax variables by checkpoint name (see
    ``models/convert.CONVERSIONS``)."""
    path = CHECKPOINT_DIR / f"{name}.npz"
    if not path.exists():
        raise FileNotFoundError(
            f"{path} not found — run `python -m pnp_svrg_tpu.models.convert`"
        )
    return jax.tree_util.tree_map(jnp.asarray, load_flax_npz(path))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["variables", "sigma_train"],
    meta_fields=["model_type", "channels"],
)
@dataclasses.dataclass(frozen=True)
class DnCNNDenoiser:
    """Residual CNN denoiser with the reference's scale trick.

    Denoise step (reference ``RealSN_DnCNN.py:16-42``): min-max normalize,
    scale into ``[shift, shift + range]`` with ``range = 1 + sigma/255/2``,
    predict the noise residual, subtract, unscale. ``sigma_train`` is the
    noise level the checkpoint was trained for (the reference's
    ``self.sigma``).
    """

    variables: dict
    sigma_train: jnp.ndarray = 15.0
    model_type: str = "DnCNN"
    channels: int = 1

    @classmethod
    def from_pretrained(cls, model_type: str = "DnCNN", sigma: int = 15):
        name = f"{model_type.lower()}_noise{sigma}"
        return cls(
            variables=load_denoiser_params(name),
            sigma_train=jnp.asarray(float(sigma)),
            model_type=model_type,
        )

    def _model(self):
        return model_for_type(self.model_type, self.channels)

    def denoise(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray = 0.0, t: jnp.ndarray = 0
    ) -> jnp.ndarray:
        del sigma_est, t  # CNN denoisers use their training sigma (reference)
        squeeze = x.ndim == 2
        xb = x[None] if squeeze else x  # (B, H, W)
        lo = jnp.min(xb, axis=(-2, -1), keepdims=True)
        hi = jnp.max(xb, axis=(-2, -1), keepdims=True)
        xt = (xb - lo) / (hi - lo)
        scale_range = 1.0 + self.sigma_train / 255.0 / 2.0
        scale_shift = (1.0 - scale_range) / 2.0
        xt = xt * scale_range + scale_shift
        r = self._model().apply(self.variables, xt[..., None])[..., 0]
        out = xt - r
        out = (out - scale_shift) / scale_range
        out = out * (hi - lo) + lo
        return out[0] if squeeze else out


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["variables"],
    meta_fields=["channels"],
)
@dataclasses.dataclass(frozen=True)
class MMODenoiser:
    """MMO direct denoiser: clamp input to [0,1], apply the DnCNN_nobn net,
    clip the output (reference ``MMODenoise.py:18-40,124-128``)."""

    variables: dict
    channels: int = 1

    @classmethod
    def from_pretrained(cls, channels: int = 1, n_lev: float = 0.01):
        name = f"mmo_dncnn_nobn_nch{channels}_nlev{n_lev}"
        return cls(variables=load_denoiser_params(name), channels=channels)

    def denoise(
        self, x: jnp.ndarray, sigma_est: jnp.ndarray = 0.0, t: jnp.ndarray = 0
    ) -> jnp.ndarray:
        del sigma_est, t
        # Accepts (H, W) single, (B, H, W) grayscale batch, or (H, W, C).
        if x.ndim == 2:
            inp, restore = x[None, :, :, None], lambda o: o[0, :, :, 0]
        elif x.ndim == 3 and self.channels == 1:
            inp, restore = x[..., None], lambda o: o[..., 0]
        else:  # (H, W, C)
            inp, restore = x[None], lambda o: o[0]
        inp = jnp.clip(inp, 0.0, 1.0)
        out = MMOSimpleCNN(channels=self.channels).apply(self.variables, inp)
        return restore(jnp.clip(out, 0.0, 1.0))
