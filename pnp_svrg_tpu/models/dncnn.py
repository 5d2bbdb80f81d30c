"""DnCNN model family in Flax.

Native re-implementations of the reference's PyTorch model zoo (SURVEY.md
§2.4): the 17-layer batch-norm DnCNN residual-noise predictor (reference
``DeepDenoisers/model/models.py:5-22``), the SimpleCNN / per-layer-Lipschitz
variant (``DeepDenoisers/model/SimpleCNN_models.py:6-60``), and the MMO
``simple_CNN`` direct denoiser with residual skip
(``denoisers/MMODenoise.py:73-103``).

All modules take NHWC float32 inputs; weights converted from the reference's
.pth checkpoints via ``models/convert.py``. Convolutions are XLA convs —
MXU-tiled, fused with the surrounding elementwise ops.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class DnCNN(nn.Module):
    """DnCNN: Conv+ReLU, (depth-2) x [Conv(+BN)+ReLU], Conv.

    Predicts the *noise residual* (reference convention: ``x = noisy - r``).
    ``use_bn=False`` gives the SimpleCNN topology (conv/relu only).
    """

    channels: int = 1
    depth: int = 17
    features: int = 64
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(x)
        h = nn.relu(h)
        for _ in range(self.depth - 2):
            h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(h)
            if self.use_bn:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                )(h)
            h = nn.relu(h)
        return nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False)(h)


class MMOSimpleCNN(nn.Module):
    """The MMO denoiser network ("DnCNN_nobn"): depth-20 LeakyReLU CNN with
    bias and an input residual skip; returns the *denoised image* directly
    (reference ``MMODenoise.py:73-103``)."""

    channels: int = 1
    depth: int = 20
    features: int = 64

    @nn.compact
    def __call__(self, x_in: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=True)(x_in)
        h = nn.leaky_relu(h, negative_slope=0.01)
        for _ in range(self.depth - 2):
            h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=True)(h)
            h = nn.leaky_relu(h, negative_slope=0.01)
        out = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=True)(h)
        return out + x_in


def model_for_type(model_type: str, channels: int = 1) -> nn.Module:
    """Factory keyed like the reference's ``load_model`` (reference
    ``DeepDenoisers/utils/utils.py:10-33``)."""
    if model_type in ("DnCNN", "RealSN_DnCNN"):
        return DnCNN(channels=channels, depth=17, use_bn=True)
    if model_type in ("SimpleCNN", "RealSN_SimpleCNN"):
        return DnCNN(channels=channels, depth=4, use_bn=False)
    if model_type == "DnCNN_nobn":
        return MMOSimpleCNN(channels=channels, depth=20)
    raise ValueError(f"unknown model type {model_type!r}")
