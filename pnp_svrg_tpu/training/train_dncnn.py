"""RealSN-DnCNN training in JAX/optax.

Native re-design of the reference training stack (reference
``DeepDenoisers/training/train_full_realsn.py:21-179`` and the
``denoisers/cnn/cnn.py`` harness): residual-MSE objective
``MSE(model(clean+noise), noise) / (2B)``, Adam 1e-3 with /10 LR drop at the
milestone epoch, fixed-sigma (mode S) or blind per-sample sigma (mode B)
noise, conv-space spectral-norm projection after every step (the RealSN
constraint), per-epoch Set12 validation PSNR/SSIM, config-guarded
checkpoint/resume, and JSONL scalar logging in place of tensorboardX.

The whole train step (loss, grads, Adam update, SN projection) is one jitted
function; data parallelism is a mesh ``batch`` axis via vmap/sharding on the
batch dimension.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pnp_svrg_tpu.models.dncnn import DnCNN
from pnp_svrg_tpu.models.spectral_norm import (
    init_u,
    power_iteration_uv,
    sigma_uv,
    bn_spectral_clamp,
    realsn_targets,
)
from pnp_svrg_tpu.ops.metrics import psnr, ssim
from pnp_svrg_tpu.training import data as data_lib
from pnp_svrg_tpu.training.checkpoint import save_checkpoint, load_checkpoint


@dataclasses.dataclass
class TrainConfig:
    depth: int = 17
    features: int = 64
    channels: int = 1
    use_bn: bool = True
    lip: float = 0.0  # 0 => no spectral constraint; >0 => RealSN product bound
    adaptive_sigmas: tuple | None = None  # explicit per-conv SN targets
    # (reference SimpleCNN_models.py:18-22 'adaptive'); length must == depth
    batch_size: int = 128
    epochs: int = 50
    milestone: int = 30  # LR /10 after this epoch (reference default 30)
    lr: float = 1e-3
    mode: str = "S"  # S: fixed sigma, B: blind
    noise_level: float = 40.0  # sigma in /255 units (mode S)
    blind_range: tuple = (0.0, 55.0)
    bn_sn: float = 0.0  # BN spectral-norm target; 0 = off. The reference's
    # RealSN recipe disables it (full_realsn_models.py bn_layer(features,
    # 0.0)) — clamping BN to 1.0 forbids it from re-amplifying the
    # SN-shrunk conv activations and collapses the net to the zero predictor.
    sn_probe_hw: int = 40
    sn_iters: int = 1
    seed: int = 0

    def as_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["blind_range"] = list(d["blind_range"])
        if d["adaptive_sigmas"] is not None:
            d["adaptive_sigmas"] = list(d["adaptive_sigmas"])
        return d


def _sn_enabled(cfg: TrainConfig) -> bool:
    return cfg.lip > 0 or cfg.adaptive_sigmas is not None


def _sn_effective_params(params, batch_stats, uv, cfg: TrainConfig):
    """The spectrally-normalized parameters the raw ones parametrize:
    every conv kernel scaled by ``target / sigma`` with sigma differentiable
    through the fixed (u, v) pair (torch-``spectral_norm`` semantics —
    gradients flow through the normalization), BN scales clamped via the
    running variance.

    This runs in the FORWARD pass, like the reference's pre-hooks
    (``Spectral_Normalize_chen.py:82-89``, ``conv_sn_chen.py:60-63``). A
    post-step projection is NOT equivalent: it compounds multiplicative
    shrinkage into the raw parameters every step and collapses the model to
    the zero predictor (observed: 17-layer lip=0.3 run pinned at the
    zero-residual loss with val PSNR == noisy PSNR)."""
    targets = realsn_targets(cfg.lip, cfg.depth, cfg.adaptive_sigmas)
    new_params = {}
    for name, layer in params.items():
        layer = dict(layer)
        if name.startswith("Conv_"):
            u, v = uv[name]
            target = targets[int(name.split("_")[1])]
            layer["kernel"] = layer["kernel"] * (
                target / sigma_uv(layer["kernel"], u, v)
            )
        elif (
            cfg.bn_sn > 0
            and name.startswith("BatchNorm_")
            and batch_stats is not None
        ):
            var = jax.lax.stop_gradient(batch_stats[name]["var"])
            s, b = bn_spectral_clamp(layer["scale"], layer["bias"], var, cfg.bn_sn)
            layer["scale"], layer["bias"] = s, b
        new_params[name] = layer
    return new_params


def effective_variables(variables, u_state, cfg: TrainConfig, n_iters: int = 30):
    """Materialize the effective (normalized) network from raw training
    variables — what evaluation, export, and the denoiser loaders consume.
    Uses a converged power iteration (``n_iters``) so the per-layer
    Lipschitz targets genuinely hold on the saved weights."""
    if not _sn_enabled(cfg):
        return variables
    uv = {
        name: power_iteration_uv(layer["kernel"], u_state[name], n_iters)
        for name, layer in variables["params"].items()
        if name.startswith("Conv_")
    }
    params = _sn_effective_params(
        variables["params"], variables.get("batch_stats"), uv, cfg
    )
    return {**variables, "params": params}


def make_train_step(model: DnCNN, tx, cfg: TrainConfig):
    sn = _sn_enabled(cfg)

    @jax.jit
    def step(variables, opt_state, u_state, noisy, noise):
        if sn:
            # Power-iterate u/v once per step outside the gradient (the
            # reference pre-hook's no_grad update, conv_sn_chen.py:60-63).
            uv = {
                name: power_iteration_uv(
                    layer["kernel"], u_state[name], cfg.sn_iters
                )
                for name, layer in variables["params"].items()
                if name.startswith("Conv_")
            }
            u_state = {**u_state, **{n: u for n, (u, _) in uv.items()}}

        def loss_fn(params):
            if sn:
                params = _sn_effective_params(
                    params, variables.get("batch_stats"), uv, cfg
                )
            vs = {"params": params, **{k: v for k, v in variables.items() if k != "params"}}
            out, updates = model.apply(
                vs, noisy, train=True, mutable=["batch_stats"] if cfg.use_bn else []
            )
            # Reference objective: sum-MSE over the batch / (2B)
            loss = jnp.sum((out - noise) ** 2) / (2.0 * noisy.shape[0])
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        up, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], up)
        new_vars = {**variables, "params": params, **updates}
        return new_vars, opt_state, u_state, loss

    return step


def evaluate(model: DnCNN, variables, val_images: Sequence[np.ndarray], sigma: float,
             seed: int = 1234):
    """Per-epoch validation: PSNR/SSIM of denoised Set12 (reference
    ``train_full_realsn.py:127-162``).

    The whole per-image evaluation (forward pass + both metrics) is ONE
    jitted dispatch returning two scalars: over the axon PJRT tunnel a chain
    of small eager metric ops can read back corrupted values (observed SSIM
    of 2.64 for a 0.875 image), and scalar readbacks are the only reliable
    fence (CLAUDE.md measurement playbook)."""
    rng = np.random.default_rng(seed)

    @jax.jit
    def eval_one(v, clean, noisy):
        r = model.apply(v, noisy[None, ..., None])[0, ..., 0]
        den = jnp.clip(noisy - r, 0.0, 1.0)
        # One stacked output array, not two scalars: reading back the second
        # of two scalar outputs over the axon tunnel has returned corrupted
        # values (observed SSIM 7.9 for a <=1 metric).
        return jnp.stack([psnr(clean, den), ssim(clean, den)])

    psnrs, ssims = [], []
    for img in val_images:
        clean = jnp.asarray(img, jnp.float32)
        noisy = clean + sigma * jnp.asarray(
            rng.standard_normal(clean.shape), jnp.float32
        )
        ps = np.asarray(eval_one(variables, clean, noisy))
        psnrs.append(float(ps[0]))
        ssims.append(float(ps[1]))
    return float(np.mean(psnrs)), float(np.mean(ssims))


def train(
    cfg: TrainConfig,
    exp_dir: str | Path,
    train_dir=data_lib.REFERENCE_TRAIN_DIR,
    val_dir=data_lib.REFERENCE_VAL_DIR,
    max_images: int | None = None,
    max_steps_per_epoch: int | None = None,
    log_every: int = 50,
    verbose: bool = True,
):
    """Full training run with checkpoint/resume. Returns final variables."""
    exp_dir = Path(exp_dir)
    model = DnCNN(
        channels=cfg.channels, depth=cfg.depth, features=cfg.features,
        use_bn=cfg.use_bn,
    )
    key = jax.random.PRNGKey(cfg.seed)
    variables = dict(model.init(key, jnp.zeros((1, 40, 40, cfg.channels)), train=False))

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    opt_state = tx.init(variables["params"])
    u_state = {
        name: init_u(jax.random.fold_in(key, i), layer["kernel"].shape[-1],
                     hw=cfg.sn_probe_hw)
        for i, (name, layer) in enumerate(variables["params"].items())
        if name.startswith("Conv_")
    }

    start_epoch = 0
    ckpt = load_checkpoint(exp_dir, cfg.as_dict())
    if ckpt is not None and "variables" in ckpt:
        variables = jax.tree_util.tree_map(jnp.asarray, ckpt["variables"])
        u_state = jax.tree_util.tree_map(jnp.asarray, ckpt.get("u_state", u_state))
        start_epoch = int(ckpt.get("epoch", 0))
        if verbose:
            print(f"resumed {exp_dir} at epoch {start_epoch}")

    patches = data_lib.build_patch_dataset(
        train_dir, max_images=max_images, seed=cfg.seed
    )
    val_images = [
        data_lib.load_gray(p) for p in sorted(Path(val_dir).glob("*.png"))
    ]
    step_fn = make_train_step(model, tx, cfg)
    noise_sigma = (
        (cfg.blind_range[0] / 255.0, cfg.blind_range[1] / 255.0)
        if cfg.mode == "B"
        else cfg.noise_level / 255.0
    )

    log_path = exp_dir / "scalars.jsonl"
    exp_dir.mkdir(parents=True, exist_ok=True)
    history = []
    for epoch in range(start_epoch, cfg.epochs):
        lr = cfg.lr / (10.0 if epoch >= cfg.milestone else 1.0)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        t0 = time.time()
        losses = []
        for step_i, (noisy, noise) in enumerate(
            data_lib.batches(patches, cfg.batch_size, noise_sigma,
                             seed=cfg.seed + epoch)
        ):
            if max_steps_per_epoch is not None and step_i >= max_steps_per_epoch:
                break
            variables, opt_state, u_state, loss = step_fn(
                variables, opt_state, u_state, jnp.asarray(noisy), jnp.asarray(noise)
            )
            losses.append(float(loss))
            if verbose and step_i % log_every == 0:
                print(f"epoch {epoch} step {step_i}: loss {losses[-1]:.5f}")
        val_sigma = (
            cfg.noise_level / 255.0 if cfg.mode == "S" else 25.0 / 255.0
        )
        # Validation sees the effective (spectrally-normalized) network —
        # the raw parameters are just its parametrization.
        val_psnr, val_ssim = evaluate(
            model, effective_variables(variables, u_state, cfg), val_images,
            val_sigma,
        )
        rec = {
            "epoch": epoch,
            "lr": lr,
            "train_loss": float(np.mean(losses)) if losses else float("nan"),
            "val_psnr": val_psnr,
            "val_ssim": val_ssim,
            "seconds": time.time() - t0,
        }
        history.append(rec)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if verbose:
            print(f"epoch {epoch}: {rec}")
        save_checkpoint(
            exp_dir,
            {"variables": variables, "u_state": u_state, "epoch": epoch + 1},
            cfg.as_dict(),
        )
    # Callers (export, the denoiser loaders) get the effective network; the
    # checkpoints above keep the raw parametrization for exact resume.
    return effective_variables(variables, u_state, cfg), history
