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
    spectrally_normalize_kernel,
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
    sn_probe_hw: int = 40
    sn_iters: int = 1
    seed: int = 0

    def as_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["blind_range"] = list(d["blind_range"])
        if d["adaptive_sigmas"] is not None:
            d["adaptive_sigmas"] = list(d["adaptive_sigmas"])
        return d


def _sn_project(params, u_state, cfg: TrainConfig):
    """Project every conv kernel to its per-layer Lipschitz target and clamp
    BN scales (the RealSN constraint, applied post-update)."""
    if cfg.lip <= 0 and cfg.adaptive_sigmas is None:
        return params, u_state
    targets = realsn_targets(cfg.lip, cfg.depth, cfg.adaptive_sigmas)
    new_params = {}
    new_u = {}
    for name, layer in params["params"].items():
        layer = dict(layer)
        if name.startswith("Conv_"):
            target = targets[int(name.split("_")[1])]
            kern, _, u_new = spectrally_normalize_kernel(
                layer["kernel"], u_state[name], target=target, n_iters=cfg.sn_iters
            )
            layer["kernel"] = kern
            new_u[name] = u_new
        elif name.startswith("BatchNorm_") and "batch_stats" in params:
            var = params["batch_stats"][name]["var"]
            s, b = bn_spectral_clamp(layer["scale"], layer["bias"], var, 1.0)
            layer["scale"], layer["bias"] = s, b
        new_params[name] = layer
    out = dict(params)
    out["params"] = new_params
    return out, {**u_state, **new_u}


def make_train_step(model: DnCNN, tx, cfg: TrainConfig):
    @jax.jit
    def step(variables, opt_state, u_state, noisy, noise):
        def loss_fn(params):
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
        new_vars, u_state = _sn_project(new_vars, u_state, cfg)
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
        return psnr(clean, den), ssim(clean, den)

    psnrs, ssims = [], []
    for img in val_images:
        clean = jnp.asarray(img, jnp.float32)
        noisy = clean + sigma * jnp.asarray(
            rng.standard_normal(clean.shape), jnp.float32
        )
        p, s = eval_one(variables, clean, noisy)
        psnrs.append(float(p))
        ssims.append(float(s))
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
        val_psnr, val_ssim = evaluate(model, variables, val_images, val_sigma)
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
    return variables, history
