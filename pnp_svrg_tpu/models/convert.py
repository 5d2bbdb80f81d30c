"""Convert reference PyTorch .pth checkpoints to Flax parameter .npz files.

Host-side, torch-cpu-only tooling (torch never enters the TPU compute path).
Handles the three checkpoint flavors shipped with the reference:

* plain state dicts with ``module.dncnn.N.*`` keys (DnCNN / RealSN variants,
  saved from ``nn.DataParallel``-wrapped ``nn.Sequential`` models),
* plain state dicts with ``dncnn.N.*`` keys (SimpleCNN),
* fully pickled ``nn.DataParallel`` modules (the MMO ``DnCNN_nobn_*`` files,
  reference ``MMODenoise.py:68-70``) — unpickled against stub class
  definitions, then reduced to their state dicts.

Layout conversion: torch conv weights (O, I, kh, kw) -> flax (kh, kw, I, O);
BatchNorm (weight, bias, running_mean, running_var) -> flax
(scale, bias, mean, var) split across params / batch_stats collections.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")
DEFAULT_OUT = Path(__file__).resolve().parents[2] / "checkpoints"


def _strip_prefix(sd: dict, prefix: str = "module.") -> dict:
    return {
        (k[len(prefix) :] if k.startswith(prefix) else k): v for k, v in sd.items()
    }


def _load_torch_state_dict(path: Path) -> dict:
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError:
        # Fully pickled module referencing the reference's 'models' package:
        # unpickling only needs the class *names* to exist (nn.Module state is
        # restored via __dict__, __init__ is never called).
        import torch.nn as tnn

        models_pkg = types.ModuleType("models")
        basic = types.ModuleType("models.basic_models")

        class simple_CNN(tnn.Module):  # noqa: N801 (reference class name)
            pass

        basic.simple_CNN = simple_CNN
        models_pkg.basic_models = basic
        sys.modules.setdefault("models", models_pkg)
        sys.modules.setdefault("models.basic_models", basic)
        obj = torch.load(path, map_location="cpu", weights_only=False)

    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return _strip_prefix(dict(obj))


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def sequential_dncnn_to_flax(sd: dict) -> dict:
    """Map ``dncnn.N.*`` Sequential keys to the Flax DnCNN/MMOSimpleCNN
    naming (Conv_0, Conv_1, ..., BatchNorm_0, ...). Conv/BN order inside the
    Sequential is positional; Flax numbering is by occurrence order, which
    matches."""
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("dncnn.")}
    )
    params: dict = {}
    batch_stats: dict = {}
    conv_i = 0
    bn_i = 0
    for idx in idxs:
        keys = {k.split(".", 2)[2] for k in sd if k.startswith(f"dncnn.{idx}.")}
        get = lambda name: np.asarray(sd[f"dncnn.{idx}.{name}"].numpy())
        if "running_mean" in keys:  # BatchNorm layer
            params[f"BatchNorm_{bn_i}"] = {
                "scale": get("weight"),
                "bias": get("bias"),
            }
            batch_stats[f"BatchNorm_{bn_i}"] = {
                "mean": get("running_mean"),
                "var": get("running_var"),
            }
            bn_i += 1
        elif "weight" in keys:  # Conv layer
            layer = {"kernel": _conv_to_flax(get("weight"))}
            if "bias" in keys:
                layer["bias"] = get("bias")
            params[f"Conv_{conv_i}"] = layer
            conv_i += 1
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def mmo_simple_cnn_to_flax(sd: dict) -> dict:
    """Map the MMO ``simple_CNN`` keys (in_conv / conv_list.N / out_conv,
    reference ``MMODenoise.py:81-86``) to Flax ``Conv_0..Conv_{depth-1}``."""
    n_mid = len({k.split(".")[1] for k in sd if k.startswith("conv_list.")})
    order = (
        ["in_conv"]
        + [f"conv_list.{i}" for i in range(n_mid)]
        + ["out_conv"]
    )
    params = {}
    for i, base in enumerate(order):
        params[f"Conv_{i}"] = {
            "kernel": _conv_to_flax(np.asarray(sd[f"{base}.weight"].numpy())),
            "bias": np.asarray(sd[f"{base}.bias"].numpy()),
        }
    return {"params": params}


def _flatten(tree: dict, prefix: str = "") -> dict:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = v
    return flat


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_flax_npz(variables: dict, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **_flatten(variables))


def load_flax_npz(path: Path) -> dict:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


# Checkpoints shipped with the reference that we can convert (RealSN_DnCNN
# .pth files are listed in the reference's .MISSING_LARGE_BLOBS).
CONVERSIONS = {
    "dncnn_noise5": "denoisers/DeepDenoisers/Pretrained_models/DnCNN_noise5.pth",
    "dncnn_noise15": "denoisers/DeepDenoisers/Pretrained_models/DnCNN_noise15.pth",
    "dncnn_noise40": "denoisers/DeepDenoisers/Pretrained_models/DnCNN_noise40.pth",
    "simplecnn_noise5": "denoisers/DeepDenoisers/Pretrained_models/SimpleCNN_noise5.pth",
    "simplecnn_noise15": "denoisers/DeepDenoisers/Pretrained_models/SimpleCNN_noise15.pth",
    "simplecnn_noise40": "denoisers/DeepDenoisers/Pretrained_models/SimpleCNN_noise40.pth",
    "realsn_simplecnn_noise5": "denoisers/DeepDenoisers/Pretrained_models/RealSN_SimpleCNN_noise5.pth",
    "realsn_simplecnn_noise15": "denoisers/DeepDenoisers/Pretrained_models/RealSN_SimpleCNN_noise15.pth",
    "realsn_simplecnn_noise40": "denoisers/DeepDenoisers/Pretrained_models/RealSN_SimpleCNN_noise40.pth",
    "mmo_dncnn_nobn_nch1_nlev0.009": "denoisers/checkpoints/pretrained/DnCNN_nobn_nch_1_nlev_0.009.pth",
    "mmo_dncnn_nobn_nch1_nlev0.01": "denoisers/checkpoints/pretrained/DnCNN_nobn_nch_1_nlev_0.01.pth",
    "mmo_dncnn_nobn_nch3_nlev0.01": "denoisers/checkpoints/pretrained/DnCNN_nobn_nch_3_nlev_0.01.pth",
    "mmo_dncnn_nobn_nch3_nlev0.007": "denoisers/checkpoints/pretrained/DnCNN_nobn_nch_3_nlev_0.007.pth",
}


def convert_all(out_dir: Path = DEFAULT_OUT, reference_root: Path = REFERENCE_ROOT):
    converted = []
    for name, rel in CONVERSIONS.items():
        src = reference_root / rel
        if not src.exists():
            print(f"skip {name}: {src} missing")
            continue
        sd = _load_torch_state_dict(src)
        if name.startswith("mmo_"):
            variables = mmo_simple_cnn_to_flax(sd)
        else:
            variables = sequential_dncnn_to_flax(sd)
        dst = out_dir / f"{name}.npz"
        save_flax_npz(variables, dst)
        n_params = sum(
            int(np.prod(v.shape)) for v in _flatten(variables).values()
        )
        print(f"converted {name}: {n_params:,} params -> {dst}")
        converted.append(name)
    return converted


if __name__ == "__main__":
    convert_all()
