"""Config-guarded checkpoint/resume for denoiser training.

Re-design of the reference's checkpoint discipline (reference
``denoisers/cnn/cnn.py:107-167``): each experiment directory holds the
latest state plus a ``config.json``; re-instantiating an experiment with a
different configuration refuses to resume (the reference compares
``repr(self)`` against a stored ``config.txt`` and raises).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from pnp_svrg_tpu.models.convert import save_flax_npz, load_flax_npz


class ConfigMismatch(RuntimeError):
    pass


def save_checkpoint(exp_dir: str | Path, state: dict, config: dict) -> None:
    """Persist {params/opt_state/...} pytrees + metadata + config guard."""
    exp_dir = Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    cfg_path = exp_dir / "config.json"
    if cfg_path.exists():
        stored = json.loads(cfg_path.read_text())
        if stored != config:
            raise ConfigMismatch(
                f"experiment at {exp_dir} was created with a different "
                f"config:\n stored={stored}\n new={config}"
            )
    else:
        cfg_path.write_text(json.dumps(config, indent=2, sort_keys=True))

    arrays = {}
    meta = {}
    for name, tree in state.items():
        if isinstance(tree, (int, float, str)):
            meta[name] = tree
        else:
            arrays[name] = jax.tree_util.tree_map(np.asarray, tree)
    for name, tree in arrays.items():
        save_flax_npz({name: tree}, exp_dir / f"{name}.npz")
    (exp_dir / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(exp_dir: str | Path, config: dict | None = None) -> dict | None:
    """Load the stored state, verifying the config guard. Returns None when
    no checkpoint exists yet."""
    exp_dir = Path(exp_dir)
    cfg_path = exp_dir / "config.json"
    if not cfg_path.exists():
        return None
    if config is not None:
        stored = json.loads(cfg_path.read_text())
        if stored != config:
            raise ConfigMismatch(
                f"refusing to resume {exp_dir}: stored config differs\n"
                f" stored={stored}\n new={config}"
            )
    state: dict = {}
    for npz in exp_dir.glob("*.npz"):
        tree = load_flax_npz(npz)
        state[npz.stem] = tree[npz.stem] if npz.stem in tree else tree
    meta_path = exp_dir / "meta.json"
    if meta_path.exists():
        state.update(json.loads(meta_path.read_text()))
    return state
