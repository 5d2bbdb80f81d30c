"""Image loading.

Replaces the PIL-open/resize/min-max pipeline embedded in the reference's
``Problem.__init__`` (reference ``problems/problem.py:17-25``) with a
standalone host-side function returning a float32 array in [0, 1].
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
REFERENCE_DATA_DIR = Path("/root/reference/data")
DATA_DIR = _REPO_ROOT / "data"
SET12_DIR = DATA_DIR / "Set12"


def resolve_data_path(name: str | os.PathLike) -> Path:
    """Resolve a data file against the repo data dir."""
    p = Path(name)
    if p.is_absolute():
        return p
    for base in (DATA_DIR, _REPO_ROOT):
        cand = base / p
        if cand.exists():
            return cand
    return DATA_DIR / p


def load_image(path: str | os.PathLike, h: int, w: int) -> np.ndarray:
    """Load a grayscale image, resize to (h, w), min-max normalize to [0, 1].

    Matches the reference's loading semantics: ``PIL.Image.resize((H, W))``
    (nearest-neighbor default) followed by min-max normalization.
    """
    from PIL import Image

    img = Image.open(resolve_data_path(path))
    arr = np.array(img.resize((w, h)), dtype=np.float32)
    if arr.ndim == 3:  # collapse RGB the way PIL 'L' would if asked; keep luma
        arr = arr.mean(axis=-1)
    lo, hi = arr.min(), arr.max()
    return (arr - lo) / (hi - lo)


def set12_paths() -> list[Path]:
    return sorted(SET12_DIR.glob("*.png"))
