"""Denoiser-training patch pipeline.

Native replacement for the reference's h5py patch preparation (reference
``DeepDenoisers/training/utilities/dataset.py:15-111``): stride-10 40x40
patches at 4 image scales with 8-mode flip/rotate augmentation, assembled
into shuffled minibatches with AWGN added on the fly. The hot inner loops
(patch extraction, augmentation, batch assembly + noise) can run through the
native C++ extension (``pnp_svrg_tpu/native``) when built, with a numpy
fallback that is bit-compatible.

Default source images: the 400-image train set shipped inside the read-only
reference checkout; any directory of grayscale images works.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

REFERENCE_TRAIN_DIR = Path(
    "/root/reference/denoisers/DeepDenoisers/training/data/train"
)
REFERENCE_VAL_DIR = Path(
    "/root/reference/denoisers/DeepDenoisers/training/data/Set12"
)

SCALES = (1.0, 0.9, 0.8, 0.7)  # reference dataset.py prepare_data scales
PATCH = 40
STRIDE = 10


def load_gray(path: Path, scale: float = 1.0) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("L")
    if scale != 1.0:
        w, h = img.size
        img = img.resize((int(w * scale), int(h * scale)))
    return np.asarray(img, np.float32) / 255.0


def im2patch(img: np.ndarray, patch: int = PATCH, stride: int = STRIDE) -> np.ndarray:
    """Extract (n, patch, patch) patches on a stride grid (reference
    ``dataset.py Im2Patch``)."""
    h, w = img.shape
    ys = range(0, h - patch + 1, stride)
    xs = range(0, w - patch + 1, stride)
    out = np.empty((len(ys) * len(xs), patch, patch), np.float32)
    k = 0
    for y in ys:
        for x in xs:
            out[k] = img[y : y + patch, x : x + patch]
            k += 1
    return out

def augment(patch: np.ndarray, mode: int) -> np.ndarray:
    """The reference's 8-mode flip/rotation augmentation (reference
    ``training/utilities/utils.py:46-75``)."""
    if mode == 0:
        return patch
    if mode == 1:
        return np.flipud(patch)
    if mode == 2:
        return np.rot90(patch)
    if mode == 3:
        return np.flipud(np.rot90(patch))
    if mode == 4:
        return np.rot90(patch, k=2)
    if mode == 5:
        return np.flipud(np.rot90(patch, k=2))
    if mode == 6:
        return np.rot90(patch, k=3)
    if mode == 7:
        return np.flipud(np.rot90(patch, k=3))
    raise ValueError(f"augmentation mode {mode} out of range")


def build_patch_dataset(
    image_dir: Path | str = REFERENCE_TRAIN_DIR,
    max_images: int | None = None,
    patch: int = PATCH,
    stride: int = STRIDE,
    scales: Sequence[float] = SCALES,
    augment_modes: bool = True,
    seed: int = 0,
) -> np.ndarray:
    """(N, patch, patch) float32 clean-patch tensor.

    Mirrors reference ``prepare_data``: every image at every scale is cut
    into stride-grid patches, each patch randomly augmented.
    """
    rng = np.random.default_rng(seed)
    paths = sorted(Path(image_dir).glob("*.png")) + sorted(
        Path(image_dir).glob("*.jpg")
    )
    if max_images is not None:
        paths = paths[:max_images]
    if not paths:
        raise FileNotFoundError(f"no images found under {image_dir}")
    from pnp_svrg_tpu import native

    use_native = native.available()
    chunks = []
    for p in paths:
        for s in scales:
            img = load_gray(p, s)
            if min(img.shape) < patch:
                continue
            if use_native:
                ps = native.extract_patches(img, patch, stride)
            else:
                ps = im2patch(img, patch, stride)
            if augment_modes:
                modes = rng.integers(0, 8, size=len(ps)).astype(np.uint8)
                if use_native:
                    ps = native.augment_patches(ps, modes)
                else:
                    ps = np.stack([augment(q, int(m)) for q, m in zip(ps, modes)])
            chunks.append(ps)
    return np.ascontiguousarray(np.concatenate(chunks, axis=0))


def batches(
    patches: np.ndarray,
    batch_size: int,
    noise_sigma: float | tuple[float, float],
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (noisy, noise) NHWC minibatches for residual training.

    ``noise_sigma``: fixed sigma in [0,1] units (mode S) or a (lo, hi) range
    sampled per-sample (blind mode B), mirroring reference
    ``train_full_realsn.py:96-103``.
    """
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(patches))
    n_full = len(idx) // batch_size
    for b in range(n_full if drop_last else n_full + 1):
        sel = idx[b * batch_size : (b + 1) * batch_size]
        if len(sel) == 0:
            break
        clean = patches[sel][..., None]  # NHWC
        if isinstance(noise_sigma, tuple):
            sig = rng.uniform(noise_sigma[0], noise_sigma[1], size=(len(sel), 1, 1, 1))
        else:
            sig = np.full((len(sel), 1, 1, 1), noise_sigma)
        noise = (sig * rng.standard_normal(clean.shape)).astype(np.float32)
        yield clean + noise, noise
