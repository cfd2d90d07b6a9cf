"""Array <-> image helpers (reference util/util.py: tensor2im, save_image [K])."""

from __future__ import annotations

import os
import numpy as np


def tensor2im(arr, imtype=np.uint8) -> np.ndarray:
    """(N)HWC float in [-1, 1] -> HWC uint8 (first batch element, like the
    reference). Unbounded standardized fields are min-max scaled instead."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 4:
        a = a[0]
    if a.ndim == 2:
        a = a[:, :, None]
    if a.min() < -1.001 or a.max() > 1.001:  # standardized field, not [-1,1]
        lo, hi = float(a.min()), float(a.max())
        a = (a - lo) / (hi - lo + 1e-12) * 2.0 - 1.0
    img = (a + 1.0) / 2.0 * 255.0
    img = np.clip(img, 0, 255)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img.astype(imtype)


def save_image(image_numpy: np.ndarray, image_path: str, aspect_ratio: float = 1.0):
    from PIL import Image

    img = Image.fromarray(image_numpy)
    h, w = image_numpy.shape[0], image_numpy.shape[1]
    if aspect_ratio > 1.0:
        img = img.resize((w, int(h * aspect_ratio)), Image.BICUBIC)
    elif aspect_ratio < 1.0:
        img = img.resize((int(w / aspect_ratio), h), Image.BICUBIC)
    os.makedirs(os.path.dirname(image_path) or ".", exist_ok=True)
    img.save(image_path)


def save_field(field: np.ndarray, path: str, channel: int = 0):
    """Save a gridded field as .npy (lossless, for downstream analysis)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(field))


def diagnose_network(params, name: str = "network") -> float:
    """Element-weighted mean |param| — single implementation lives in
    utils/diagnostics.py; re-exported here for reference-layout callers."""
    from biasgan_tpu.utils.diagnostics import diagnose_network as _dn

    return _dn(params, name)


def mkdirs(paths):
    if isinstance(paths, (list, tuple)):
        for p in paths:
            os.makedirs(p, exist_ok=True)
    else:
        os.makedirs(paths, exist_ok=True)
