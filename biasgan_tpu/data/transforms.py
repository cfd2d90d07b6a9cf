"""Transforms: host-side image preprocessing + in-graph augmentation.

Host side (reference ``data/base_dataset.py`` get_params/get_transform [K]):
resize to --load_size, crop to --crop_size (shared params for aligned pairs),
power-of-2 snapping, [-1, 1] normalization. These run once per sample on
small images — not the hot path.

In-graph side (TPU-native, mandated by the north star BASELINE.json line 5):
random horizontal flips and periodic-longitude rolls execute INSIDE the
jitted train step, keyed by the step rng — zero host work, shared parameters
across the A/B pair by construction.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ---------------------------------------------------------------------------
# host-side (PIL / numpy) — reference get_transform pipeline
# ---------------------------------------------------------------------------


def sample_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    """Deterministic per-sample generator. Derived from (--seed, epoch,
    sample index) so results are reproducible under --seed and independent of
    worker-thread scheduling, while still varying across epochs (fresh crops/
    flips each pass — reference DataLoader-worker behavior, but seeded)."""
    return np.random.default_rng((int(seed), int(epoch), int(index)))


def get_params(cfg, size: Tuple[int, int], rng: np.random.Generator) -> Dict:
    """Shared random transform params for an aligned pair (reference
    get_params). Crop positions range over the post-resize size: the actual
    image size unless a resize precedes the crop."""
    w, h = size
    new_w, new_h = w, h
    if cfg.preprocess == "resize_and_crop":
        new_w = new_h = cfg.load_size
    elif cfg.preprocess == "scale_width_and_crop":
        new_w, new_h = cfg.load_size, int(cfg.load_size * h / w)
    x = int(rng.integers(0, max(0, new_w - cfg.crop_size) + 1))
    y = int(rng.integers(0, max(0, new_h - cfg.crop_size) + 1))
    flip = bool(rng.random() > 0.5)
    return {"crop_pos": (x, y), "flip": flip}


def transform_image(
    img,
    cfg,
    params: Optional[Dict] = None,
    grayscale: bool = False,
    method=None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """PIL image -> float32 NHW C in [-1, 1], reference preprocess modes:
    resize_and_crop | crop | scale_width | scale_width_and_crop | none."""
    from PIL import Image

    method = method or Image.BICUBIC
    if grayscale:
        img = img.convert("L")
    else:
        img = img.convert("RGB")
    pre = cfg.preprocess
    if "resize" in pre:
        img = img.resize((cfg.load_size, cfg.load_size), method)
    elif "scale_width" in pre:
        w, h = img.size
        if w != cfg.load_size:
            img = img.resize((cfg.load_size, int(cfg.load_size * h / w)), method)
    if "crop" in pre:
        if params is None:
            w, h = img.size
            r = rng if rng is not None else np.random.default_rng()
            x = int(r.integers(0, max(0, w - cfg.crop_size) + 1))
            y = int(r.integers(0, max(0, h - cfg.crop_size) + 1))
        else:
            x, y = params["crop_pos"]
        img = img.crop((x, y, x + cfg.crop_size, y + cfg.crop_size))
    if pre == "none":
        img = _make_power_2(img, base=4, method=method)
    if not cfg.no_flip:
        # aligned pairs share params; unaligned/single draw a fresh coin per
        # image (reference adds RandomHorizontalFlip in the params=None case)
        if params is not None:
            flip = params["flip"]
        else:
            r = rng if rng is not None else np.random.default_rng()
            flip = bool(r.random() > 0.5)
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _make_power_2(img, base: int, method):
    ow, oh = img.size
    w = int(round(ow / base) * base) or base
    h = int(round(oh / base) * base) or base
    if w == ow and h == oh:
        return img
    return img.resize((w, h), method)


# ---------------------------------------------------------------------------
# in-graph (jit) — TPU-native augmentation
# ---------------------------------------------------------------------------


def in_graph_augment(
    batch: Dict[str, Array],
    rng: Array,
    flip: bool = True,
    lon_roll: bool = False,
    keys: Tuple[str, ...] = ("A", "B"),
) -> Dict[str, Array]:
    """Random W-flip and periodic-longitude roll, identical params across the
    A/B pair (reference shares get_params across the pair). Pure, jittable.
    """
    present = [k for k in keys if k in batch]
    if not present or not (flip or lon_roll):
        return batch
    n = batch[present[0]].shape[0]
    w = batch[present[0]].shape[2]
    rng_f, rng_r = jax.random.split(rng)
    out = dict(batch)
    if flip:
        do = jax.random.bernoulli(rng_f, 0.5, (n,))
        for k in present:
            x = out[k]
            out[k] = jnp.where(do[:, None, None, None], x[:, :, ::-1, :], x)
    if lon_roll:
        shifts = jax.random.randint(rng_r, (n,), 0, w)
        roll = jax.vmap(lambda img, s: jnp.roll(img, s, axis=1))
        for k in present:
            out[k] = roll(out[k], shifts)
    return out


def standardize(x: Array, mean: Array, std: Array, inverse: bool = False) -> Array:
    """Per-variable (channel) standardization, in-graph. mean/std are (C,)."""
    mean = mean.reshape((1,) * (x.ndim - 1) + (-1,))
    std = std.reshape((1,) * (x.ndim - 1) + (-1,))
    if inverse:
        return x * std + mean
    return (x - mean) / std
