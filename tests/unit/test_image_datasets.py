"""Aligned / unaligned / single image datasets + host transform pipeline
(reference data/{aligned,unaligned,single}_dataset.py + base_dataset.py [K])."""

import os

import numpy as np
import pytest
from PIL import Image

from biasgan_tpu.config import parse_config
from biasgan_tpu.data import create_dataset


def _img(path, w=40, h=20, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    (tmp / "train").mkdir()
    (tmp / "trainA").mkdir()
    (tmp / "trainB").mkdir()
    for i in range(4):
        _img(tmp / "train" / f"ab{i}.png", w=40, h=20, seed=i)  # A|B combined
        _img(tmp / "trainA" / f"a{i}.jpg", w=30, h=30, seed=10 + i)
    for i in range(2):
        _img(tmp / "trainB" / f"b{i}.png", w=30, h=30, seed=20 + i)
    return tmp


def _cfg(root, mode, extra=None, dataroot=None):
    return parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", mode,
            "--dataroot", str(dataroot or root), "--phase", "train",
            "--load_size", "16", "--crop_size", "8", "--batch_size", "2",
            "--checkpoints_dir", str(root / "ck"),
        ]
        + (extra or []),
        train=True,
    )


def test_aligned_splits_and_range(root):
    ds = create_dataset(_cfg(root, "aligned"))
    batch = next(iter(ds))
    assert batch["A"].shape == (2, 8, 8, 3)
    assert batch["B"].shape == (2, 8, 8, 3)
    for k in ("A", "B"):
        assert batch[k].min() >= -1.0 and batch[k].max() <= 1.0
    assert len(batch["A_paths"]) == 2


def test_unaligned_lengths_and_serial(root):
    from biasgan_tpu.registry import get_dataset

    ds = get_dataset("unaligned")(_cfg(root, "unaligned", ["--serial_batches"]))
    assert len(ds) == 4  # max(lenA=4, lenB=2)
    s = ds[3]
    assert s["B_paths"].endswith("b1.png")  # 3 % 2 == 1, serial indexing
    assert s["A"].shape == (8, 8, 3)


def test_single_dataset(root):
    cfg = _cfg(root, "single", dataroot=root / "trainA")
    ds = create_dataset(cfg)
    batch = next(iter(ds))
    assert batch["A"].shape == (2, 8, 8, 3)
    assert "B" not in batch


def test_grayscale_channels(root):
    cfg = _cfg(root, "aligned", ["--input_nc", "1", "--output_nc", "1"])
    ds = create_dataset(cfg)
    batch = next(iter(ds))
    assert batch["A"].shape[-1] == 1 and batch["B"].shape[-1] == 1


def test_preprocess_none_power2(root):
    """preprocess=none snaps to a multiple of 4 (reference __make_power_2)."""
    cfg = _cfg(root, "single", ["--preprocess", "none", "--batch_size", "1"],
               dataroot=root / "trainA")
    ds = create_dataset(cfg)
    batch = next(iter(ds))
    h, w = batch["A"].shape[1:3]
    assert h % 4 == 0 and w % 4 == 0
