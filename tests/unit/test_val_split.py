"""Held-out validation split (--val_split, VERDICT r2 item 3): the split
partitions the dataset, val samples NEVER enter the train stream, and the
train driver computes out-of-sample metric bundles + the plateau metric on
the held-out data."""

import os
import subprocess
import sys

from biasgan_tpu.config import parse_config
from biasgan_tpu.data import create_dataset


def _cfg(extra=()):
    return parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "synthetic",
            "--netG", "unet_d4", "--crop_size", "32", "--input_nc", "1",
            "--output_nc", "1", "--batch_size", "2", "--ngf", "8",
            "--ndf", "8", "--synthetic_samples", "12",
            "--checkpoints_dir", "/tmp/bgt_vs", "--name", "vs",
            *extra,
        ],
        train=True,
    )


def test_split_partitions_dataset():
    cfg = _cfg(["--val_split", "4"])
    train = create_dataset(cfg, split="train")
    val = create_dataset(cfg, split="val")
    assert train.num_samples == 8 and val.num_samples == 4

    def paths(loader):
        out = set()
        for batch in loader:
            out.update(batch["A_paths"])
        return out

    train_paths = paths(train)
    val_paths = paths(val)
    # disjoint: no val sample ever enters the train stream
    assert not (train_paths & val_paths)
    # val is the held-out TAIL with global indices preserved
    assert val_paths == {f"synthetic://{i}" for i in range(8, 12)}


def test_split_none_returns_everything():
    cfg = _cfg(["--val_split", "4"])
    full = create_dataset(cfg)  # split=None ignores val_split
    assert full.num_samples == 12


def test_oversized_split_rejected():
    import pytest

    cfg = _cfg(["--val_split", "12"])
    with pytest.raises(ValueError, match="val_split"):
        create_dataset(cfg, split="train")


def test_subbatch_split_rejected():
    """--val_split smaller than one batch would silently yield ZERO val
    batches (the loader drops partial batches), disabling both the
    held-out metrics and the plateau decay — must fail loudly instead
    (r3 review finding)."""
    import pytest

    cfg = _cfg(["--val_split", "1"])  # batch_size 2
    with pytest.raises(ValueError, match="batch_size"):
        create_dataset(cfg, split="val")
    # the train side of the same split is fine
    assert create_dataset(cfg, split="train").num_samples == 11


def test_bogus_split_rejected():
    """A typo'd split name (or a split request without --val_split) must
    not silently return the FULL dataset as 'validation'."""
    import pytest

    with pytest.raises(ValueError, match="unknown split"):
        create_dataset(_cfg(["--val_split", "4"]), split="valid")
    with pytest.raises(ValueError, match="val_split is not set"):
        create_dataset(_cfg(), split="val")


def test_train_cli_heldout_validation_and_plateau(tmp_path):
    """train.py with --val_split: prints held-out metric bundles, reports
    the val sample count, and the plateau policy consumes the val RMSE."""
    cmd = [
        sys.executable, "-u", "train.py",
        "--model", "pix2pix", "--dataset_mode", "synthetic",
        "--netG", "unet_d4", "--crop_size", "32", "--input_nc", "1",
        "--output_nc", "1", "--batch_size", "2", "--ngf", "8", "--ndf", "8",
        "--synthetic_samples", "12", "--val_split", "4", "--val_freq", "8",
        "--lr_policy", "plateau", "--print_freq", "4",
        "--n_epochs", "1", "--n_epochs_decay", "0", "--save_epoch_freq", "5",
        "--checkpoints_dir", str(tmp_path), "--name", "vscli",
    ]
    env = dict(os.environ, BIASGAN_PLATFORM="cpu")
    p = subprocess.run(
        cmd, cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-2000:]
    assert "The number of training images = 8" in p.stdout
    assert "The number of validation images = 4" in p.stdout
    assert "validation (held out):" in p.stdout
    assert "End of epoch 1 / 1" in p.stdout
