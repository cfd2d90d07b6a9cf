"""Fused-block TRAINING through the real CLI: train.py --fused_blocks wires
BIASGAN_FUSED_BLOCK/BIASGAN_FUSED_TRAIN and prints the engagement notice;
ineligible generators get the same style of notice and the plain path
(advisor r3: the flag must never be silently ignored)."""

import os
import subprocess
import sys

ENV = dict(
    os.environ,
    BIASGAN_PLATFORM="cpu",
    # off-TPU the fused path needs the explicit interpret opt-in (train.py
    # only auto-sets '1' on a real TPU backend); toy ngf needs MIN_C=1
    BIASGAN_FUSED_BLOCK="interpret",
    BIASGAN_FUSED_MIN_C="1",
)

BASE = [
    "--model", "cycle_gan", "--dataset_mode", "synthetic",
    "--norm", "instance", "--no_dropout",
    "--netD", "basic", "--gan_mode", "lsgan", "--pool_size", "4",
    "--crop_size", "32", "--input_nc", "1", "--output_nc", "1",
    "--batch_size", "2", "--ngf", "8", "--ndf", "8",
    "--synthetic_samples", "4", "--print_freq", "2",
    "--n_epochs", "1", "--n_epochs_decay", "0", "--save_epoch_freq", "1",
]


def _train(tmp, name, extra, env=ENV):
    cmd = [sys.executable, "-u", "train.py"] + BASE + [
        "--checkpoints_dir", str(tmp), "--name", name
    ] + extra
    p = subprocess.run(
        cmd, cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-2000:]
    return p.stdout


def test_fused_train_cli(tmp_path):
    out = _train(
        tmp_path, "fused", ["--netG", "resnet_3blocks", "--fused_blocks"]
    )
    assert "fused training path engaged" in out
    assert "cycle_A" in out and "End of epoch 1 / 1" in out
    assert (tmp_path / "fused" / "ckpt" / "epoch_1").is_dir()


def test_fused_train_cli_ineligible_netg_notice(tmp_path):
    out = _train(
        tmp_path, "unet", ["--netG", "unet_d4", "--fused_blocks"]
    )
    assert "no resnet block chain" in out
    assert "fused training path engaged" not in out
    assert "End of epoch 1 / 1" in out
