"""Unit tests: config system — two-phase CLI parse, per-model/per-dataset
flag injection, reproducibility dump (reference options/ semantics)."""

import json
import os

from biasgan_tpu.config import parse_config, save_config


def test_pix2pix_defaults_injected():
    cfg = parse_config(["--model", "pix2pix", "--dataroot", "x"], train=True)
    # reference Pix2PixModel.modify_commandline_options
    assert cfg.norm == "batch"
    assert cfg.netG == "unet_256"
    assert cfg.gan_mode == "vanilla"
    assert cfg.pool_size == 0
    assert cfg.dataset_mode == "aligned"
    assert cfg.lambda_L1 == 100.0  # plugin field injected


def test_cyclegan_defaults_injected():
    cfg = parse_config(["--model", "cycle_gan"], train=True)
    assert cfg.norm == "instance"
    assert cfg.netG == "resnet_9blocks"
    assert cfg.no_dropout is True
    assert cfg.gan_mode == "lsgan"
    assert cfg.pool_size == 50
    assert cfg.dataset_mode == "unaligned"
    assert cfg.lambda_A == 10.0 and cfg.lambda_identity == 0.5


def test_cli_overrides_model_defaults():
    cfg = parse_config(
        ["--model", "pix2pix", "--norm", "instance", "--lambda_L1", "50"],
        train=True,
    )
    assert cfg.norm == "instance"
    assert cfg.lambda_L1 == 50.0


def test_dataset_defaults_injected():
    cfg = parse_config(
        ["--model", "pix2pix", "--dataset_mode", "synthetic"], train=True
    )
    assert cfg.in_graph_aug is True
    assert cfg.synthetic_samples == 128  # dataset plugin field


def test_test_config_hardcodes():
    cfg = parse_config(["--model", "pix2pix"], train=False)
    assert cfg.phase == "test"
    assert cfg.batch_size == 1
    assert cfg.serial_batches is True
    assert cfg.no_flip is True


def test_config_dump(tmp_path):
    cfg = parse_config(
        ["--model", "pix2pix", "--checkpoints_dir", str(tmp_path), "--name", "t"],
        train=True,
    )
    path = save_config(cfg)
    with open(path) as f:
        d = json.load(f)
    assert d["name"] == "t" and d["model"] == "pix2pix"


def test_suffix_formatting():
    cfg = parse_config(
        ["--model", "pix2pix", "--name", "exp", "--suffix", "{netG}_{ngf}"],
        train=True,
    )
    assert cfg.resolved_name() == "exp_unet_256_64"
