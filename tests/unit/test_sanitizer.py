"""Sanitizer tier (--check_finite / --debug_nans, SURVEY.md section 5
race-detection/sanitizer row; VERDICT r3 item 5): a NaN'd GAN run must
raise with the offending key named instead of silently producing garbage
until someone reads a loss print."""

import numpy as np
import pytest

from biasgan_tpu.config import parse_config
from biasgan_tpu.models import create_model
from biasgan_tpu.utils.diagnostics import check_losses_finite


def test_check_losses_finite_names_key():
    with pytest.raises(FloatingPointError) as ei:
        check_losses_finite(
            {"G_GAN": 0.5, "G_L1": float("nan"), "D_real": 0.2}, "step 7"
        )
    msg = str(ei.value)
    assert "G_L1" in msg and "step 7" in msg
    assert "G_GAN" not in msg  # only the offending key is named


def test_check_losses_finite_clean_passes():
    check_losses_finite({"G_GAN": 0.5, "D_fake": 1e30})


def _tiny_model():
    cfg = parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "synthetic",
            "--netG", "unet_d4", "--crop_size", "64",
            "--input_nc", "1", "--output_nc", "1", "--batch_size", "2",
            "--ngf", "8", "--ndf", "8", "--pool_size", "0",
            "--steps_per_epoch", "4", "--check_finite", "1",
            "--checkpoints_dir", "/tmp/bgt_test_ckpt", "--name", "sanit",
        ],
        train=True,
    )
    return create_model(cfg)


def test_nan_input_raises_with_key(tmp_path):
    """End-to-end: a NaN in the input field poisons the losses; the model's
    check_finite hook (what train.py calls at the --check_finite cadence)
    raises FloatingPointError naming a loss key."""
    model = _tiny_model()
    model.setup()
    a = np.random.RandomState(0).randn(2, 64, 64, 1).astype(np.float32)
    a[0, 3, 3, 0] = np.nan
    model.set_input({"A": a, "B": np.tanh(a)})
    model.optimize_parameters()
    with pytest.raises(FloatingPointError) as ei:
        model.check_finite(where="epoch 1, iters 2", params=True)
    assert "epoch 1, iters 2" in str(ei.value)


def test_clean_input_passes_params_sweep():
    model = _tiny_model()
    model.setup()
    a = np.random.RandomState(1).randn(2, 64, 64, 1).astype(np.float32)
    model.set_input({"A": a, "B": np.tanh(a)})
    model.optimize_parameters()
    model.check_finite(params=True)  # must not raise


def test_cli_flags_exist():
    cfg = parse_config(
        ["--model", "pix2pix", "--check_finite", "50", "--debug_nans"],
        train=True,
    )
    assert cfg.check_finite == 50
    assert cfg.debug_nans is True
