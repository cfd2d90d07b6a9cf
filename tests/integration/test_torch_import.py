"""Round-trip a PyTorch checkpoint through tools/import_torch_weights.py:
oracle torch net -> .pth -> converted framework checkpoint -> test-time
forward must match the torch forward (the MIGRATION.md loader contract)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(__file__))))

from tests.unit.test_torch_parity import TorchUNet, _nchw, _nhwc
from tools.import_torch_weights import main as import_main

from biasgan_tpu.config import parse_config
from biasgan_tpu.models import create_model


@pytest.mark.parametrize("norm", ["instance", "batch"])
def test_pth_import_roundtrip_forward_parity(tmp_path, norm):
    num_downs, ngf, nc = 5, 8, 2
    tG = TorchUNet(nc, nc, ngf, num_downs, norm)
    pth = tmp_path / "latest_net_G.pth"
    torch.save(tG.state_dict(), str(pth))

    model_args = [
        "--model", "pix2pix", "--dataset_mode", "synthetic",
        "--netG", f"unet_d{num_downs}", "--norm", norm,
        "--input_nc", str(nc), "--output_nc", str(nc), "--ngf", str(ngf),
        "--ndf", "8", "--crop_size", "32", "--batch_size", "1",
        "--checkpoints_dir", str(tmp_path / "ck"), "--name", "imp",
    ]
    rc = import_main(
        ["--pth", str(pth), "--net", "G", "--tag", "imported", "--"]
        + model_args
    )
    assert rc == 0

    # load through the normal test-time path
    cfg = parse_config(model_args + ["--epoch", "imported"], train=False)
    model = create_model(cfg)
    model.setup()
    model.eval()

    x = np.random.default_rng(0).normal(size=(1, 32, 32, nc)).astype(np.float32)
    model.set_input({"A": jnp.asarray(x), "B": jnp.asarray(np.zeros_like(x))})
    model.test()
    ours = np.asarray(model.get_current_visuals()["fake_B"])

    tG.eval()
    with torch.no_grad():
        ref = _nhwc(tG(_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_import_rejects_shape_mismatch(tmp_path):
    tG = TorchUNet(2, 2, 8, 5, "instance")
    pth = tmp_path / "g.pth"
    torch.save(tG.state_dict(), str(pth))
    with pytest.raises(SystemExit, match="mismatch|missing"):
        import_main(
            ["--pth", str(pth), "--net", "G", "--"]
            + [
                "--model", "pix2pix", "--dataset_mode", "synthetic",
                "--netG", "unet_d5", "--norm", "instance",
                "--input_nc", "2", "--output_nc", "2", "--ngf", "16",  # ngf differs
                "--crop_size", "32", "--batch_size", "1",
                "--checkpoints_dir", str(tmp_path / "ck"), "--name", "bad",
            ]
        )
