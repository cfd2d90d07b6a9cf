"""End-to-end training on the climate HDF5 path (judged config line 8:
paired bias correction of multi-variable gridded fields): h5py patch reads ->
stats riding in the batch -> in-graph standardization + periodic-lon-aware
augmentation -> jitted pix2pix step. Asserts the standardization actually
happened in-graph (losses are in standardized units) and training descends."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.config import parse_config
from biasgan_tpu.data import create_dataset
from biasgan_tpu.models.pix2pix import create_state, make_train_step

H, W, T = 24, 48, 6


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("climtrain")
    rng = np.random.default_rng(0)
    base = rng.normal(280.0, 12.0, (T, H, W)).astype(np.float32)
    for side, field in (("A", base + 3.0), ("B", base)):  # A = biased model
        d = tmp / ("train" + side)
        d.mkdir()
        with h5py.File(d / "f.h5", "w") as f:
            f["t2m"] = field
            f["precip"] = rng.gamma(2.0, 2.0, (T, H, W)).astype(np.float32)
    return tmp


def test_climate_training_descends(root):
    cfg = parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "climate",
            "--dataroot", str(root), "--phase", "train",
            "--netG", "unet_d4", "--norm", "instance", "--no_dropout",
            "--crop_size", "16", "--netD", "pixel",
            "--input_nc", "2", "--output_nc", "2", "--batch_size", "4",
            "--ngf", "8", "--ndf", "8", "--gan_mode", "lsgan",
            "--aug_lon_roll", "--serial_batches",
            "--checkpoints_dir", str(root / "ck"), "--name", "c",
        ],
        train=True,
    )
    # climate dataset defaults flowed in via config_defaults
    assert cfg.in_graph_aug and cfg.netG_activation == "none"
    loader = create_dataset(cfg)
    cfg.steps_per_epoch = len(loader)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    hist = []
    i = 0
    for epoch in range(8):
        for batch in loader:
            b = {
                k: jnp.asarray(v)
                for k, v in batch.items()
                if not k.endswith("_paths")
            }
            # raw fields reach the step in PHYSICAL units (t2m ~ 280 K)
            assert float(b["A"][..., 1].mean()) > 100.0
            state, losses, visuals = step(state, b, jax.random.fold_in(rng, i))
            hist.append({k: float(v) for k, v in losses.items()})
            i += 1
    for h in hist:
        assert all(np.isfinite(v) for v in h.values()), h
    # standardization happened in-graph: targets are ~N(0,1), so the initial
    # L1 (x lambda=100) is O(100), not O(10000) (physical units)
    assert hist[0]["G_L1"] < 500.0
    # adversarial training fluctuates step to step; require that the second
    # half reaches below the early average (robust descent signal)
    first = np.mean([h["G_L1"] for h in hist[:4]])
    best_late = np.min([h["G_L1"] for h in hist[len(hist) // 2 :]])
    assert best_late < first, (first, best_late)
    # visuals are standardized fields around 0
    assert abs(float(visuals["real_B"].mean())) < 2.0
