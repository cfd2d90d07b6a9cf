"""Golden-run statistical regression (SURVEY.md section 4 item 4): a fixed-seed
tiny pix2pix training trajectory and its final spectral/PDF validation bundle
must match the committed golden record. Catches silent semantic drift in any
layer — data synthesis, augmentation rng, network math, loss math, optimizer,
metrics — that shape/parity tests cannot.

Regenerate (only after an INTENTIONAL semantics change) with the snippet in
the git history that produced tests/golden/pix2pix_tiny_golden.json.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.data import create_dataset
from biasgan_tpu.data.synthetic import SyntheticConfig
from biasgan_tpu.models.pix2pix import Pix2PixConfig, create_state, make_train_step
from biasgan_tpu.ops.metrics import validation_metrics

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden",
                      "pix2pix_tiny_golden.json")


def test_trajectory_matches_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)

    cls = merge_config_cls(TrainConfig, Pix2PixConfig, SyntheticConfig)
    cfg = cls(
        model="pix2pix", dataset_mode="synthetic", netG="unet_d4", netD="basic",
        norm="batch", gan_mode="vanilla", pool_size=0, crop_size=64,
        input_nc=1, output_nc=1, batch_size=4, ngf=16, ndf=16,
        synthetic_samples=8, in_graph_aug=True, steps_per_epoch=2, seed=0,
        checkpoints_dir="/tmp/bgt_golden_t", name="g",
    )
    loader = create_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    i = 0
    hist = []
    for epoch in range(3):
        loader.epoch = epoch
        for batch in loader:
            b = {
                k: jnp.asarray(v)
                for k, v in batch.items()
                if not k.endswith("_paths")
            }
            state, losses, visuals = step(state, b, jax.random.fold_in(rng, i))
            hist.append({k: float(v) for k, v in losses.items()})
            i += 1

    assert len(hist) == len(golden["losses"])
    for got, want in zip(hist, golden["losses"]):
        for k, v in want.items():
            np.testing.assert_allclose(got[k], v, rtol=5e-4, atol=5e-5, err_msg=k)

    m = jax.jit(validation_metrics)(visuals["fake_B"], visuals["real_B"])
    for k, v in golden["final_val"].items():
        np.testing.assert_allclose(float(m[k]), v, rtol=5e-4, atol=5e-5, err_msg=k)
