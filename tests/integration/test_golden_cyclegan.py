"""CycleGAN golden-run regression (VERDICT r2 item 6): a fixed-seed tiny
CycleGAN trajectory — losses per step, final replay-pool checksums, and a
final metric bundle — must match the committed golden record. The fused
3-dispatch G loss and the in-graph pools are the most restructured code in
the model; the fused-vs-unfused equivalence tests compare two paths within
ONE version and would miss a semantics drift that moves both. A committed
trajectory cannot.

Regenerate (only after an INTENTIONAL semantics change) with
``BIASGAN_PLATFORM=cpu python tools/gen_golden.py``.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.data import create_dataset
from biasgan_tpu.data.synthetic import SyntheticConfig
from biasgan_tpu.models.cyclegan import (
    CycleGANConfig,
    create_state,
    make_train_step,
)
from biasgan_tpu.ops.metrics import validation_metrics

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden",
                      "cyclegan_tiny_golden.json")


def test_cyclegan_trajectory_matches_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)

    cls = merge_config_cls(TrainConfig, CycleGANConfig, SyntheticConfig)
    cfg = cls(
        model="cycle_gan", dataset_mode="synthetic", netG="resnet_3blocks",
        netD="basic", norm="instance", no_dropout=True, gan_mode="lsgan",
        pool_size=4, crop_size=32, input_nc=1, output_nc=1, batch_size=2,
        ngf=8, ndf=8, synthetic_samples=4, in_graph_aug=True,
        steps_per_epoch=2, seed=0,
        checkpoints_dir="/tmp/bgt_golden_cg_t", name="cg",
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

    pool_sums = {
        jax.tree_util.keystr(path): float(jnp.sum(leaf.astype(jnp.float32)))
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.pools)
    }
    assert set(pool_sums) == set(golden["pool_sums"])
    for k, v in golden["pool_sums"].items():
        np.testing.assert_allclose(pool_sums[k], v, rtol=5e-4, atol=5e-4,
                                   err_msg=k)

    m = jax.jit(validation_metrics)(visuals["fake_B"], visuals["real_B"])
    for k, v in golden["final_val"].items():
        np.testing.assert_allclose(float(m[k]), v, rtol=5e-4, atol=5e-5, err_msg=k)
