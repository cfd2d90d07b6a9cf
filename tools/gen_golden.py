#!/usr/bin/env python
"""Regenerate the golden-run fixtures (tests/golden/*.json).

Run ONLY after an INTENTIONAL semantics change (rng stream derivation,
loss math, optimizer math, data synthesis):

    python tools/gen_golden.py

Self-configures the EXACT backend the test suite uses (tests/conftest.py:
CPU, 8 virtual devices, the same compile cache) — goldens generated under a
different XLA compilation setup can drift by ~1e-3 over a 6-step CycleGAN
trajectory, past the 5e-4 replay tolerance.

The fixtures pin fixed-seed training trajectories (per-step losses) plus a
final validation-metric bundle; tests/integration/test_golden_run.py and
test_golden_cyclegan.py replay them. The CycleGAN golden additionally pins a
replay-pool checksum — fused-vs-unfused equivalence tests compare the fused
path against the unfused path *within one version* and would miss a
semantics drift that moves both (VERDICT r2 weak #7); a committed trajectory
cannot.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/bgt_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.data import create_dataset
from biasgan_tpu.data.synthetic import SyntheticConfig
from biasgan_tpu.ops.metrics import validation_metrics

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def run_trajectory(cfg, create_state, make_train_step, epochs=3):
    loader = create_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    i = 0
    hist = []
    visuals = None
    for epoch in range(epochs):
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
    return state, hist, visuals


def gen_pix2pix():
    from biasgan_tpu.models.pix2pix import (
        Pix2PixConfig,
        create_state,
        make_train_step,
    )

    cls = merge_config_cls(TrainConfig, Pix2PixConfig, SyntheticConfig)
    cfg = cls(
        model="pix2pix", dataset_mode="synthetic", netG="unet_d4", netD="basic",
        norm="batch", gan_mode="vanilla", pool_size=0, crop_size=64,
        input_nc=1, output_nc=1, batch_size=4, ngf=16, ndf=16,
        synthetic_samples=8, in_graph_aug=True, steps_per_epoch=2, seed=0,
        checkpoints_dir="/tmp/bgt_golden_gen", name="g",
    )
    _, hist, visuals = run_trajectory(cfg, create_state, make_train_step)
    m = jax.jit(validation_metrics)(visuals["fake_B"], visuals["real_B"])
    out = {
        "losses": hist,
        "final_val": {k: float(v) for k, v in m.items()},
    }
    path = os.path.join(GOLDEN_DIR, "pix2pix_tiny_golden.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ({len(hist)} steps)")


def gen_cyclegan():
    from biasgan_tpu.models.cyclegan import (
        CycleGANConfig,
        create_state,
        make_train_step,
    )

    cls = merge_config_cls(TrainConfig, CycleGANConfig, SyntheticConfig)
    cfg = cls(
        model="cycle_gan", dataset_mode="synthetic", netG="resnet_3blocks",
        netD="basic", norm="instance", no_dropout=True, gan_mode="lsgan",
        pool_size=4, crop_size=32, input_nc=1, output_nc=1, batch_size=2,
        ngf=8, ndf=8, synthetic_samples=4, in_graph_aug=True,
        steps_per_epoch=2, seed=0,
        checkpoints_dir="/tmp/bgt_golden_gen", name="cg",
    )
    state, hist, visuals = run_trajectory(cfg, create_state, make_train_step)
    # pool checksum: per-buffer f32 sums pin the replay-pool contents (the
    # query/scatter semantics) without committing full field buffers
    pool_sums = {
        jax.tree_util.keystr(path): float(jnp.sum(leaf.astype(jnp.float32)))
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.pools)
    }
    m = jax.jit(validation_metrics)(visuals["fake_B"], visuals["real_B"])
    out = {
        "losses": hist,
        "pool_sums": pool_sums,
        "final_val": {k: float(v) for k, v in m.items()},
    }
    path = os.path.join(GOLDEN_DIR, "cyclegan_tiny_golden.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ({len(hist)} steps)")


if __name__ == "__main__":
    gen_pix2pix()
    gen_cyclegan()
