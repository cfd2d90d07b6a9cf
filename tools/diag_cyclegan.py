#!/usr/bin/env python
"""Controlled A/Bs on the judged line-9 config (CycleGAN 256^2 dual G/D,
bf16, batch 8) — the remat follow-up to the r5 fwd/bwd attribution
(BASELINE.md): the backward is BANDWIDTH-bound (648-650 GB/s achieved of
~819 peak, only 69-92 TF/s of 197), so trading recompute FLOPs for
stored-activation bytes is the one untried traffic lever. The r2/r3 remat
probes ran on the pix2pix primary config only (lost 23% / 7.6%); CycleGAN's
6-pass G chain stores ~4x the activations per param, so the answer does not
transfer automatically.

Usage: VARIANTS=base,remat_dots,remat python tools/diag_cyclegan.py [batch]
Same host-readback sync methodology as diag_primary.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.models.cyclegan import (
    CycleGANConfig,
    create_state,
    make_train_step,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
STEPS = 20
REPEATS = 2


def patch_remat(policy):
    """Rematerialize every generator/discriminator forward under ``policy``
    (same experiment as tools/diag_primary.py::patch_remat, aimed at the
    cyclegan module's own apply_net binding)."""
    import biasgan_tpu.models.common as common
    import biasgan_tpu.models.cyclegan as cg

    orig = common.apply_net
    policies = {
        "nothing_saveable": jax.checkpoint_policies.nothing_saveable,
        "dots": lambda prim, *_, **__: prim.name
        in ("conv_general_dilated", "dot_general"),
    }
    pol = policies[policy]

    def apply_net_remat(module, variables, x, train, rngs=None, ctx=None):
        def f(variables, x, rngs):
            return orig(module, variables, x, train, rngs, ctx)

        return jax.checkpoint(f, policy=pol)(variables, x, rngs)

    cg.apply_net = apply_net_remat


def run(tag):
    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    cfg = cls(
        model="cycle_gan", netG="resnet_9blocks", netD="basic",
        norm="instance", no_dropout=True, gan_mode="lsgan", pool_size=50,
        crop_size=256, input_nc=3, output_nc=3, batch_size=BATCH,
        ngf=64, ndf=64, steps_per_epoch=1000, compute_dtype="bfloat16",
        checkpoints_dir="/tmp/bgt_diag_cg", name="diag_cg",
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    a = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.float32)
    batch = {"A": a, "B": jnp.tanh(a)}

    def sync(losses):
        return float(jax.tree_util.tree_leaves(losses)[0])

    for i in range(3):
        state, losses, _ = step(state, batch, jax.random.fold_in(rng, i))
    sync(losses)
    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, losses, _ = step(
                state, batch, jax.random.fold_in(rng, 10 + r * STEPS + i)
            )
        sync(losses)
        best = min(best, time.perf_counter() - t0)
    rate = BATCH * STEPS / best
    print(json.dumps({"variant": tag, "samples_per_sec": round(rate, 1),
                      "batch": BATCH}), flush=True)


variants = (os.environ.get("VARIANTS") or "base,remat_dots,remat").split(",")
for v in variants:
    if v == "base":
        run(v)
    elif v == "remat_dots":
        patch_remat("dots")
        run(v)
    elif v == "remat":
        patch_remat("nothing_saveable")
        run(v)
    else:
        sys.exit(f"unknown variant {v!r}")
