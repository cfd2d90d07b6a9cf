#!/usr/bin/env python
"""Diagnostics for the primary-metric plateau (~1370 samples/s, HBM-bound):
time the judged pix2pix 256^2 b128 step under controlled variations to find
where the remaining bytes/cycles go.

Variants (comma list in VARIANTS env or argv[1]; default all):
  base       — judged config verbatim (bench.py defaults, scan K=4)
  rbg        — jax_default_prng_impl=rbg (cheap XLA RBG vs threefry for the
               in-graph dropout/aug keys; diagnostic AND candidate default)
  nodrop     — no_dropout=True (NOT the judged config; sizes dropout's cost)
  noscan     — scan K=1 (dispatch overhead check)

Usage: python tools/diag_primary.py [variants]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

variants = (sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "VARIANTS", "base,nodrop,noscan")).split(",")

import jax

if "rbg" in variants:
    # the PRNG impl must be set before any key creation, so it would apply
    # to EVERY variant in this process and silently corrupt the baseline
    # rows — enforce rbg-alone
    if len(variants) > 1:
        sys.exit("run the rbg variant alone: python tools/diag_primary.py rbg")
    jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp

from biasgan_tpu import enable_compile_cache, respect_platform_env

respect_platform_env()
enable_compile_cache()
from biasgan_tpu.config import merge_config_cls, TrainConfig
from biasgan_tpu.models.common import make_scan_step
from biasgan_tpu.models.pix2pix import Pix2PixConfig, create_state, make_train_step

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
STEPS = int(os.environ.get("BENCH_STEPS", "4"))


def run(tag: str, no_dropout: bool, scan_k: int, adam_mu: str = "float32",
        repeats: int = 3):
    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    cfg = cls(
        model="pix2pix", netG="unet_256", netD="basic", norm="batch",
        gan_mode="vanilla", pool_size=0, no_dropout=no_dropout,
        crop_size=256, input_nc=3, output_nc=3, batch_size=BATCH,
        ngf=64, ndf=64, steps_per_epoch=1000, compute_dtype="bfloat16",
        adam_mu_dtype=adam_mu,
        checkpoints_dir="/tmp/bgt_diag", name="diag",
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    step_fn = make_train_step(cfg)
    if scan_k > 1:
        step_fn = make_scan_step(step_fn, scan_k)
    step = jax.jit(step_fn, donate_argnums=0)
    a = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.float32)
    batch = {"A": a, "B": jnp.tanh(a)}
    if scan_k > 1:
        batch = {k: jnp.broadcast_to(v, (scan_k,) + v.shape) for k, v in batch.items()}

    def sync(l):
        float(jnp.sum(l["G_GAN"]))

    for i in range(2):
        state, losses, _ = step(state, batch, jax.random.fold_in(rng, i))
    sync(losses)
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, losses, _ = step(
                state, batch, jax.random.fold_in(rng, 10 + r * STEPS + i)
            )
        sync(losses)
        best = min(best, time.perf_counter() - t0)
    rate = BATCH * STEPS * scan_k / best
    print(json.dumps({"variant": tag, "samples_per_sec": round(rate, 1),
                      "prng": jax.config.jax_default_prng_impl,
                      "scan_k": scan_k, "no_dropout": no_dropout,
                      "adam_mu": adam_mu}), flush=True)


def patch_remat(policy):
    """Experiment: rematerialize net forwards under ``policy``:
      nothing_saveable — full remat (r2: LOST 23%)
      dots             — save only contraction (conv/dot) outputs,
                         rematerialize the elementwise/norm chains between
                         them (the r2-untried SELECTIVE policy: keeps the
                         expensive ops' results, drops the cheap-to-recompute
                         intermediates that only cost HBM)
    """
    import biasgan_tpu.models.common as common
    import biasgan_tpu.models.pix2pix as p2p

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

    common.apply_net = apply_net_remat
    p2p.apply_net = apply_net_remat


for v in variants:
    if v == "base" or v == "rbg":
        run(v, no_dropout=False, scan_k=4)
    elif v == "nodrop":
        run(v, no_dropout=True, scan_k=4)
    elif v == "noscan":
        run(v, no_dropout=False, scan_k=1)
    elif v == "adam_mu_bf16":
        run(v, no_dropout=False, scan_k=4, adam_mu="bfloat16")
    elif v == "remat":
        patch_remat("nothing_saveable")
        run(v, no_dropout=False, scan_k=4)
    elif v == "remat_dots":
        patch_remat("dots")
        run(v, no_dropout=False, scan_k=4)
    elif v == "pallas_conv":
        os.environ["BIASGAN_PALLAS_CONV"] = "1"
        run(v, no_dropout=False, scan_k=4)
    else:
        sys.exit(f"unknown variant {v!r}")
