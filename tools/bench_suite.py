#!/usr/bin/env python
"""Measure every judged config (BASELINE.json lines 7-11) on the real chip
and print one JSON line per row for BASELINE.md's measured table.

All timings use host-readback sync (see BASELINE.md methodology warning).

Usage: python tools/bench_suite.py [--steps N] [--configs a,b,...]
Configs: tiny | paired128 | cyclegan256 | globe | (pix2pix256 = bench.py)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from biasgan_tpu.config import TrainConfig, merge_config_cls


def _sync(tree) -> None:
    leaf = jax.tree_util.tree_leaves(tree)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def _time_steps(step, state, batch, rng, steps: int):
    for i in range(2):
        state, losses, _ = step(state, batch, jax.random.fold_in(rng, i))
    _sync(losses)
    t0 = time.perf_counter()
    for i in range(steps):
        state, losses, _ = step(state, batch, jax.random.fold_in(rng, 100 + i))
    _sync(losses)
    return time.perf_counter() - t0


def bench_pix2pix(name: str, crop: int, nc: int, batch: int, steps: int,
                  netG: str, dtype: str = "bfloat16"):
    from biasgan_tpu.models.pix2pix import Pix2PixConfig, create_state, make_train_step

    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    cfg = cls(
        model="pix2pix", netG=netG, netD="basic", norm="batch",
        gan_mode="vanilla", pool_size=0, crop_size=crop,
        input_nc=nc, output_nc=nc, batch_size=batch, ngf=64, ndf=64,
        steps_per_epoch=1000, compute_dtype=dtype,
        checkpoints_dir="/tmp/bgt_suite", name=name,
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    a = jax.random.normal(jax.random.PRNGKey(1), (batch, crop, crop, nc))
    dt = _time_steps(step, state, {"A": a, "B": jnp.tanh(a)}, rng, steps)
    return {"metric": name, "value": round(batch * steps / dt, 1),
            "unit": "samples/sec/chip", "dtype": dtype, "batch": batch}


def bench_tiny_scan(steps: int, k: int = 16, dtype: str = "bfloat16"):
    """Judged tiny config with the multi-step device loop: one dispatch scans
    k optimization steps (models/common.py make_scan_step), amortizing the
    per-dispatch latency that dominates at 64x64 batch 4."""
    from biasgan_tpu.models.common import make_scan_step
    from biasgan_tpu.models.pix2pix import Pix2PixConfig, create_state, make_train_step

    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    cfg = cls(
        model="pix2pix", netG="unet_d4", netD="basic", norm="batch",
        gan_mode="vanilla", pool_size=0, crop_size=64, input_nc=1,
        output_nc=1, batch_size=4, ngf=64, ndf=64, steps_per_epoch=1000,
        compute_dtype=dtype, checkpoints_dir="/tmp/bgt_suite", name="tiny_scan",
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    scan = jax.jit(make_scan_step(make_train_step(cfg), k), donate_argnums=0)
    a = jax.random.normal(jax.random.PRNGKey(1), (k, 4, 64, 64, 1))
    sb = {"A": a, "B": jnp.tanh(a)}
    state, lk, _ = scan(state, sb, rng)
    _sync(lk)
    t0 = time.perf_counter()
    m = max(steps // 4, 2)
    for i in range(m):
        state, lk, _ = scan(state, sb, jax.random.fold_in(rng, i))
    _sync(lk)
    dt = time.perf_counter() - t0
    return {"metric": "tiny_pix2pix_64_scan16", "value": round(4 * k * m / dt, 1),
            "unit": "samples/sec/chip", "dtype": dtype, "batch": 4,
            "steps_per_call": k}


def bench_cyclegan(steps: int, batch: int = 8, dtype: str = "bfloat16"):
    from biasgan_tpu.models.cyclegan import CycleGANConfig, create_state, make_train_step

    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    cfg = cls(
        model="cycle_gan", netG="resnet_9blocks", netD="basic", norm="instance",
        no_dropout=True, gan_mode="lsgan", pool_size=50, crop_size=256,
        input_nc=3, output_nc=3, batch_size=batch, ngf=64, ndf=64,
        steps_per_epoch=1000, compute_dtype=dtype,
        checkpoints_dir="/tmp/bgt_suite", name="cyclegan256",
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    a = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))
    dt = _time_steps(step, state, {"A": a, "B": jnp.tanh(a)}, rng, steps)
    import os

    # fused-train A/B: BIASGAN_FUSED_BLOCK=1 BIASGAN_FUSED_TRAIN=1 routes
    # the block convs through conv3x3_fused_t (the --fused_blocks training
    # path); the metric name records which program was measured
    fused = os.environ.get("BIASGAN_FUSED_BLOCK", "") not in ("", "0") and (
        os.environ.get("BIASGAN_FUSED_TRAIN") == "1"
    )
    name = "cyclegan_256_dual_G+D_step" + ("_fused_train" if fused else "")
    return {"metric": name, "value": round(batch * steps / dt, 1),
            "unit": "samples/sec/chip", "dtype": dtype, "batch": batch}


def bench_globe(steps: int, dtype: str = "bfloat16", staged: bool = False,
                n_fields: int = 1):
    """Full-globe 721x1440 single-chip inference (resnet_9blocks G, 3ch),
    periodic longitude. ``staged`` runs stem+downs / blocks / ups+head as
    three separate jit calls (generators.py ``stage``) — the dispatch pattern
    the fused-block pallas path needs to avoid XLA's cross-region scheduling
    penalty (async dispatch hides the extra enqueues). ``n_fields`` batches
    N fields per dispatch (``infer.py --batch_size N``) — the Mpx/s is still
    per field-set, i.e. total pixels / wall time."""
    from biasgan_tpu.nn import define_G, init_params
    from biasgan_tpu.parallel import pad_to_multiple

    G = define_G("resnet_9blocks", output_nc=3, ngf=64, norm="instance",
                 w_mode="wrap", compute_dtype={"bfloat16": jnp.bfloat16}.get(dtype),
                 out_activation="none")
    x = jax.random.normal(jax.random.PRNGKey(0), (n_fields, 721, 1440, 3))
    v = init_params(G, jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    if staged:
        from functools import partial

        # donate the single-use staged intermediates (infer.py does the same)
        @partial(jax.jit, static_argnames="stage", donate_argnums=(1,))
        def run_stage(v, h, stage):
            return G.apply(v, h, False, stage=stage)

        def run(v, x):
            xp, h0 = pad_to_multiple(x, 4, axis=1, mode="reflect")
            h = run_stage(v, xp, "pre")
            h = run_stage(v, h, "blocks")
            return run_stage(v, h, "post")[:, : x.shape[1]]
    else:

        @jax.jit
        def run(v, x):
            xp, h0 = pad_to_multiple(x, 4, axis=1, mode="reflect")
            y = G.apply(v, xp, False)
            return y[:, :h0]

    y = run(v, x); _sync(y)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = run(v, x)
    _sync(y)
    dt = (time.perf_counter() - t0) / steps
    mpx = n_fields * 721 * 1440 / dt / 1e6
    import os

    fused = os.environ.get("BIASGAN_FUSED_BLOCK", "") not in ("", "0")
    name = "globe_721x1440_inference" + ("_fused" if fused else "") + (
        "_staged" if staged else "")
    rec = {"metric": name, "value": round(mpx, 1),
           "unit": "Mpx/sec/chip", "dtype": dtype,
           "ms_per_field": round(dt * 1e3 / n_fields, 1)}
    if n_fields != 1:
        rec["n_fields"] = n_fields
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--configs", type=str, default="tiny,paired128,cyclegan256,globe")
    ap.add_argument("--globe_batch", type=int, default=1,
                    help="fields per dispatch for the globe configs "
                    "(field-batching probe; infer.py --batch_size N)")
    args = ap.parse_args()
    for c in args.configs.split(","):
        if c == "tiny":
            r = bench_pix2pix("tiny_pix2pix_64", 64, 1, 4, args.steps, "unet_d4")
        elif c == "tiny_scan":
            r = bench_tiny_scan(args.steps)
        elif c == "paired128":
            r = bench_pix2pix("paired_128x3ch", 128, 3, 32, args.steps, "unet_128")
        elif c == "cyclegan256":
            r = bench_cyclegan(args.steps)
        elif c == "globe":
            r = bench_globe(max(args.steps // 4, 3), n_fields=args.globe_batch)
        elif c == "globe_staged":
            r = bench_globe(max(args.steps // 4, 3), staged=True,
                            n_fields=args.globe_batch)
        else:
            raise SystemExit(f"unknown config {c}")
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
