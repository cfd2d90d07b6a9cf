#!/usr/bin/env python
"""Data-fed throughput: stream real HDF5 through the threaded DataLoader
into the judged 256^2 pix2pix train step on the real chip (SURVEY.md
section 7 hard part 6 — the input pipeline must hide file decode behind
the device step or the throughput target dies on the host).

Reports three rates with host-readback sync:
  device-only  — repeat one in-memory batch (upper bound)
  loader-only  — drain the DataLoader with no device work
  data-fed     — loader -> device per step, the honest end-to-end number

Usage: python tools/bench_data_fed.py [--batch 32] [--steps 24]
       [--threads 4] [--dtype bfloat16] [--root /tmp/bgt_datafed]
Dataset (generated once, ~1 GB): trainA/trainB x 3 variables, 512 frames
on a 288x576 grid — crops at 256 are real strided slab reads with
dateline wraparound.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from biasgan_tpu import enable_compile_cache, respect_platform_env

respect_platform_env()
enable_compile_cache()

T, H, W = 512, 288, 576
VARS = ("t2m", "precip", "slp")


def ensure_dataset(root: str) -> None:
    import h5py

    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    base = rng.normal(280.0, 12.0, (T, H, W)).astype(np.float32)
    for side, bias in (("A", 3.0), ("B", 0.0)):
        d = os.path.join(root, "train" + side)
        os.makedirs(d, exist_ok=True)
        with h5py.File(os.path.join(d, "f.h5"), "w") as f:
            f["t2m"] = base + bias
            f["precip"] = rng.gamma(2.0, 2.0, (T, H, W)).astype(np.float32)
            f["slp"] = rng.normal(1013.0, 8.0, (T, H, W)).astype(np.float32)
    with open(marker, "w") as f:
        f.write("ok")
    print(f"generated dataset under {root} in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--root", default="/tmp/bgt_datafed")
    ap.add_argument("--crop", type=int, default=256)  # CPU smoke: 64
    ap.add_argument("--netG", default="unet_256")  # CPU smoke: unet_d4
    args = ap.parse_args()

    ensure_dataset(args.root)

    import jax
    import jax.numpy as jnp

    from biasgan_tpu.config import parse_config
    from biasgan_tpu.data import create_dataset
    from biasgan_tpu.models.pix2pix import create_state, make_train_step

    cfg = parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "climate",
            "--dataroot", args.root, "--phase", "train",
            "--netG", args.netG, "--netD", "basic", "--norm", "batch",
            "--gan_mode", "vanilla", "--crop_size", str(args.crop),
            "--input_nc", "3", "--output_nc", "3",
            "--batch_size", str(args.batch), "--ngf", "64", "--ndf", "64",
            "--num_threads", str(args.threads),
            "--compute_dtype", args.dtype,
            "--checkpoints_dir", "/tmp/bgt_datafed_ck", "--name", "datafed",
        ],
        train=True,
    )
    loader = create_dataset(cfg)
    cfg.steps_per_epoch = max(len(loader), 1)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    rng = jax.random.PRNGKey(1)

    def to_device(data):
        return {
            k: jnp.asarray(v)
            for k, v in data.items()
            if not k.endswith("_paths")
        }

    def sync(losses):
        float(losses["G_GAN"])  # host readback: the only reliable sync here

    # -- warmup / compile on one real batch -------------------------------
    it = iter(loader)
    first = to_device(next(it))
    state, losses, _ = step(state, first, rng)
    sync(losses)

    # -- device-only: repeat the resident batch ---------------------------
    for i in range(2):
        state, losses, _ = step(state, first, jax.random.fold_in(rng, i))
    sync(losses)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, losses, _ = step(state, first, jax.random.fold_in(rng, 10 + i))
    sync(losses)
    dev_rate = args.batch * args.steps / (time.perf_counter() - t0)

    # -- loader-only ------------------------------------------------------
    def batches(n):
        nonlocal it
        got = 0
        while got < n:
            try:
                yield next(it)
            except StopIteration:
                it = iter(loader)
                continue
            got += 1

    t0 = time.perf_counter()
    for data in batches(args.steps):
        pass
    load_rate = args.batch * args.steps / (time.perf_counter() - t0)

    # -- data-fed ---------------------------------------------------------
    stall = 0.0
    t0 = time.perf_counter()
    tm = t0
    for i, data in enumerate(batches(args.steps)):
        stall += time.perf_counter() - tm
        state, losses, _ = step(state, to_device(data), jax.random.fold_in(rng, 50 + i))
        tm = time.perf_counter()
    sync(losses)
    wall = time.perf_counter() - t0
    fed_rate = args.batch * args.steps / wall

    print(json.dumps({
        "metric": "pix2pix_256_data_fed",
        "value": round(fed_rate, 1),
        "unit": "samples/sec/chip",
        "device_only": round(dev_rate, 1),
        "loader_only": round(load_rate, 1),
        "fed_vs_device": round(fed_rate / dev_rate, 3),
        "loader_stall_frac": round(stall / wall, 3),
        "batch": args.batch,
        "threads": args.threads,
        "host_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
