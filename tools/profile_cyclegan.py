#!/usr/bin/env python
"""Break the CycleGAN 256^2 dual-G/D train step into timed pieces on the
real chip (same host-readback sync methodology as profile_step.py).

Usage: python tools/profile_cyclegan.py [batch] [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.models.cyclegan import (
    CycleGANConfig,
    build_nets,
    create_state,
    make_train_step,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
STEPS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(s.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:40s} {dt*1e3:8.2f} ms   {BATCH/dt:8.1f} samples/s", flush=True)
    return dt


def main():
    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    cfg = cls(
        model="cycle_gan", netG="resnet_9blocks", netD="basic",
        norm="instance", no_dropout=True, gan_mode="lsgan", pool_size=50,
        crop_size=256, input_nc=3, output_nc=3, batch_size=BATCH,
        ngf=64, ndf=64, steps_per_epoch=1000, compute_dtype=DTYPE,
        checkpoints_dir="/tmp/bgt_prof", name="prof_cg",
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    gs, ds = build_nets(cfg)
    G_A, D_A = gs["G_A"], ds["D_A"]
    a = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.float32)
    b = jnp.tanh(a)
    gva, dva = state.nets["G_A"], state.nets["D_A"]
    print(f"batch={BATCH} dtype={DTYPE}", flush=True)

    # ONLY=gfwd,gbwd,dfwd,fused,plain selects pieces (each cold compile is
    # slow through the axon tunnel; the persistent cache deadlocks there)
    import os

    only = set((os.environ.get("ONLY") or "gfwd,gbwd,dfwd,fused,plain").split(","))

    if "gfwd" in only:
        g_fwd = jax.jit(lambda v, x: G_A.apply(v, x, False))
        t_gf = timeit("G fwd (1 pass)", g_fwd, gva, a)
        # resnet_9blocks fwd FLOPs at 256^2 ~= 96 GF/sample
        print(f"  -> G fwd MFU ~ {96e9 * BATCH / t_gf / 197e12 * 100:.0f}% of bf16 peak")

    if "gbwd" in only:
        def g_l1(params, v, x, y):
            out = G_A.apply({**v, "params": params}, x, False)
            return jnp.mean(jnp.abs(out - y))

        g_grad = jax.jit(lambda v, x, y: jax.grad(g_l1)(v["params"], v, x, y))
        t_gb = timeit("G fwd+bwd (L1 only)", g_grad, gva, a, b)
        print(f"  -> fwd+bwd MFU ~ {3 * 96e9 * BATCH / t_gb / 197e12 * 100:.0f}% of bf16 peak")

    if "dfwd" in only:
        d_fwd = jax.jit(lambda v, x: D_A.apply(v, x, False))
        timeit("D fwd (1 pass)", d_fwd, dva, a)

    if "fused" in only:
        step_fused = jax.jit(make_train_step(cfg, fuse_g=True))
        timeit("FULL step (fused G, 3 dispatches)", step_fused, state, {"A": a, "B": b}, rng)

    if "plain" in only:
        step_plain = jax.jit(make_train_step(cfg, fuse_g=False))
        timeit("FULL step (unfused G, 6 dispatches)", step_plain, state, {"A": a, "B": b}, rng)


if __name__ == "__main__":
    main()
