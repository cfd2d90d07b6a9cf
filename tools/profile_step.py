#!/usr/bin/env python
"""Break the pix2pix 256^2 G+D train step into timed pieces on the real chip.

Every timing ends in a host readback of a scalar — the only reliable sync
through the axon tunnel (BASELINE.md, timing-methodology warning).

Usage: python tools/profile_step.py [batch] [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.models.pix2pix import (
    Pix2PixConfig,
    build_nets,
    create_state,
    make_train_step,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
STEPS = 30


def timeit(name, fn, *args):
    # warmup/compile
    out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s.astype(jnp.float32)).reshape(())[()]) if s.ndim else float(s)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(s.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:34s} {dt*1e3:8.2f} ms   {BATCH/dt:8.0f} samples/s")
    return dt


def main():
    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    cfg = cls(
        model="pix2pix", netG="unet_256", netD="basic", norm="batch",
        gan_mode="vanilla", pool_size=0, no_dropout=False,
        crop_size=256, input_nc=3, output_nc=3, batch_size=BATCH,
        ngf=64, ndf=64, steps_per_epoch=1000, compute_dtype=DTYPE,
        checkpoints_dir="/tmp/bgt_prof", name="prof",
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    G, D = build_nets(cfg)
    a = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.float32)
    b = jnp.tanh(a)
    batch = {"A": a, "B": b}
    ab = jnp.concatenate([a, b], axis=-1)
    gv, dv = state.nets["G"], state.nets["D"]
    print(f"batch={BATCH} dtype={DTYPE}")

    g_fwd = jax.jit(lambda v, x: G.apply(v, x, False))
    timeit("G fwd (eval)", g_fwd, gv, a)

    g_fwd_t = jax.jit(
        lambda v, x, r: G.apply(
            v, x, True, rngs={"dropout": r}, mutable=["batch_stats"]
        )[0]
    )
    timeit("G fwd (train)", g_fwd_t, gv, a, rng)

    def g_loss(params, v, x, y, r):
        out = G.apply(
            {**v, "params": params}, x, True, rngs={"dropout": r},
            mutable=["batch_stats"],
        )[0]
        return jnp.mean(jnp.abs(out - y))

    g_grad = jax.jit(lambda v, x, y, r: jax.grad(g_loss)(v["params"], v, x, y, r))
    timeit("G fwd+bwd (L1 only)", g_grad, gv, a, b, rng)

    d_fwd = jax.jit(
        lambda v, x: D.apply(v, x, True, mutable=["batch_stats"])[0]
    )
    timeit("D fwd (train)", d_fwd, dv, ab)

    def d_loss(params, v, x):
        out = D.apply({**v, "params": params}, x, True, mutable=["batch_stats"])[0]
        return jnp.mean(jnp.square(out - 1.0))

    d_grad = jax.jit(lambda v, x: jax.grad(d_loss)(v["params"], v, x))
    timeit("D fwd+bwd", d_grad, dv, ab)

    step = jax.jit(make_train_step(cfg))
    full = timeit("FULL train step", step, state, batch, rng)

    lowered = jax.jit(make_train_step(cfg)).lower(state, batch, rng).compile()
    try:
        an = lowered.cost_analysis()
        an = an[0] if isinstance(an, list) else an
        fl = an.get("flops", 0)
        by = an.get("bytes accessed", 0)
        print(f"XLA cost: {fl/1e12:.2f} TFLOP/step -> {fl/full/1e12:.1f} TFLOP/s "
              f"achieved; {by/1e9:.1f} GB/step -> {by/full/1e9:.0f} GB/s")
    except Exception as e:
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
