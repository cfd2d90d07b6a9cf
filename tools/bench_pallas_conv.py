#!/usr/bin/env python
"""Measure the Pallas 3x3 conv kernel against XLA's conv emitter on the
real chip — the experiment the r2 perf attribution was missing (VERDICT r2
item 1, SURVEY.md section 7 PR6).

Shapes are the judged hot ops:
  resnet_b8   (8, 64, 64, 256)->256   CycleGAN 256^2 training block conv
  resnet_b16  (16, 64, 64, 256)->256  CycleGAN b16
  globe       (1, 180, 360, 256)->256 full-globe inference block conv
  unet_mid    (128, 32, 32, 256)->256 3x3-shaped probe at unet b128 widths

Each timed with a host readback as the sync point (block_until_ready is a
no-op through the axon tunnel — BASELINE.md). Chained iterations keep the
device busy; per-call time = window / iters. Run ONE at a time on the TPU.

Usage: python tools/bench_pallas_conv.py [shape ...] [--act relu] [--dtype bfloat16]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from biasgan_tpu.ops.pallas_conv import conv3x3_pallas, reference_conv3x3

SHAPES = {
    "resnet_b8": (8, 64, 64, 256, 256),
    "resnet_b16": (16, 64, 64, 256, 256),
    "globe": (1, 180, 360, 256, 256),
    "unet_mid": (128, 32, 32, 256, 256),
}


def bench(fn, x, kern, bias, res, iters=50, reps=3):
    """Chained apply: y = fn(x) then feed y back (same shape when cout==cin)
    so iterations serialize on the device; sync via host readback."""

    @jax.jit
    def chain(x0):
        def body(h, xx):
            return fn(xx, kern, bias, res)

        return jax.lax.fori_loop(0, iters, body, x0)

    y = chain(x)  # compile + warm
    float(jnp.sum(y[..., :1].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = chain(x)
        float(jnp.sum(y[..., :1].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_gemm_ceiling(name, n, h, w, c, cout, dtype, iters=50):
    """The MXU ceiling for ANY matmul decomposition of this conv: the same
    FLOPs as 9 (N*H*W, C)x(C, Cout) taps and as one im2col
    (N*H*W, 9C)x(9C, Cout) GEMM, measured as pure XLA matmuls."""
    m = n * h * w
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    a = (jax.random.normal(k1, (m, c)) * 0.1).astype(dtype)
    b9 = (jax.random.normal(k2, (9, c, cout)) * 0.1).astype(dtype)
    ai = (jax.random.normal(k1, (m, 9 * c)) * 0.1).astype(dtype)
    bi = (jax.random.normal(k3, (9 * c, cout)) * 0.1).astype(dtype)
    fl = 2 * m * 9 * c * cout

    @jax.jit
    def taps(x0):
        def body(i, xx):  # chain on the carry so nothing hoists
            y = jnp.zeros((m, cout), jnp.float32)
            for t in range(9):
                y = y + jnp.dot(xx, b9[t], preferred_element_type=jnp.float32)
            return (y * 0.1).astype(dtype)

        return jax.lax.fori_loop(0, iters, body, x0)

    @jax.jit
    def im2col(x0):
        def body(i, xx):
            y = jnp.dot(xx, bi, preferred_element_type=jnp.float32)
            return jnp.concatenate([(y * 0.1).astype(dtype)] * 9, axis=-1)

        return jax.lax.fori_loop(0, iters, body, x0)

    for tag, fn, x0 in (("9taps", taps, a), ("im2col", im2col, ai)):
        y = fn(x0)
        float(jnp.sum(y[:1, :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        y = fn(x0)
        float(jnp.sum(y[:1, :1].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"gemm_ceiling {name} {tag}: {dt*1e3:.3f} ms  "
              f"{fl/dt/1e12:.1f} TF/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shapes", nargs="*", default=list(SHAPES))
    ap.add_argument("--act", default="relu")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--variant", default="tap9")
    ap.add_argument("--gemm_ceiling", action="store_true")
    args = ap.parse_args()
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]

    if args.gemm_ceiling:
        for name in args.shapes:
            n, h, w, c, cout = SHAPES[name]
            bench_gemm_ceiling(name, n, h, w, c, cout, dtype, args.iters)
        return

    print(f"backend={jax.default_backend()} dtype={args.dtype} act={args.act}")
    print(f"{'shape':<12} {'XLA ms':>9} {'Pallas ms':>10} {'speedup':>8} "
          f"{'XLA TF/s':>9} {'Pallas TF/s':>11}  max|err|")
    for name in args.shapes:
        n, h, w, c, cout = SHAPES[name]
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = (jax.random.normal(k1, (n, h, w, c)) * 0.5).astype(dtype)
        kern = (jax.random.normal(k2, (3, 3, c, cout)) * 0.02).astype(dtype)
        bias = jnp.zeros((cout,), jnp.float32)
        res = None

        # correctness on-chip first (relative to each other)
        y_ref = reference_conv3x3(x, kern, bias, res, args.act)
        y_pal = conv3x3_pallas(x, kern, bias, res, args.act, variant=args.variant)
        err = float(
            jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_pal.astype(jnp.float32)))
        )

        def xla_fn(xx, k, b, r):
            return reference_conv3x3(xx, k, b, r, args.act)

        def pal_fn(xx, k, b, r):
            return conv3x3_pallas(xx, k, b, r, args.act, variant=args.variant)

        t_xla = bench(xla_fn, x, kern, bias, res, args.iters)
        t_pal = bench(pal_fn, x, kern, bias, res, args.iters)
        fl = 2 * n * h * w * c * cout * 9
        print(
            f"{name:<12} {t_xla*1e3:9.3f} {t_pal*1e3:10.3f} "
            f"{t_xla/t_pal:8.2f} {fl/t_xla/1e12:9.1f} {fl/t_pal/1e12:11.1f}  "
            f"{err:.2e}"
        )


if __name__ == "__main__":
    main()
