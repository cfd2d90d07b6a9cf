#!/usr/bin/env python
"""Per-layer HBM-traffic attribution of the globe pre/post regions
(VERDICT r4 item 2 / BASELINE.json line 10).

The r3 measurement: stem+downs (9.8 ms) + ups+head (11.2 ms) move ~13
GB/field where the pure activations are ~1.2 GB. This tool says WHERE: for
every pre/post layer it compiles (a) the bare conv, (b) conv + instance
moments, (c) the full conv+IN+relu link, and prints XLA's own
cost-analysis bytes (compiled.cost_analysis()['bytes accessed']) next to
the measured wall time and the analytic lower bound — so each graph-level
lever (affine-prologue staging, one-buffer convT dilation, donation) can
be judged against the tensor traffic it is supposed to remove.

Usage: python tools/attrib_prepost.py [--iters K] [--only substr] [--time]
  --time  also wall-time each jit (one fresh remote compile per variant on
          the tunnel — budget accordingly; cost analysis alone is free
          AFTER compile, but compile itself is the slow part either way).
Runs on CPU too (cost numbers are backend-specific; TPU is the real one).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import biasgan_tpu

biasgan_tpu.respect_platform_env()

import jax
import jax.numpy as jnp

from biasgan_tpu.nn.layers import instance_norm, pad_hw
from biasgan_tpu.ops.pallas_conv import instance_moments_to_affine

CD = jnp.bfloat16
DIMS = ("NHWC", "HWIO", "NHWC")


def conv_same(x, kern, stride=(1, 1), h_mode="zero", w_mode="wrap"):
    p = kern.shape[0] // 2
    xp = pad_hw(x, (p, p), (p, p), h_mode, w_mode)
    return jax.lax.conv_general_dilated(
        xp.astype(CD), kern, stride, "VALID", dimension_numbers=DIMS
    )


def convt_wrap(x, kern, stride=(2, 2)):
    """The product conv_transpose2d w_mode='wrap' path (manual W dilation)."""
    kh, kw, _, _ = kern.shape
    sh, sw = stride
    kflip = kern[::-1, ::-1]
    n, h, w, c = x.shape
    xd = jnp.zeros((n, h, w * sw, c), x.dtype).at[:, :, ::sw, :].set(x)
    pad_l = kw - 2  # k3 s2 p1: kw-1-pw = 1
    pad_r = kw - 1 - pad_l
    xd = jnp.pad(xd, ((0, 0), (0, 0), (pad_l, pad_r), (0, 0)), mode="wrap")
    return jax.lax.conv_general_dilated(
        xd, kflip, (1, 1), ((kh - 2, kh - 1), (0, 0)),
        lhs_dilation=(sh, 1), dimension_numbers=DIMS,
    )


def moments(y):
    yf = y.astype(jnp.float32)
    return yf.sum((1, 2)), (yf * yf).sum((1, 2))


def link(y, count):
    a, b = instance_moments_to_affine(*moments(y), count)
    return jax.nn.relu(
        y.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    ).astype(y.dtype)


def gb(nbytes):
    return nbytes / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default="")
    ap.add_argument("--time", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)

    key = jax.random.PRNGKey(0)

    # (name, fn builder, input shape+dtype, ideal bytes note)
    # ideal = read input once + write output once (+norm read), bf16
    LAYERS = []

    def add(name, shape, dt, build):
        LAYERS.append((name, shape, dt, build))

    def conv_layer(cout, k, stride, h_mode):
        def build(shape, dt):
            kern = (jax.random.normal(key, (k, k, shape[-1], cout)) * 0.05
                    ).astype(CD)

            def raw(x):
                return conv_same(x, kern, (stride, stride), h_mode)

            def withmom(x):
                y = raw(x)
                return y, moments(y)

            def full(x):
                y = raw(x)
                return link(y, y.shape[1] * y.shape[2])

            return raw, withmom, full

        return build

    def convt_layer(cout):
        def build(shape, dt):
            kern = (jax.random.normal(key, (3, 3, shape[-1], cout)) * 0.05
                    ).astype(CD)

            def raw(x):
                return convt_wrap(x.astype(CD), kern)

            def withmom(x):
                y = raw(x)
                return y, moments(y)

            def full(x):
                y = raw(x)
                return link(y, y.shape[1] * y.shape[2])

            return raw, withmom, full

        return build

    add("stem 7x7 3->64 @724x1440", (1, 724, 1440, 3), jnp.float32,
        conv_layer(64, 7, 1, "reflect"))
    add("down0 3x3s2 64->128 @724x1440", (1, 724, 1440, 64), CD,
        conv_layer(128, 3, 2, "zero"))
    add("down1 3x3s2 128->256 @362x720", (1, 362, 720, 128), CD,
        conv_layer(256, 3, 2, "zero"))
    add("up0 convT 256->128 @181x360", (1, 181, 360, 256), CD,
        convt_layer(128))
    add("up1 convT 128->64 @362x720", (1, 362, 720, 128), CD,
        convt_layer(64))
    add("head 7x7 64->3 @724x1440", (1, 724, 1440, 64), CD,
        conv_layer(3, 7, 1, "reflect"))

    def analyze(fn, x, label):
        c = jax.jit(fn).lower(x).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        by = ca.get("bytes accessed", float("nan"))
        fl = ca.get("flops", float("nan"))
        t = float("nan")
        if args.time:
            out = c(x)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[0]))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = c(x)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[0]))
            t = (time.perf_counter() - t0) / args.iters
        bw = by / t / 1e9 if t == t and t > 0 else float("nan")
        print(f"    {label:10s}: {gb(by):7.3f} GB  {fl/1e9:8.2f} GF"
              + (f"  {t*1e3:8.3f} ms  {bw:6.0f} GB/s" if args.time else ""),
              flush=True)
        return by

    for name, shape, dt, build in LAYERS:
        if args.only and args.only not in name:
            continue
        x = jax.random.normal(jax.random.PRNGKey(7), shape, dt)
        raw, withmom, full = build(shape, dt)
        inb = x.size * x.dtype.itemsize
        print(f"{name}  (input {gb(inb):.3f} GB)", flush=True)
        analyze(raw, x, "conv only")
        analyze(withmom, x, "conv+mom")
        analyze(full, x, "full link")


if __name__ == "__main__":
    main()
