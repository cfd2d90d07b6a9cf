#!/usr/bin/env python
"""Globe pre/post lever probes (VERDICT r4 item 2, attribution follow-up).

tools/attrib_prepost.py measured the raw lax forms of the globe layers:
stem 7x7 3->64 runs 6.2 ms at 214 GB/s and head 7x7 64->3 11.5 ms at 158
GB/s — both far below the ~600 GB/s the 3x3 layers achieve, i.e. the 7x7
tiny-channel convs are EMITTER-bound, not bandwidth-bound. This probes the
candidate reformulations on hardware, parity-checked against the raw conv:

  stem: raw | product (conv2d routing) | s2dfull f=4 (input AND output in
        space-to-depth form: one VALID conv with K'=3, Kdim=432, N=1024)
  head: raw | product (output-s2d f=4)  | s2dfull f=4
  up1 : product convT wrap | +convt_onebuf | +convt_d2s

Usage: python tools/probe_stem_head.py [--iters K] [--only substr]
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
import numpy as np

from biasgan_tpu import perf_gates
from biasgan_tpu.nn.layers import (
    conv2d,
    conv_s2d_full,
    conv_transpose2d,
    pad_hw,
)

CD = jnp.bfloat16
DIMS = ("NHWC", "HWIO", "NHWC")


def timeit(fn, x, iters):
    out = fn(x)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[0]))
    return (time.perf_counter() - t0) / iters


def parity(name, y, ref, tol=3e-2):
    a = np.asarray(y, np.float32)
    b = np.asarray(ref, np.float32)
    d = np.abs(a - b).max()
    s = max(np.abs(b).max(), 1e-6)
    ok = d <= tol * s
    print(f"  parity {name}: max abs diff {d:.3e} (ref max {s:.3e})"
          + ("" if ok else "  FAIL"), flush=True)
    return ok


def run_7x7(tag, cin, cout, h, w, iters, only):
    if only and only not in tag:
        return
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, w, cin), CD)
    kern = (jax.random.normal(jax.random.PRNGKey(1), (7, 7, cin, cout))
            * 0.05).astype(CD)
    print(f"{tag} 7x7 {cin}->{cout} @{h}x{w}", flush=True)

    def raw(x):
        xp = pad_hw(x, (3, 3), (3, 3), "reflect", "wrap")
        return jax.lax.conv_general_dilated(
            xp, kern, (1, 1), "VALID", dimension_numbers=DIMS
        )

    def product(x):
        return conv2d(x, kern, None, (1, 1), (3, 3), "reflect", "wrap")

    def s2dfull(x):
        xp = pad_hw(x, (3, 3), (3, 3), "reflect", "wrap")
        return conv_s2d_full(xp, kern, 4)

    def im2col(x):
        # 49 static slices stacked on channel -> one 1x1 conv (GEMM
        # M=H*W, K=49*cin, N=cout). Only sane for tiny cin (the stem).
        xp = pad_hw(x, (3, 3), (3, 3), "reflect", "wrap")
        cols = [
            xp[:, dy : dy + h, dx : dx + w, :]
            for dy in range(7)
            for dx in range(7)
        ]
        xi = jnp.concatenate(cols, axis=-1)
        # kernel tap order must match the slice order (dy, dx, cin)
        kf = kern.reshape(1, 1, 49 * cin, cout)
        return jax.lax.conv_general_dilated(
            xi, kf, (1, 1), "VALID", dimension_numbers=DIMS
        )

    def cinpad(x, to):
        xz = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, to - cin)))
        kz = jnp.pad(kern, ((0, 0), (0, 0), (0, to - cin), (0, 0)))
        xp = pad_hw(xz, (3, 3), (3, 3), "reflect", "wrap")
        return jax.lax.conv_general_dilated(
            xp, kz, (1, 1), "VALID", dimension_numbers=DIMS
        )

    def dxcol_7x1(x, cp):
        # factor the 7x7 into (a) a dx-im2col packing the 7 column shifts
        # on the channel axis (K = 7*cp) and (b) ONE (7,1) conv — the
        # emitter accumulates the 7 dy taps in registers, each tap a
        # K=7*cp, N=cout GEMM (vs the raw form's K=cp). Exact (pure
        # reassociation). cp = cin zero-padded (lane fill, like cinpad).
        xz = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - cin)))
        kz = jnp.pad(kern, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
        xp = pad_hw(xz, (3, 3), (3, 3), "reflect", "wrap")
        xc = jnp.concatenate(
            [xp[:, :, dx : dx + w, :] for dx in range(7)], axis=-1
        )  # (n, h+6, w, 7*cp)
        w2 = kz.reshape(7, 1, 7 * cp, cout)  # [dy, ., (dx,ci), g]
        return jax.lax.conv_general_dilated(
            xc, w2, (1, 1), "VALID", dimension_numbers=DIMS
        )

    def dycol_1x7(x, cp):
        # mirror: dy-im2col (row shifts) + ONE (1,7) conv
        xz = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - cin)))
        kz = jnp.pad(kern, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
        xp = pad_hw(xz, (3, 3), (3, 3), "reflect", "wrap")
        xc = jnp.concatenate(
            [xp[:, dy : dy + h, :, :] for dy in range(7)], axis=-1
        )  # (n, h, w+6, 7*cp)
        w2 = kz.transpose(1, 0, 2, 3).reshape(1, 7, 7 * cp, cout)
        return jax.lax.conv_general_dilated(
            xc, w2, (1, 1), "VALID", dimension_numbers=DIMS
        )

    def conv1x7_dycollapse(x, gp):
        # head dual: ONE (1,7) conv to a FAT (dy,g) output (N = 7*gp wide
        # lanes instead of cout=3), then a cheap 7-term shifted ADD
        # collapses dy on the VPU. Exact.
        kz = jnp.pad(kern, ((0, 0), (0, 0), (0, 0), (0, gp - cout)))
        xp = pad_hw(x, (3, 3), (3, 3), "reflect", "wrap")
        w2 = kz.transpose(1, 2, 0, 3).reshape(1, 7, cin, 7 * gp)
        t = jax.lax.conv_general_dilated(
            xp, w2, (1, 1), "VALID", dimension_numbers=DIMS
        )  # (n, h+6, w, 7*gp)
        y = sum(
            t[:, dy : dy + h, :, dy * gp : dy * gp + gp] for dy in range(7)
        )
        return y[..., :cout]

    def conv7x1_dxcollapse(x, gp):
        # mirror: (7,1) conv to (dx,g), collapse dx with W shifts
        kz = jnp.pad(kern, ((0, 0), (0, 0), (0, 0), (0, gp - cout)))
        xp = pad_hw(x, (3, 3), (3, 3), "reflect", "wrap")
        w2 = kz.transpose(0, 2, 1, 3).reshape(7, 1, cin, 7 * gp)
        t = jax.lax.conv_general_dilated(
            xp, w2, (1, 1), "VALID", dimension_numbers=DIMS
        )  # (n, h, w+6, 7*gp)
        y = sum(
            t[:, :, dx : dx + w, dx * gp : dx * gp + gp] for dx in range(7)
        )
        return y[..., :cout]

    def coutpad(x, to):
        # zero-pad OUTPUT channels before the product routing: cout=3 only
        # fills 48 of 128 lanes after output-s2d f=4 (3*16); cout=8 fills
        # exactly 128. FLOPs grow to/cout x, but the layer runs at ~2% of
        # peak FLOPs — the lane fill is the wall (symmetric twin of the
        # cinpad stem win).
        kz = jnp.pad(kern, ((0, 0), (0, 0), (0, 0), (0, to - cout)))
        return conv2d(x, kz, None, (1, 1), (3, 3), "reflect", "wrap")[
            ..., :cout
        ]

    def pallas7(x):
        # the Pallas smallcin/smallcout kernel (ops/pallas_conv7.py)
        from biasgan_tpu.ops.pallas_conv7 import conv7x7_valid

        xp = pad_hw(x, (3, 3), (3, 3), "reflect", "wrap")
        return conv7x7_valid(xp, kern, None)

    ref = jax.jit(raw)(x)
    variants = [("raw", raw), ("product", product), ("s2dfull f=4", s2dfull),
                ("pallas7", pallas7)]
    if cin <= 8:
        variants += [
            ("im2col49", im2col),
            ("cinpad8", lambda x: cinpad(x, 8)),
            ("cinpad32", lambda x: cinpad(x, 32)),
            ("dxcol_7x1 cp8", lambda x: dxcol_7x1(x, 8)),
            ("dycol_1x7 cp8", lambda x: dycol_1x7(x, 8)),
        ]
    if cout <= 8:
        variants += [
            ("coutpad8", lambda x: coutpad(x, 8)),
            ("conv1x7_dycol g8", lambda x: conv1x7_dycollapse(x, 8)),
            ("conv7x1_dxcol g8", lambda x: conv7x1_dxcollapse(x, 8)),
        ]
    for name, fn in variants:
        j = jax.jit(fn)
        y = j(x)
        if name != "raw" and not parity(name, y, ref):
            continue
        t = timeit(j, x, iters)
        print(f"  {name:12s}: {t*1e3:8.3f} ms", flush=True)


def run_up1(iters, only):
    if only and "up1" not in only and only != "":
        if "up1" not in only:
            return
    h, w, cin, cout = 362, 720, 128, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (1, h, w, cin), CD)
    kern = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout))
            * 0.05).astype(CD)
    print(f"up1 convT 3x3s2 {cin}->{cout} @{h}x{w}", flush=True)

    def base(x):
        return conv_transpose2d(x, kern, None, (2, 2), (1, 1), (1, 1),
                                w_mode="wrap")

    ref = jax.jit(base)(x)
    t = timeit(jax.jit(base), x, iters)
    print(f"  {'wrap dilate+pad':16s}: {t*1e3:8.3f} ms", flush=True)

    with perf_gates.overrides(convt_onebuf=True):
        j = jax.jit(lambda x: conv_transpose2d(
            x, kern, None, (2, 2), (1, 1), (1, 1), w_mode="wrap"))
        y = j(x)
        if parity("onebuf", y, ref):
            t = timeit(j, x, iters)
            print(f"  {'onebuf':16s}: {t*1e3:8.3f} ms", flush=True)

    with perf_gates.overrides(convt_d2s=True):
        j = jax.jit(lambda x: conv_transpose2d(
            x, kern, None, (2, 2), (1, 1), (1, 1), w_mode="wrap"))
        y = j(x)
        if parity("d2s_wrap", y, ref):
            t = timeit(j, x, iters)
            print(f"  {'d2s_wrap':16s}: {t*1e3:8.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    run_7x7("stem", 3, 64, 724, 1440, args.iters, args.only)
    run_7x7("head", 64, 3, 724, 1440, args.iters, args.only)
    if not args.only or "up1" in args.only:
        run_up1(args.iters, args.only)


if __name__ == "__main__":
    main()
