#!/usr/bin/env python
"""Single-chip cost of the fused x spatial composition (VERDICT r4 item 3
follow-through): run the resnet block chain at the globe block shape three
ways on ONE chip and compare —

  inkernel : conv3x3_fused w_mode='wrap' (the single-chip fused path; pads
             synthesized in-kernel — the 34.6 Mpx/s configuration)
  halo     : conv3x3_fused w_mode='halo' under spatial_apply on a 1-shard
             mesh (the composed path's exact per-shard program: ppermute
             self-exchange + embed_halo_w pad + W-global psum moments) —
             its overhead vs 'inkernel' is the per-chip price of the
             composition, an upper bound on what each of N shards pays
             beyond the (untimeable here) ICI hop
  xla      : the plain XLA conv/instance-norm composition (baseline)

Usage: python tools/bench_fused_spatial.py [N H W C] [--blocks K] [--iters I]
Defaults: globe block shape (1, 181, 360, 256) bf16, 9 blocks, 30 iters.
One compile-heavy jit per variant — budget the tunnel accordingly.
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

from biasgan_tpu.nn.generators import ResNetBlock
from biasgan_tpu.ops.pallas_conv import fused_block_plan
from biasgan_tpu.parallel import make_mesh
from biasgan_tpu.parallel.spatial import HaloCtx

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import PartitionSpec as P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", nargs="*", type=int, default=[1, 181, 360, 256])
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default="", help="inkernel|halo|xla (one "
                    "compile per command on the tunnel)")
    args = ap.parse_args()
    n, h, w, c = args.shape or [1, 181, 360, 256]
    dt = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} shape=({n},{h},{w},{c}) {dt} "
          f"blocks={args.blocks}", flush=True)

    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), dt)
    import os

    interp = jax.default_backend() != "tpu"
    os.environ["BIASGAN_FUSED_BLOCK"] = "interpret" if interp else "1"
    os.environ.setdefault("BIASGAN_FUSED_MIN_C", "1")

    blk = ResNetBlock(c, norm_type="instance", w_mode="wrap",
                      compute_dtype=dt)
    v = blk.init(jax.random.PRNGKey(1), x, False)
    plan = fused_block_plan(h, w, c, c, dt, interpret=interp)
    print(f"plan: {plan}", flush=True)
    xr = jnp.pad(x, ((0, 0), (0, plan.h_run - h), (0, 0), (0, 0)))

    def chain(xx, ctx, p):
        hh = xx
        for _ in range(args.blocks):
            hh = blk.apply(v, hh, False, ctx, fused_plan=p)
        return hh

    def timeit(fn, *a):
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][0, 0, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][0, 0, 0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters

    results = {}
    mesh = make_mesh(data=1, spatial=1)
    ctx1 = HaloCtx("spatial", 1, periodic=True, interpret=interp)

    if not args.only or args.only == "inkernel":
        f_in = jax.jit(lambda xx: chain(xx, None, plan))
        results["inkernel"] = timeit(f_in, xr)
    if not args.only or args.only == "halo":
        f_halo = jax.jit(
            _shard_map(
                lambda xx: chain(xx, ctx1, plan),
                mesh=mesh,
                in_specs=P(None, None, "spatial", None),
                out_specs=P(None, None, "spatial", None),
                check_vma=False,
            )
        )
        results["halo"] = timeit(f_halo, xr)
    if not args.only or args.only == "xla":
        del os.environ["BIASGAN_FUSED_BLOCK"]
        f_xla = jax.jit(lambda xx: chain(xx, None, None))
        results["xla"] = timeit(f_xla, x)

    # parity spot-check when both fused variants ran
    if "inkernel" in results and "halo" in results:
        a = np.asarray(jax.jit(lambda xx: chain(xx, None, plan))(xr)[:, :h],
                       np.float32)
        os.environ["BIASGAN_FUSED_BLOCK"] = "interpret" if interp else "1"
        b = np.asarray(
            jax.jit(
                _shard_map(
                    lambda xx: chain(xx, ctx1, plan),
                    mesh=mesh,
                    in_specs=P(None, None, "spatial", None),
                    out_specs=P(None, None, "spatial", None),
                    check_vma=False,
                )
            )(xr)[:, :h],
            np.float32,
        )
        d = np.abs(a - b).max()
        print(f"parity inkernel vs halo: max abs diff {d:.3e}", flush=True)

    for k, t in results.items():
        fl = 2 * 2 * n * h * w * c * c * 9 * args.blocks
        print(f"{k:9s}: {t * 1e3:8.3f} ms  {fl / t / 1e12:6.1f} TF/s",
              flush=True)
    if "inkernel" in results and "halo" in results:
        print(f"halo overhead: {results['halo'] / results['inkernel']:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
