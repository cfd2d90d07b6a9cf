"""Pallas TPU kernels: 7x7 stride-1 conv with one TINY channel side.

The r5 globe attribution (tools/attrib_prepost.py, BASELINE.md r5) showed
the two 7x7 convs of the resnet generator — stem 3->64 and head 64->3 at
724x1440 — are EMITTER-bound: 160-300 GB/s and 2-4 TF/s against ~819 GB/s
HBM and ~197 TF/s MXU peaks, i.e. >20x off speed-of-light, while every
graph-level reformulation probed (space-to-depth, im2col->1x1, channel
zero-pads) tops out at the cin-pad's -35%. The structural problem is MXU
pass geometry: a dot costs ~ M/8 * ceil(K/128) * ceil(N/128) cycles, and
the raw forms run K=cin(3..8) or N=cout(3) — one nearly-empty pass per tap,
49 taps. These kernels restructure the taps so every MXU pass is full and
the accumulator never leaves VMEM:

  * ``smallcin`` (the stem): a dx-im2col packs the 7 column shifts on the
    lane axis IN VMEM (K = 7*cp = 56), then 7 row-shifted dots — one per dy,
    each (TH, TW, 56) @ (56, cout) — accumulate in an f32 register tile.
    7 * M/8 cycles total (~1 ms/field at the globe shape) instead of the
    emitter's 49 underfilled passes.
  * ``smallcout`` (the head): no im2col at all — 7 sublane-shifted dots
    (one per dx, K = cin = 64) into a FAT (dy, g) N axis of 7*8 = 56
    channels, then a 7-term shifted ADD collapses dy on the VPU. The
    output-s2d product routing XLA uses for this conv pays a 16x MAC
    inflation (the expanded 10x10 kernel is mostly zeros); this form does
    the exact 19.7 GF.

Shared scaffolding (same shape as ops/pallas_conv.py, r3): grid over
(batch, H row-tiles, W col-tiles); the input tile + 6-row/col halo is DMA'd
HBM->VMEM with double buffering; W tiles keep the lane-padded tiny-channel
buffers inside VMEM (a (.., 8)-channel VMEM buffer pads its lane axis to
128, so full-W rows would blow the budget). DMA slice extents on the
second-to-last dim are tile-aligned (tw + 16) per the r3 Mosaic lesson;
tap shifts read the dead columns, never past the buffer.

Wired via layers.conv2d behind the ``--conv7_pallas`` gate (perf_gates);
differentiable through ``conv7x7_op`` (forward = kernel, backward = the
same lax grads autodiff would build, so training paths stay exact).
Correctness: tests/unit/test_pallas_conv7.py (interpret mode vs lax).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # keep importable off-TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Array = jax.Array

_VMEM_BUDGET = 9 * 1024 * 1024


def _ru(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tiles(h: int, w: int, c_lanes: int, dtype, variant: str):
    """Largest (th, tw) whose buffers fit the VMEM budget. tw must be a
    sublane-tile multiple (the OUT block's second-to-last dim); the DMA
    extent tw+16 then stays tile-aligned for both dtypes."""
    esz = jnp.dtype(dtype).itemsize
    best = None
    for th in (32, 16, 8):
        for tw in (512, 384, 256, 160, 128, 96, 64, 32, 16):
            if tw > _ru(w, 16):
                continue
            # Mosaic's scoped-vmem stack holds more than the named buffers:
            # the pipeline double-buffers the out block and the dot loops
            # keep 2-3 live copies of the f32 accumulator (the first
            # hardware compile OOM'd at 16.3M against this formula's 8.9M),
            # hence the safety multipliers.
            x2 = 2 * (th + 6) * (tw + 16) * _ru(c_lanes, 128) * esz
            if variant == "smallcin":
                need = (
                    x2
                    + (th + 6) * tw * 128 * esz      # im2col (56 -> 128 lanes)
                    + 2 * th * tw * 128 * esz        # out block, double-buffered
                    + 3 * th * tw * 128 * 4          # f32 acc copies
                )
            else:  # smallcout
                need = (
                    x2
                    + 3 * (th + 6) * tw * 128 * 4    # U value+copy + U scratch
                    + 2 * th * tw * 128 * esz        # out block, double-buffered
                    + 2 * th * tw * 128 * 4          # f32 acc copies
                )
            if need <= _VMEM_BUDGET:
                area = th * tw
                # prefer larger tiles; under a tie prefer wider (fewer
                # programs -> less per-tile DMA/dispatch overhead)
                key = (area, tw)
                if best is None or key > best[0]:
                    best = (key, th, tw)
    if best is None:
        return 8, 16
    return best[1], best[2]


def _dma_scaffold(x_hbm, x_vmem, sems, th, tw, n_h, n_w):
    """Double-buffered halo-tile DMA over a (b, hi, wi) grid; returns the
    (slot, wait) pair for the current program's tile."""
    b = pl.program_id(0)
    hi = pl.program_id(1)
    wi = pl.program_id(2)
    step = (b * n_h + hi) * n_w + wi
    total = pl.num_programs(0) * n_h * n_w

    def dma(bb, hh, ww, slot):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(hh * th, th + 6), pl.ds(ww * tw, tw + 16)],
            x_vmem.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        dma(b, hi, wi, slot).start()

    @pl.when(step + 1 < total)
    def _():
        ns = step + 1
        nwi = jax.lax.rem(ns, n_w)
        nhi = jax.lax.rem(ns // n_w, n_h)
        nb = ns // (n_w * n_h)
        dma(nb, nhi, nwi, nxt).start()

    dma(b, hi, wi, slot).wait()
    return slot


def _k_smallcin(
    x_hbm, w_ref, b_ref, out_ref, x_vmem, sems, im_ref,
    *, th, tw, n_h, n_w, cp, cout, out_dtype,
):
    slot = _dma_scaffold(x_hbm, x_vmem, sems, th, tw, n_h, n_w)
    x = x_vmem[slot]  # (th+6, tw+16, 128): C is 128-padded for the DMA
    # dx-im2col: pack the 7 column shifts on the lane axis -> K = 7*cp.
    # Ref stores normalize the misaligned lane offsets (the in-register
    # concat formulation fails to lower — ops/pallas_conv.py im2col note).
    # The lane slice to :cp drops the DMA's 128-alignment pad channels.
    for dx in range(7):
        im_ref[:, :, dx * cp : (dx + 1) * cp] = jax.lax.slice(
            x, (0, dx, 0), (th + 6, dx + tw, cp)
        )
    acc = jnp.zeros((th, tw, cout), jnp.float32)
    for dy in range(7):
        acc = acc + jax.lax.dot_general(
            im_ref[dy : dy + th],          # (th, tw, 7*cp) — row slice, free
            w_ref[dy],                     # (7*cp, cout)
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if b_ref is not None:
        acc = acc + b_ref[0]
    out_ref[0] = acc.astype(out_dtype)


def _k_smallcout(
    x_hbm, w_ref, b_ref, out_ref, x_vmem, sems, u_ref,
    *, th, tw, n_h, n_w, gp, cout, out_dtype,
):
    slot = _dma_scaffold(x_hbm, x_vmem, sems, th, tw, n_h, n_w)
    # (th+6, tw+16, c_dma): C is 128-padded for the DMA; the weights carry
    # matching zero rows, so the full c_dma lanes contract for free (the
    # MXU pass count is ceil(C/128) either way)
    x = x_vmem[slot]
    c = x.shape[2]
    u = jnp.zeros((th + 6, tw, 7 * gp), jnp.float32)
    for dx in range(7):
        u = u + jax.lax.dot_general(
            jax.lax.slice(x, (0, dx, 0), (th + 6, dx + tw, c)),
            w_ref[dx],                     # (c_dma, 7*gp)
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    u_ref[:] = u
    acc = jnp.zeros((th, tw, gp), jnp.float32)
    for dy in range(7):
        # row slice free; the gp-lane offset read is a vector shuffle
        acc = acc + u_ref[dy : dy + th, :, dy * gp : (dy + 1) * gp]
    if b_ref is not None:
        acc = acc + b_ref[0]
    out_ref[0] = acc[:, :, :cout].astype(out_dtype)


def conv7x7_valid(
    xp: Array,
    kernel: Array,
    bias: Optional[Array] = None,
    interpret: bool = False,
) -> Array:
    """VALID 7x7 stride-1 conv on an ALREADY-PADDED input: (N, H+6, W+6, C)
    -> (N, H, W, Cout), torch cross-correlation semantics, f32 accumulation.
    Variant is picked from the channel shape: cin <= 8 -> ``smallcin``
    (cin is zero-padded to 8 if needed), cout <= 8 -> ``smallcout``. Raises
    for shapes with neither side tiny (XLA's emitter is fine there)."""
    n, hp, wfull, c = xp.shape
    h, w = hp - 6, wfull - 6
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (7, 7) and cin == c, (kernel.shape, xp.shape)
    if cin <= 8:
        variant = "smallcin"
        if cin < 8:
            kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 8 - cin), (0, 0)))
        cp, gp = 8, 0
    elif cout <= 8:
        variant = "smallcout"
        cp, gp = 0, 8
        if cout < 8:
            kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, 8 - cout)))
    else:
        raise ValueError(
            f"conv7x7_valid: neither side tiny (cin={cin}, cout={cout})"
        )
    # Mosaic requires a manual HBM->VMEM DMA slice's innermost extent be
    # 128-aligned (the lane-tiled HBM memref is physically 128-padded
    # regardless — the hardware probe failed on extent 64 of a 64-channel
    # array), so the kernel always moves full 128-lane tiles: pad the
    # channel axis here and let the kernel slice (smallcin) or contract
    # matching zero weight rows (smallcout).
    c_dma = _ru(max(c, cp), 128)
    if xp.shape[3] < c_dma:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, c_dma - xp.shape[3])))
    c_lanes = c_dma

    th, tw = _pick_tiles(h, w, c_lanes, xp.dtype, variant)
    h_run, w_run = _ru(h, th), _ru(w, tw)
    n_h, n_w = h_run // th, w_run // tw
    # pad so the last tile's DMA (rows th+6, cols tw+16) stays in bounds;
    # the dead rows/cols are computed into and sliced off the output
    pad_h = (h_run + 6) - hp
    pad_w = (w_run + 16) - wfull
    if pad_h > 0 or pad_w > 0:
        xp = jnp.pad(
            xp, ((0, 0), (0, max(pad_h, 0)), (0, max(pad_w, 0)), (0, 0))
        )

    if variant == "smallcin":
        w9 = kernel.reshape(7, 7 * cp, cout).astype(xp.dtype)
        kern = functools.partial(
            _k_smallcin, th=th, tw=tw, n_h=n_h, n_w=n_w, cp=cp, cout=cout,
            out_dtype=xp.dtype,
        )
        scratch = [
            pltpu.VMEM((2, th + 6, tw + 16, c_dma), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((th + 6, tw, 7 * cp), xp.dtype),
        ]
        out_c = cout
        b_arr = (
            None if bias is None else bias.reshape(1, cout).astype(jnp.float32)
        )
    else:
        if c < c_dma:
            kernel = jnp.pad(
                kernel, ((0, 0), (0, 0), (0, c_dma - c), (0, 0))
            )
        w9 = (
            kernel.transpose(1, 2, 0, 3)
            .reshape(7, c_dma, 7 * gp)
            .astype(xp.dtype)
        )
        kern = functools.partial(
            _k_smallcout, th=th, tw=tw, n_h=n_h, n_w=n_w, gp=gp, cout=cout,
            out_dtype=xp.dtype,
        )
        scratch = [
            pltpu.VMEM((2, th + 6, tw + 16, c_dma), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((th + 6, tw, 7 * gp), jnp.float32),
        ]
        out_c = cout
        b_arr = None
        if bias is not None:
            b_arr = jnp.pad(bias, (0, gp - cout)).reshape(1, gp)
            b_arr = b_arr.astype(jnp.float32)

    out_spec = pl.BlockSpec(
        (1, th, tw, out_c),
        lambda b, i, j: (b, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),   # x: manual halo DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
    ]
    args = [xp, w9]
    if b_arr is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(b_arr)

    def body(x_hbm, w_ref, *rest):
        if b_arr is not None:
            b_ref, out_ref, x_vmem, sems, extra = rest
        else:
            b_ref = None
            out_ref, x_vmem, sems, extra = rest
        kern(x_hbm, w_ref, b_ref, out_ref, x_vmem, sems, extra)

    flops = 2 * n * h * w * 49 * max(cp, 1) * max(cout, 1)
    if variant == "smallcout":
        flops = 2 * n * h * w * 49 * c * gp
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, h_run, w_run, out_c), xp.dtype),
        grid=(n, n_h, n_w),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + n * h * w * out_c * xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if h_run > h or w_run > w:
        out = out[:, :h, :w]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv7x7_op(xp: Array, kernel: Array, bias, interpret: bool = False):
    """Differentiable VALID 7x7 conv on a PRE-PADDED input (N, H+6, W+6, C)
    -> (N, H, W, Cout). Forward runs the Pallas kernel; the backward is the
    exact lax grads autodiff would build (input grad = VALID conv of the
    6-padded cotangent with the flipped/transposed kernel; weight grad =
    batch-as-contraction conv), so conv2d's routing stays training-safe.
    The caller does the boundary padding (pad_hw), whose own adjoint
    handles every pad mode."""
    return conv7x7_valid(xp, kernel, bias, interpret=interpret)


def _c7_fwd(xp, kernel, bias, interpret):
    return conv7x7_valid(xp, kernel, bias, interpret=interpret), (
        xp, kernel, bias,
    )


def _c7_bwd(interpret, res, g):
    xp, kernel, bias = res
    kt = kernel[::-1, ::-1].transpose(0, 1, 3, 2).astype(g.dtype)
    gp = jnp.pad(g, ((0, 0), (6, 6), (6, 6), (0, 0)))
    dxp = jax.lax.conv_general_dilated(
        gp, kt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    dw = jax.lax.conv_general_dilated(
        xp.transpose(3, 1, 2, 0),   # (C, H+6, W+6, N)
        g.transpose(1, 2, 0, 3),    # (H, W, N, Cout)
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3)         # (7, 7, C, Cout)
    db = (
        jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(bias.dtype)
        if bias is not None
        else None
    )
    return dxp.astype(xp.dtype), dw.astype(kernel.dtype), db


conv7x7_op.defvjp(_c7_fwd, _c7_bwd)
