"""Core spatial layers with torch-compatible semantics, NHWC layout.

Capability parity target: the conv / conv-transpose / norm building blocks of
the reference's ``models/networks.py`` (SURVEY.md section 2.2). Everything here is
written TPU-first:

* NHWC layout (XLA's native conv layout on TPU; the reference family is NCHW).
* All padding is explicit, so the width axis can be swapped between local
  padding (zero / reflect / periodic wrap) and *halo exchange* when a
  ``SpatialCtx`` is supplied — this is how the generator runs spatially
  sharded over a device mesh for full-globe inference (SURVEY.md section 5,
  "Long-context / sequence parallelism" row).
* ConvTranspose is implemented directly with ``lax.conv_general_dilated``
  (input dilation + flipped kernel) so its output sizing and weight layout
  match torch ``ConvTranspose2d(k, s, p, output_padding)`` exactly — that is
  what the torch-CPU parity oracle in tests/unit/test_torch_parity.py checks.
* Params are float32; compute dtype is configurable (bfloat16 on TPU). Norm
  statistics are always accumulated in float32.
"""

from __future__ import annotations

from typing import Any, Optional, Protocol, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# ---------------------------------------------------------------------------
# Spatial-sharding context protocol
# ---------------------------------------------------------------------------


class SpatialCtx(Protocol):
    """Hooks a layer needs to run with its width (longitude) axis sharded.

    Implemented by ``biasgan_tpu.parallel.spatial.HaloCtx``; ``None`` means
    "single device / replicated" and all padding happens locally.
    """

    periodic: bool

    def pad_w(self, x: Array, left: int, right: int) -> Array:
        """Pad the W axis (axis=2 of NHWC) by exchanging halos with mesh
        neighbors (wrap-around if periodic, zeros at the global edges if
        not)."""
        ...

    def mean_w(self, x: Array, axes: Sequence[int], keepdims: bool = True) -> Array:
        """Mean over ``axes`` where axis 2 (W) is globally sharded: local mean
        followed by a cross-shard pmean (shards are equal width)."""
        ...


# ---------------------------------------------------------------------------
# Explicit padding
# ---------------------------------------------------------------------------

_PAD_MODES = ("zero", "reflect", "wrap")


def _pad_axis(x: Array, axis: int, lo: int, hi: int, mode: str) -> Array:
    if lo == 0 and hi == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (lo, hi)
    if mode == "zero":
        return jnp.pad(x, cfg)
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if mode == "wrap":
        return jnp.pad(x, cfg, mode="wrap")
    raise ValueError(f"unknown pad mode {mode!r}; expected one of {_PAD_MODES}")


def pad_hw(
    x: Array,
    pad_h: Tuple[int, int],
    pad_w: Tuple[int, int],
    h_mode: str = "zero",
    w_mode: str = "zero",
    ctx: Optional[SpatialCtx] = None,
) -> Array:
    """Pad H (axis 1) locally and W (axis 2) either locally or via halo
    exchange when a spatial-sharding context is given."""
    x = _pad_axis(x, 1, pad_h[0], pad_h[1], h_mode)
    if ctx is None:
        x = _pad_axis(x, 2, pad_w[0], pad_w[1], w_mode)
    else:
        if w_mode == "reflect":
            raise NotImplementedError(
                "reflect padding on a sharded width axis is not supported; "
                "use 'zero' or 'wrap' (periodic longitude)"
            )
        x = ctx.pad_w(x, pad_w[0], pad_w[1])
    return x


# ---------------------------------------------------------------------------
# Weight init (reference semantics: init_weights in models/networks.py [K])
# ---------------------------------------------------------------------------


def make_conv_init(init_type: str = "normal", init_gain: float = 0.02):
    """Conv-kernel initializer matching the reference's ``init_weights``:
    normal(0, gain) / xavier(gain) / kaiming / orthogonal(gain)."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=init_gain)
    if init_type == "xavier":
        # torch xavier_normal_(gain=g): std = g * sqrt(2 / (fan_in + fan_out));
        # variance_scaling(1, fan_avg, normal) has std sqrt(2 / (fi + fo)).
        def init(key, shape, dtype=jnp.float32):
            return init_gain * nn.initializers.variance_scaling(
                1.0, "fan_avg", "normal"
            )(key, shape, dtype)

        return init
    if init_type == "kaiming":
        # kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in)
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain)
    raise ValueError(f"unknown init_type {init_type!r}")


def batchnorm_scale_init(key, shape, dtype=jnp.float32):
    """Reference inits BatchNorm weight ~ N(1.0, 0.02), bias = 0."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# Functional conv ops (explicit kernels) — shared by modules and tests
# ---------------------------------------------------------------------------

_DIMS = ("NHWC", "HWIO", "NHWC")

# Convs with very few output channels (the 3-channel generator heads, the
# PatchGAN's 1-channel verdict map) waste the MXU: the lane axis holds
# output channels, so N=3 pads to 128 and runs at <2% utilization (measured
# 3.4 ms for the resnet head's 1.23 GF at 256^2 b8 — as long as all nine
# 256-channel residual blocks combined). Restructuring as a space-to-depth
# conv fixes it: a stride-1 KxK conv to C channels equals a stride-f
# (K+f-1)x(K+f-1) conv to f*f*C channels followed by a depth-to-space
# reshape — identical arithmetic, f*f times more lanes busy. Measured 3.4 ms
# -> ~0.3 ms (f=4). Exact (bit-identical kernel application; the expanded
# kernel is just the original scattered at f*f offsets).
import os as _os

from biasgan_tpu import perf_gates as _pg

def _S2D_MAX_COUT() -> int:
    # read live (trace-time only, not per-op) from the layered gates
    # (perf_gates.py: env override > --s2d_max_cout > default 8): tests
    # force the gates open on small shapes via env to keep the restructured
    # paths exercised
    return _pg.s2d_max_cout()


def _S2D_MIN_M() -> int:
    # Below this GEMM row count (M = N*out_h*out_w) the restructuring's
    # extra ops cost more latency than the lane win pays back: measured 188
    # vs 358 samples/s on the 64^2 b4 tiny config (latency-bound), +8% on
    # CycleGAN 256^2 b8 (M=524k), neutral at b128. 64k splits the regimes.
    # Layered via perf_gates (env override > --s2d_min_m > default).
    return _pg.s2d_min_m()


def _s2d_factor(cout: int, out_h: int, out_w: int, n: int = 1 << 30) -> int:
    if cout > _S2D_MAX_COUT() or n * out_h * out_w < _S2D_MIN_M():
        return 1
    for f in (8, 4, 2):
        # keep the widened channel axis at/below one 128-lane register
        if out_h % f == 0 and out_w % f == 0 and f * f * cout <= 192:
            return f
    return 1


def _conv_s2d(
    xp: Array,
    kernel: Array,
    f: int,
    *,
    lhs_dilation: Tuple[int, int] = (1, 1),
    padding=((0, 0), (0, 0)),
) -> Array:
    """Conv of ``xp`` with ``kernel`` (HWIO) restructured as a stride-f conv
    to f*f*cout channels + depth-to-space. ``lhs_dilation``/``padding`` are
    folded into the one conv call so stride dilation stays VIRTUAL (a
    materialized zero buffer costs ~4x the activation's HBM traffic and undoes
    the MXU win at large batch)."""
    kh, kw, cin, cout = kernel.shape
    wz = jnp.zeros((kh + f - 1, kw + f - 1, cin, f * f * cout), kernel.dtype)
    for dy in range(f):
        for dx in range(f):
            o = (dy * f + dx) * cout
            wz = wz.at[dy : dy + kh, dx : dx + kw, :, o : o + cout].add(kernel)
    y = jax.lax.conv_general_dilated(
        xp,
        wz,
        window_strides=(f, f),
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DIMS,
    )
    n, oh, ow, _ = y.shape
    y = y.reshape(n, oh, ow, f, f, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, oh * f, ow * f, cout)


def conv_s2d_full(xp: Array, kernel: Array, f: int) -> Array:
    """Stride-1 VALID conv of pre-padded ``xp`` with ``kernel`` (HWIO, k x k)
    computed ENTIRELY in space-to-depth form: input AND output live in
    (H/f, W/f, f*f*C) space, so a tiny-channel k x k conv becomes ONE
    MXU-shaped GEMM (e.g. the globe stem 7x7 3->64: K'=3x3, Kdim=432,
    N=1024 — vs the raw form's Kdim=147, N=64 that leaves the emitter at
    ~3% MFU, measured 6.2 ms @ 214 GB/s, tools/attrib_prepost.py r5).

    Exact: the expanded kernel W'[qy,qx,(ry,rx,c),(oy,ox,g)] =
    W[f*qy+ry-oy, f*qx+rx-ox, c, g] (zero outside [0,k)) regroups the same
    taps; output blocks are depth-to-spaced back. Requires the VALID output
    dims divisible by f. MAC count grows by the tap-support rounding
    (~(k+f-1)^2/k^2 per axis pair) — the probe decides where the lane win
    pays for it.
    """
    import numpy as np

    k = kernel.shape[0]
    n, Hp, Wp, C = xp.shape
    F = kernel.shape[-1]
    Ho, Wo = Hp - k + 1, Wp - k + 1
    if Ho % f or Wo % f:
        raise ValueError(f"conv_s2d_full: output {Ho}x{Wo} not /{f}")
    ph, pw = (-Hp) % f, (-Wp) % f
    if ph or pw:
        xp = jnp.pad(xp, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hc, Wc = (Hp + ph) // f, (Wp + pw) // f
    xs = xp.reshape(n, Hc, f, Wc, f, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, Hc, Wc, f * f * C)
    Kp = (k + f - 2) // f + 1
    Hb, Wb = Ho // f, Wo // f
    if Hc - Kp + 1 < Hb or Wc - Kp + 1 < Wb:
        raise ValueError("conv_s2d_full: insufficient input cells")
    # tap index along one axis: dy = f*qy + ry - oy, valid in [0, k)
    iy = (
        np.arange(Kp)[:, None, None] * f
        + np.arange(f)[None, :, None]
        - np.arange(f)[None, None, :]
    )  # (qy, ry, oy)
    my = (iy >= 0) & (iy < k)
    iyc = np.clip(iy, 0, k - 1)
    # broadcast to (qy, qx, ry, rx, c, oy, ox, g)
    IY = iyc[:, None, :, None, None, :, None, None]
    IX = iyc[None, :, None, :, None, None, :, None]
    MY = my[:, None, :, None, None, :, None, None]
    MX = my[None, :, None, :, None, None, :, None]
    IC = np.arange(C)[None, None, None, None, :, None, None, None]
    IG = np.arange(F)[None, None, None, None, None, None, None, :]
    Wg = jnp.where(MY & MX, kernel[IY, IX, IC, IG], 0)
    Wg = Wg.reshape(Kp, Kp, f * f * C, f * f * F)
    ys = jax.lax.conv_general_dilated(
        xs, Wg.astype(xs.dtype), (1, 1), "VALID", dimension_numbers=_DIMS
    )
    ys = ys[:, :Hb, :Wb]
    y = ys.reshape(n, Hb, Wb, f, f, F).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, Ho, Wo, F)


def _conv_valid(xp: Array, kernel: Array, stride: Tuple[int, int]) -> Array:
    return jax.lax.conv_general_dilated(
        xp, kernel, window_strides=stride, padding="VALID", dimension_numbers=_DIMS
    )


# Tiny-INPUT-channel convs (the 3-channel G/D stems) have the mirror problem
# in the BACKWARD pass: autodiff's input-grad is a transposed conv producing
# cin channels — N=3 on the MXU again, ~3 ms per occurrence at 256^2 b8
# (it fires whenever the conv's input depends on parameters: the cycle
# passes G(G(x)) and every D-on-fake pass of the G loss). The custom VJP
# below computes the input-grad through the same space-to-depth
# restructuring, and the weight-grad with the standard batch-as-contraction
# transposition (GEMM N = cout, unchanged from what autodiff would build).

import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_tiny_cin(xp: Array, kernel: Array, stride: Tuple[int, int]) -> Array:
    return _conv_valid(xp, kernel, stride)


def _conv_tiny_cin_fwd(xp, kernel, stride):
    return _conv_valid(xp, kernel, stride), (xp, kernel)


def _conv_tiny_cin_bwd(stride, res, g):
    xp, kernel = res
    kh, kw, cin, cout = kernel.shape
    sh, sw = stride
    n, oh, ow, _ = g.shape
    # With inexact tiling ((H_pad - k) % s != 0, e.g. 3x3 s2 on even inputs)
    # the last d = H_pad - ((oh-1)s + k) rows/cols are never read by any
    # window: their input-grad is zero and they must be excluded from the
    # weight-grad contraction.
    uh, uw = (oh - 1) * sh + kh, (ow - 1) * sw + kw
    dh, dw = xp.shape[1] - uh, xp.shape[2] - uw
    # input grad: correlate the (stride-dilated, full-padded) cotangent with
    # the space-flipped, channel-transposed kernel -> cin channels, via s2d;
    # dilation and full-padding stay virtual inside the one conv call
    kt = kernel[::-1, ::-1].transpose(0, 1, 3, 2).astype(g.dtype)
    pad = ((kh - 1, kh - 1 + dh), (kw - 1, kw - 1 + dw))
    f = _s2d_factor(cin, xp.shape[1], xp.shape[2], xp.shape[0])
    if f > 1:
        dx = _conv_s2d(g, kt, f, lhs_dilation=(sh, sw), padding=pad)
    else:
        dx = jax.lax.conv_general_dilated(
            g, kt, (1, 1), pad, lhs_dilation=(sh, sw), dimension_numbers=_DIMS
        )
    # weight grad: batch-as-contraction conv (GEMM M = kh*kw*cin, N = cout,
    # K = n*oh*ow) — the same transposition autodiff uses
    dk = jax.lax.conv_general_dilated(
        xp[:, :uh, :uw, :].transpose(3, 1, 2, 0),
        g.transpose(1, 2, 0, 3),
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3)
    return dx.astype(xp.dtype), dk.astype(kernel.dtype)


_conv_tiny_cin.defvjp(_conv_tiny_cin_fwd, _conv_tiny_cin_bwd)


def conv2d(
    x: Array,
    kernel: Array,
    bias: Optional[Array],
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    h_mode: str = "zero",
    w_mode: str = "zero",
    ctx: Optional[SpatialCtx] = None,
    compute_dtype: Any = None,
) -> Array:
    """torch ``Conv2d(k, stride, padding)`` semantics (cross-correlation).

    ``kernel`` is HWIO; torch weight (O, I, kh, kw) maps as
    ``kernel[i, j, ic, oc] == w_torch[oc, ic, i, j]``.
    """
    ph, pw = padding
    kh, kw = kernel.shape[:2]
    out_h = (x.shape[1] + 2 * ph - kh) // stride[0] + 1
    out_w_local = (x.shape[2] + 2 * pw - kw) // stride[1] + 1
    if out_h <= 0 or out_w_local <= 0:
        raise ValueError(
            f"conv2d produces empty output {out_h}x{out_w_local} from input "
            f"{x.shape} with k=({kh},{kw}) s={stride} p={padding} — input too "
            "small for this network (torch would error here too; an empty "
            "output would silently turn loss means into NaN)"
        )
    cp = _pg.cin_pad()
    if (
        0 < kernel.shape[2] < cp
        and x.shape[0] * out_h * out_w_local >= _S2D_MIN_M()
    ):
        # Tiny-cin emitter fix (--cin_pad): zero-pad input channels up to
        # cp — exact (zero channels contribute nothing; autodiff's pad
        # transpose slices the grads back). Measured on the v5e: the globe
        # stem 7x7 3->64 drops 6.07 -> 3.92 ms from this pad alone
        # (tools/probe_stem_head.py r5); gated to the same M >= s2d_min_m
        # regime as the other restructures so latency-bound tiny configs
        # skip the extra channels.
        pad_c = cp - kernel.shape[2]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
    x = pad_hw(x, (ph, ph), (pw, pw), h_mode, w_mode, ctx)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    # Opt-in Pallas 3x3 conv path (ops/pallas_conv.py; --pallas_conv 1 /
    # BIASGAN_PALLAS_CONV=1 on TPU, =interpret for CPU tests). Measured
    # (BASELINE.md r3): isolated kernel 0.93-1.10x XLA's emitter, but
    # whole-model 0.83x (globe) — the opaque pallas_call blocks XLA from
    # fusing the norm/act chains around the conv. NOT default; the XLA path
    # is the measured-fastest composition. Kept wired as the native-tier
    # integration point.
    _pc = _pg.pallas_conv()
    if (
        _pc
        and stride == (1, 1)
        and (kh, kw) == (3, 3)
        and padding == (1, 1)
        and kernel.shape[2] >= 128
        and kernel.shape[3] >= 128
        and (x.shape[2] - 2) % 8 == 0
        and x.shape[1] - 2 > 0
        and ctx is None
        and (_pc == "interpret" or jax.default_backend() == "tpu")
    ):
        from biasgan_tpu.ops.pallas_conv import conv3x3_op

        y = conv3x3_op(x, kernel, None, _pc == "interpret")
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    # Opt-in Pallas 7x7 tiny-channel-side path (--conv7_pallas /
    # BIASGAN_CONV7): the resnet generator's stem (cin<=8 after cin_pad)
    # and head (cout<=8) are EMITTER-bound in XLA (BASELINE.md r5
    # attribution — 160-300 GB/s, 2-4 TF/s); the smallcin/smallcout kernels
    # restructure the taps into full MXU passes (ops/pallas_conv7.py).
    _c7 = _pg.conv7_pallas()
    if (
        _c7
        and stride == (1, 1)
        and (kh, kw) == (7, 7)
        and padding == (3, 3)
        and (kernel.shape[2] <= 8) != (kernel.shape[3] <= 8)
        and x.shape[0] * out_h * out_w_local >= _S2D_MIN_M()
        and ctx is None
        and (_c7 == "interpret" or jax.default_backend() == "tpu")
    ):
        from biasgan_tpu.ops.pallas_conv7 import conv7x7_op

        return conv7x7_op(x, kernel, bias, _c7 == "interpret")
    f = (
        _s2d_factor(kernel.shape[-1], out_h, out_w_local, x.shape[0])
        if stride == (1, 1)
        else 1
    )
    if f > 1:
        y = _conv_s2d(x, kernel, f)
    elif (
        kernel.shape[2] <= _S2D_MAX_COUT()
        and x.shape[0] * out_h * out_w_local >= _S2D_MIN_M()
        and _os.environ.get("BIASGAN_NO_TINY_CIN_VJP", "0") == "0"
    ):
        y = _conv_tiny_cin(x, kernel, stride)
    else:
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=stride, padding="VALID", dimension_numbers=_DIMS
        )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _convt_d2s(
    x: Array,
    kflip: Array,
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    output_padding: Tuple[int, int],
    w_mode: str = "zero",
) -> Array:
    """Stride-s transposed conv as s*s phase convolutions in ONE dispatch +
    depth-to-space — the naive ``lhs_dilation`` form feeds s^2-1 zeros per
    real input to the MXU (75% wasted MACs at s=2, the up-path of both G
    families); decomposing output phase r picks kernel taps Kf[u0(r)::s]
    into a dense stride-1 conv. Taps are packed without alignment padding;
    per-phase alignment offsets are applied by slicing the phase's channel
    block of the conv output (delta = (r + u0 - c)//s, c = k-1-p), then the
    blocks interleave as a (sh, sw) depth-to-space. Exact (same arithmetic,
    reassociated).

    ``kflip`` is the already spatially-flipped HWIO kernel."""
    kh, kw, cin, cout = kflip.shape
    sh, sw = stride
    (ph, pw), (oph, opw) = padding, output_padding
    out_h = (x.shape[1] - 1) * sh - 2 * ph + kh + oph
    out_w = (x.shape[2] - 1) * sw - 2 * pw + kw + opw

    def axis(k, s, p, out_len, in_len):
        c = k - 1 - p
        T = -(-out_len // s)  # every phase padded to the max phase length
        phases = []
        for r in range(s):
            u0 = (c - r) % s
            taps = list(range(u0, k, s))
            delta = (r + u0 - c) // s
            phases.append((taps, delta))
        L = max(len(t) for t, _ in phases)
        pad_l = max(0, -min(d for _, d in phases))
        # phase r's block is sliced at t' = d + pad_l .. d + pad_l + T - 1
        # and the VALID conv reads xp up to t' + L - 1
        pad_r = max(
            0, max(d for _, d in phases) + pad_l + T - 1 + L - (in_len + pad_l)
        )
        return phases, L, T, pad_l, pad_r

    ph_h, Lh, Th, plh, prh = axis(kh, sh, ph, out_h, x.shape[1])
    ph_w, Lw, Tw, plw, prw = axis(kw, sw, pw, out_w, x.shape[2])
    # Periodic W (globe longitude): the phases read x at ORIGINAL-space
    # offsets, so a circular pad of x is exactly the periodic dilated
    # signal (zeros between samples are inherent in the dilation either
    # way). Phase decomposition then needs NO materialized W dilation at
    # all — the r5 lever for the bandwidth-bound globe up convs.
    xp = _pad_axis(x, 1, plh, prh, "zero")
    xp = _pad_axis(xp, 2, plw, prw, "wrap" if w_mode == "wrap" else "zero")
    wz = jnp.zeros((Lh, Lw, cin, sh * sw * cout), kflip.dtype)
    for rh, (taps_h, _) in enumerate(ph_h):
        for rw, (taps_w, _) in enumerate(ph_w):
            o = (rh * sw + rw) * cout
            for jh, th in enumerate(taps_h):
                for jw, tw in enumerate(taps_w):
                    wz = wz.at[jh, jw, :, o : o + cout].set(
                        kflip[th, tw, :, :]
                    )
    y = jax.lax.conv_general_dilated(
        xp, wz, (1, 1), "VALID", dimension_numbers=_DIMS
    )
    n = x.shape[0]
    ds_h = [d for _, d in ph_h]
    ds_w = [d for _, d in ph_w]
    if len(set(ds_h)) == 1 and len(set(ds_w)) == 1:
        # all phases share one alignment (e.g. resnet k3 s2 p1 op1): one
        # static slice + reshape, no per-phase copies
        y = y[:, ds_h[0] + plh : ds_h[0] + plh + Th,
              ds_w[0] + plw : ds_w[0] + plw + Tw, :]
        out = y.reshape(n, Th, Tw, sh, sw, cout).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(n, Th * sh, Tw * sw, cout)
        return out[:, :out_h, :out_w, :]
    # per-phase alignment slice, then (sh, sw) interleave
    rows = []
    for rh, dh in enumerate(ds_h):
        cols = []
        for rw, dw in enumerate(ds_w):
            o = (rh * sw + rw) * cout
            blk = jax.lax.dynamic_slice(
                y, (0, dh + plh, dw + plw, o), (n, Th, Tw, cout)
            )
            cols.append(blk)
        rows.append(jnp.stack(cols, axis=3))  # (n, Th, Tw, sw, cout)
    ph_stack = jnp.stack(rows, axis=2)  # (n, Th, sh, Tw, sw, cout)
    out = ph_stack.reshape(n, Th * sh, Tw * sw, cout)
    return out[:, :out_h, :out_w, :]


def conv_transpose2d(
    x: Array,
    kernel: Array,
    bias: Optional[Array],
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    output_padding: Tuple[int, int] = (0, 0),
    ctx: Optional[SpatialCtx] = None,
    compute_dtype: Any = None,
    w_mode: str = "zero",
) -> Array:
    """torch ``ConvTranspose2d(k, stride, padding, output_padding)`` semantics.

    out = (in - 1) * s - 2p + k + op  per spatial dim.

    Implemented as correlation of the stride-dilated input with the spatially
    flipped kernel, padded by (k-1-p, k-1-p+op). ``kernel`` is HWIO with the
    torch layout mapping ``kernel[i, j, ic, oc] == w_torch[ic, oc, i, j]``
    (torch convT weight is (I, O, kh, kw)).

    ``w_mode='wrap'`` makes the W axis periodic (longitude): the dilated
    signal is padded circularly instead of with zeros, so the up-sampled
    field is seamless across the dateline — and identical to the
    halo-exchanged sharded path, whose ring ppermute wraps the same way.

    Under a SpatialCtx (or wrap mode) the W axis is dilated manually to
    ``W * s`` so shard concatenation (resp. circular padding) equals the
    global dilation; this requires output width == W * s, i.e.
    2p = k - s + op — true for every conv-transpose in this zoo
    (k4 s2 p1 op0 and k3 s2 p1 op1).
    """
    kh, kw, _, _ = kernel.shape
    (sh, sw), (ph, pw), (oph, opw) = stride, padding, output_padding
    kflip = kernel[::-1, ::-1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kflip = kflip.astype(compute_dtype)
    if ctx is None and w_mode != "wrap":
        out_h = (x.shape[1] - 1) * sh - 2 * ph + kh + oph
        out_w = (x.shape[2] - 1) * sw - 2 * pw + kw + opw
        f = _s2d_factor(kernel.shape[-1], out_h, out_w, x.shape[0])
        if f > 1:
            # tiny-output-channel transpose (e.g. the U-Net's final
            # 4x4 s2 ->output_nc upconv): space-to-depth restructured conv
            # with the stride dilation kept virtual inside the call
            y = _conv_s2d(
                x,
                kflip,
                f,
                lhs_dilation=(sh, sw),
                padding=(
                    (kh - 1 - ph, kh - 1 - ph + oph),
                    (kw - 1 - pw, kw - 1 - pw + opw),
                ),
            )
        elif (
            (sh > 1 or sw > 1)
            and x.shape[0] * out_h * out_w >= _S2D_MIN_M()
            and _pg.convt_d2s()
        ):
            y = _convt_d2s(x, kflip, stride, padding, output_padding)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kflip,
                window_strides=(1, 1),
                padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
                lhs_dilation=(sh, sw),
                dimension_numbers=_DIMS,
            )
    else:
        if 2 * pw != kw - sw + opw:
            raise ValueError(
                "sharded/periodic conv-transpose requires out_width == "
                f"in_width * stride (2p == k - s + op); got k={kw} s={sw} "
                f"p={pw} op={opw}"
            )
        if ctx is None and _pg.convt_d2s() and (sh > 1 or sw > 1):
            out_h = (x.shape[1] - 1) * sh - 2 * ph + kh + oph
            out_w = (x.shape[2] - 1) * sw - 2 * pw + kw + opw
            if x.shape[0] * out_h * out_w >= _S2D_MIN_M():
                # periodic phase decomposition: no materialized W dilation
                y = _convt_d2s(
                    x, kflip, stride, padding, output_padding, w_mode="wrap"
                )
                if bias is not None:
                    y = y + bias.astype(y.dtype)
                return y
        n, h, w_local, c = x.shape
        # Dilate W manually to w_local * sw with values at multiples of sw;
        # shard concatenation (or one period, in the whole-field wrap case)
        # then equals the global dilation (+ trailing zeros, which land in
        # positions the zero-pad formula pads anyway and which complete the
        # period in the periodic case).
        pad_l = kw - 1 - pw  # left margin of the dilated signal
        pad_r = kw - 1 - pad_l  # == pw
        if ctx is None and _pg.convt_onebuf():
            # One-buffer staging (--convt_onebuf): dilation AND the circular
            # pad written into a single scatter buffer — the dilate-then-pad
            # form materializes the double-width tensor twice (zeros+scatter,
            # then the pad copy); this halves that input-staging traffic.
            # A circular-pad column j holds dilated value d[(j-pad_l) % W2],
            # nonzero only when that index is a multiple of sw.
            W2 = w_local * sw
            xd = jnp.zeros((n, h, pad_l + W2 + pad_r, c), x.dtype)
            xd = xd.at[:, :, pad_l : pad_l + W2 : sw, :].set(x)
            for j in list(range(pad_l)) + list(
                range(pad_l + W2, pad_l + W2 + pad_r)
            ):
                src = (j - pad_l) % W2
                if src % sw == 0:
                    xd = xd.at[:, :, j, :].set(x[:, :, src // sw, :])
        else:
            xd = jnp.zeros((n, h, w_local * sw, c), x.dtype).at[:, :, ::sw, :].set(x)
            if ctx is not None:
                xd = ctx.pad_w(xd, pad_l, pad_r)
            else:  # whole-field periodic
                xd = _pad_axis(xd, 2, pad_l, pad_r, "wrap")
        y = jax.lax.conv_general_dilated(
            xd,
            kflip,
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph), (0, 0)),
            lhs_dilation=(sh, 1),
            dimension_numbers=_DIMS,
        )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def instance_norm(
    x: Array, eps: float = 1e-5, ctx: Optional[SpatialCtx] = None
) -> Array:
    """torch ``InstanceNorm2d(affine=False, track_running_stats=False)``:
    normalize each (sample, channel) over its spatial extent. Stats in f32.

    Under a SpatialCtx the spatial mean/var are global across the sharded W
    axis (local moments + pmean) — this is what makes spatially-tiled
    inference *exactly* equal to the whole-field forward.
    """
    xf = x.astype(jnp.float32)
    axes = (1, 2)
    if ctx is None:
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        mean2 = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
    else:
        mean = ctx.mean_w(xf, axes)
        mean2 = ctx.mean_w(jnp.square(xf), axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


class Norm(nn.Module):
    """Norm dispatcher: 'batch' | 'instance' | 'none'.

    'batch'   — flax BatchNorm, running stats in the 'batch_stats' collection,
                torch-compatible (eps 1e-5, momentum 0.1 => flax momentum 0.9),
                scale ~ N(1, 0.02), bias 0 (reference init_weights semantics).
    'instance'— affine-free instance norm (reference get_norm_layer semantics).
    'none'    — identity.
    """

    norm_type: str = "batch"
    eps: float = 1e-5
    # computation/output dtype; None = float32. flax BatchNorm computes its
    # mean/var in f32 regardless of dtype, so bf16 here only narrows the
    # normalized OUTPUT — halving the activation HBM traffic that dominates
    # the train step (measured 18.6 GB/step at 256^2 b16: bandwidth-bound).
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, ctx: Optional[SpatialCtx] = None
    ) -> Array:
        if self.norm_type == "batch":
            # Under a SpatialCtx (W axis sharded) the batch statistics must
            # be W-GLOBAL to equal the whole-field forward: flax BatchNorm's
            # axis_name pmeans the per-shard mean/E[x^2] moments over the
            # mesh axis — exact for equal-width shards, the same move
            # instance_norm makes below. Eval mode uses running averages
            # (already replicated), no collective.
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=self.eps,
                dtype=self.dtype or jnp.float32,
                scale_init=batchnorm_scale_init,
                axis_name=ctx.axis if (ctx is not None and train) else None,
            )(x)
        if self.norm_type == "instance":
            return instance_norm(x, self.eps, ctx)
        if self.norm_type == "none":
            return x
        raise ValueError(f"unknown norm {self.norm_type!r}")


def apply_activation(x: Array, activation: str) -> Array:
    if activation == "none":
        return x
    if activation == "relu":
        return nn.relu(x)
    if activation == "lrelu":
        return nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation {activation!r}")


def norm_act(
    x: Array,
    norm_type: str,
    name: str,
    train: bool = False,
    ctx: Optional[SpatialCtx] = None,
    activation: str = "none",
    residual: Optional[Array] = None,
    eps: float = 1e-5,
    dtype: Any = None,
) -> Array:
    """norm -> [+ residual] -> activation, the chain that follows every conv.

    A fused Pallas kernel exists for the single-device instance-norm case
    (ops/pallas_fused.py: mean/var, normalize, residual add and activation in
    one VMEM pass) but is OPT-IN (--force_pallas_norm /
    BIASGAN_FORCE_PALLAS_NORM=1): measured on
    the v5e, XLA does NOT fall short here — it fuses the norm chain into the
    surrounding convs, while the opaque pallas_call is a fusion barrier.
    An 18-conv/norm resnet-block chain at 64x64x256 b16 runs 9.4 ms via XLA
    vs 11.8 ms via the kernel, and the full CycleGAN 256^2 step is ~9% faster
    without it (42.7 vs 39.1 samples/s, tools/profile_cyclegan.py). The
    north-star mandate is Pallas *where XLA fusion falls short*
    (BASELINE.json:5); on this chain it doesn't, so the default is XLA. The
    kernel stays tested (tests/unit/test_pallas.py) and the Pallas RDMA halo
    ring (ops/pallas_halo.py) remains the native tier's win surface.
    Must be called inside an nn.compact context when norm_type needs
    parameters ('batch')."""
    if norm_type == "instance" and ctx is None and _pg.force_pallas_norm():
        from biasgan_tpu.ops.pallas_fused import fused_instance_norm_act

        return fused_instance_norm_act(x, residual, activation, eps)
    if norm_type == "instance":
        h = instance_norm(x, eps, ctx)
    else:
        h = Norm(norm_type, eps, dtype, name=name)(x, train, ctx)
    if residual is not None:
        h = h + residual
    return apply_activation(h, activation)


def norm_uses_bias(norm_type: str) -> bool:
    """Reference: conv bias is used iff the following norm is not batch norm
    (batch norm's own bias makes it redundant)."""
    return norm_type != "batch"


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class Conv2d(nn.Module):
    """torch-semantics Conv2d in NHWC. Explicit padding modes so the W axis
    can ride a halo exchange."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    h_mode: str = "zero"
    w_mode: str = "zero"
    init_type: str = "normal"
    init_gain: float = 0.02
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        ctx: Optional[SpatialCtx] = None,
        *,
        fused_plan=None,
        fused_s2_plan=None,
        prologue=None,
        want_moments: bool = False,
        w_halo: bool = False,
        fused_diff: bool = False,
    ):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            make_conv_init(self.init_type, self.init_gain),
            (kh, kw, cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if fused_s2_plan is not None:
            # fused stride-2 down path (ops/pallas_conv.conv3x3s2_fused):
            # phase-plane MXU taps, optional instance-norm+ReLU prologue,
            # output moments. Inference-only; gated by the caller.
            assert self.strides == (2, 2) and (kh, kw) == (3, 3)
            from biasgan_tpu.ops.pallas_conv import conv3x3s2_fused

            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
                kernel = kernel.astype(self.compute_dtype)
            return conv3x3s2_fused(
                x,
                kernel,
                bias,
                prologue=prologue,
                act_pre="relu",
                plan=fused_s2_plan,
                w_mode=self.w_mode,
                want_moments=want_moments,
            )
        if fused_plan is not None:
            # fused resnet-block path (ops/pallas_conv.conv3x3_fused):
            # SAME pad in-kernel, optional instance-norm+ReLU prologue,
            # optional output moments. Gated by the caller; fused_diff=True
            # routes through conv3x3_fused_t (same forward kernel + the
            # exact custom VJP) for the training path.
            from biasgan_tpu.ops.pallas_conv import (
                conv3x3_fused,
                conv3x3_fused_t,
            )

            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
                kernel = kernel.astype(self.compute_dtype)
            return (conv3x3_fused_t if fused_diff else conv3x3_fused)(
                x,
                kernel,
                bias,
                prologue=prologue,
                act_pre="relu",
                plan=fused_plan,
                h_mode=self.h_mode,
                # w_halo: the caller pre-exchanged neighbor columns into the
                # embed_halo_w layout (spatial-sharding composition)
                w_mode="halo" if w_halo else self.w_mode,
                want_moments=want_moments,
            )
        return conv2d(
            x,
            kernel,
            bias,
            self.strides,
            self.padding,
            self.h_mode,
            self.w_mode,
            ctx,
            self.compute_dtype,
        )


class ConvTranspose2d(nn.Module):
    """torch-semantics ConvTranspose2d in NHWC (see conv_transpose2d).
    w_mode='wrap' makes the width axis periodic (longitude)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    w_mode: str = "zero"
    init_type: str = "normal"
    init_gain: float = 0.02
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        ctx: Optional[SpatialCtx] = None,
        *,
        fused_plan=None,
        prologue=None,
        want_moments: bool = False,
    ):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            make_conv_init(self.init_type, self.init_gain),
            (kh, kw, cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if fused_plan is not None:
            # fused up path (ops/pallas_conv.convt3x3s2_fused): torch
            # convT(3, s2, p1, op1) phase-decomposed on the MXU, optional
            # instance-norm+ReLU prologue, output moments; the phase
            # interleave is one XLA stack pass. Inference-only, caller-gated.
            assert (kh, kw) == (3, 3) and self.strides == (2, 2)
            assert self.padding == (1, 1) and self.output_padding == (1, 1)
            from biasgan_tpu.ops.pallas_conv import (
                convt3x3s2_fused,
                interleave_phases,
            )

            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
                kernel = kernel.astype(self.compute_dtype)
            phases, moments = convt3x3s2_fused(
                x,
                kernel,
                bias,
                prologue=prologue,
                act_pre="relu",
                plan=fused_plan,
                w_mode="wrap" if self.w_mode == "wrap" else "zero",
                want_moments=want_moments,
            )
            y = interleave_phases(phases, fused_plan.logical_h)
            return (y, moments) if want_moments else y
        return conv_transpose2d(
            x,
            kernel,
            bias,
            self.strides,
            self.padding,
            self.output_padding,
            ctx,
            self.compute_dtype,
            self.w_mode,
        )
