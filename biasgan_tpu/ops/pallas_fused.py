"""Pallas TPU kernels: fused instance-norm (+ residual + activation).

North-star mandate (BASELINE.json line 5): "conv+norm+activation blocks
lowered to Pallas kernels where XLA fusion falls short". The conv itself
belongs on the MXU via XLA (hand-writing it would only lose); what XLA does
NOT always fuse into one VMEM round-trip is the chain that follows every conv
in the ResNet/CycleGAN generators:

    instance-norm (two reductions over HxW) -> [+ residual] -> ReLU/LeakyReLU

This kernel computes mean/var, normalization, residual add and activation in
a single pass over a (1, H, W, Ct) VMEM block — one HBM read of x (+ one of
the residual) and one write, vs. XLA's reduce / broadcast-normalize chains.

Differentiability: pallas_call has no automatic VJP, so the op carries a
custom_vjp whose backward is plain jnp (the standard instance-norm pullback
dx = inv * (dz - mean(dz) - xhat * mean(dz * xhat))) — XLA fuses the backward
fine; the forward is where the fusion gap was.

Guard rails: falls back to the pure-jnp path when the block would not fit
comfortably in VMEM, when running on non-TPU backends (tests run the kernel
in interpret mode explicitly), or under a spatial-sharding ctx (the halo path
needs cross-shard pmean stats — parallel/spatial.py).

Tiling: blocks are (1, H, W, Ct) with Ct a multiple of the lane width (128)
where possible — f32 min tile (8, 128) (pallas_guide.md, Tiling Constraints).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # Pallas is TPU-stack-only; keep the module importable anywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Array = jax.Array

_VMEM_BUDGET_BYTES = 6 * 1024 * 1024  # per input block, leave headroom in 16MB


def _act(z: Array, activation: str) -> Array:
    if activation == "none":
        return z
    if activation == "relu":
        return jnp.maximum(z, 0.0)
    if activation == "lrelu":
        return jnp.where(z > 0, z, 0.2 * z)
    raise ValueError(f"unknown activation {activation!r}")


def _act_grad_from_out(out: Array, activation: str) -> Array:
    # relu/lrelu are monotone with act(z) > 0 <=> z > 0, so the mask
    # reconstructs from the saved output — no extra residual to store.
    if activation == "none":
        return jnp.ones_like(out)
    if activation == "relu":
        return (out > 0).astype(out.dtype)
    if activation == "lrelu":
        return jnp.where(out > 0, 1.0, 0.2).astype(out.dtype)
    raise ValueError(activation)


# ---------------------------------------------------------------------------
# reference (XLA) path — also the fallback and the test oracle
# ---------------------------------------------------------------------------


def _reference_impl(
    x: Array, residual: Optional[Array], activation: str, eps: float
) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
    z = (xf - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    if residual is not None:
        z = z + residual.astype(jnp.float32)
    return _act(z, activation).astype(x.dtype)


# ---------------------------------------------------------------------------
# pallas forward kernel
# ---------------------------------------------------------------------------


def _fused_kernel(x_ref, out_ref, *, activation: str, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    z = (xf - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = _act(z, activation).astype(out_ref.dtype)


def _fused_kernel_res(x_ref, r_ref, out_ref, *, activation: str, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    z = (xf - mean) * jax.lax.rsqrt(var + eps)
    z = z + r_ref[...].astype(jnp.float32)
    out_ref[...] = _act(z, activation).astype(out_ref.dtype)


def _pallas_forward(
    x: Array, residual: Optional[Array], activation: str, eps: float,
    interpret: bool = False,
) -> Array:
    n, h, w, c = x.shape
    # channel tile: lane-width multiples when C allows, else whole C
    ct = 128 if c % 128 == 0 else c
    grid = (n, c // ct)
    spec = pl.BlockSpec(
        (1, h, w, ct), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    kwargs = dict(
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        out_specs=spec,
        interpret=interpret,
    )
    if residual is None:
        kern = functools.partial(_fused_kernel, activation=activation, eps=eps)
        return pl.pallas_call(kern, in_specs=[spec], **kwargs)(x)
    kern = functools.partial(_fused_kernel_res, activation=activation, eps=eps)
    return pl.pallas_call(kern, in_specs=[spec, spec], **kwargs)(x, residual)


def _block_fits(x: Array) -> bool:
    n, h, w, c = x.shape
    ct = 128 if c % 128 == 0 else c
    return h * w * ct * 4 <= _VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_instance_norm_act(
    x: Array,
    residual: Optional[Array],
    activation: str = "relu",
    eps: float = 1e-5,
    use_pallas: bool = True,
    interpret: bool = False,
) -> Array:
    """instance_norm(x) [+ residual] -> activation, fused.

    Matches ``instance_norm`` in nn/layers.py (affine-free, f32 stats) —
    asserted to float tolerance by tests/unit/test_pallas.py.
    """
    import os

    if (
        use_pallas
        and _HAS_PALLAS
        and not os.environ.get("BIASGAN_NO_PALLAS")
        and _block_fits(x)
        and (interpret or jax.default_backend() == "tpu")
    ):
        return _pallas_forward(x, residual, activation, eps, interpret)
    return _reference_impl(x, residual, activation, eps)


def _fwd(x, residual, activation, eps, use_pallas, interpret):
    out = fused_instance_norm_act(x, residual, activation, eps, use_pallas, interpret)
    # recompute-light residuals: xhat and inv_std from a cheap second pass.
    # `residual` rides along only for its pytree structure (None vs array) —
    # custom_vjp residuals must be JAX types, so no dtypes/bools here.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    xhat = (xf - mean) * inv
    return out, (xhat, inv, out, residual)


def _bwd(activation, eps, use_pallas, interpret, res, g):
    xhat, inv, out, residual = res
    in_dtype = out.dtype
    gf = g.astype(jnp.float32)
    dz = gf * _act_grad_from_out(out.astype(jnp.float32), activation)
    m_dz = jnp.mean(dz, axis=(1, 2), keepdims=True)
    m_dzx = jnp.mean(dz * xhat, axis=(1, 2), keepdims=True)
    dx = inv * (dz - m_dz - xhat * m_dzx)
    d_res = dz.astype(residual.dtype) if residual is not None else None
    return dx.astype(in_dtype), d_res


fused_instance_norm_act.defvjp(_fwd, _bwd)
