"""Pallas inter-chip RDMA halo exchange for spatially-sharded inference.

SURVEY.md section 5 (long-context row) and section 7 PR6: the halo exchange
that feeds every conv in the spatially-sharded generator is first implemented
with ``lax.ppermute`` (parallel/spatial.py); this module is the
``make_async_remote_copy`` ring variant (pallas_guide.md sections 10 and 18)
— one kernel launches BOTH directions' RDMAs concurrently, so the left and
right halos ride the two ICI ring directions at once, and the transfers are
explicit (engine-scheduled) rather than collective-compiled.

Semantics match HaloCtx.pad_w exactly: periodic wrap for the longitude ring,
zero-filled halos at the global edges otherwise (implemented SPMD-symmetric:
always exchange on the ring, then mask the edge shards — identical to
ppermute's missing-source zero-fill, with no semaphore asymmetry).

INFERENCE-ONLY: the op has no VJP (full-globe application is a forward pass,
BASELINE.json line 10); training keeps the differentiable ppermute path.

Testing: runs under the Pallas TPU interpreter on the virtual CPU mesh
(tests/distributed/test_pallas_halo.py asserts equality with the ppermute
path and with the whole-field forward). On hardware it requires a real
multi-chip ring.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Array = jax.Array


def _halo_kernel(
    x_ref,
    left_out,
    right_out,
    send_r_sem,
    recv_l_sem,
    send_l_sem,
    recv_r_sem,
    *,
    left: int,
    right: int,
    axis: str,
):
    """Bidirectional ring exchange. My last ``left`` columns go to my right
    neighbor (becoming its left halo); my first ``right`` columns go to my
    left neighbor (its right halo). Both RDMAs are started before either is
    waited on — the two ICI directions run concurrently."""
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    rnb = jax.lax.rem(me + 1, n)
    lnb = jax.lax.rem(me - 1 + n, n)

    w = x_ref.shape[2]
    rdmas = []
    if left > 0:
        rdmas.append(
            pltpu.make_async_remote_copy(
                src_ref=x_ref.at[:, :, w - left :, :],
                dst_ref=left_out,
                send_sem=send_r_sem,
                recv_sem=recv_l_sem,
                device_id=rnb,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        )
    if right > 0:
        rdmas.append(
            pltpu.make_async_remote_copy(
                src_ref=x_ref.at[:, :, :right, :],
                dst_ref=right_out,
                send_sem=send_l_sem,
                recv_sem=recv_r_sem,
                device_id=lnb,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        )
    for r in rdmas:
        r.start()
    for r in rdmas:
        r.wait()


def halo_exchange_w(
    x: Array,
    left: int,
    right: int,
    axis: str,
    periodic: bool = True,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Exchange W-axis halos over the mesh ring via Pallas RDMA.

    x: local (N, H, W_local, C) shard inside shard_map over ``axis``.
    Returns (left_halo (N,H,left,C), right_halo (N,H,right,C)) — what pad_w
    concatenates around x. Must be called with left>0 or right>0.
    """
    if not _HAS_PALLAS:
        raise RuntimeError("Pallas unavailable; use the ppermute halo path")
    n, h, w, c = x.shape
    if max(left, right) > w:
        raise ValueError(
            f"halo ({left},{right}) wider than local shard width {w}; "
            "use fewer shards or a wider field"
        )
    kern = functools.partial(_halo_kernel, left=left, right=right, axis=axis)
    left_halo, right_halo = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n, h, max(left, 1), c), x.dtype),
            jax.ShapeDtypeStruct((n, h, max(right, 1), c), x.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7
        ),
        interpret=interpret,
    )(x)

    if not periodic:
        # SPMD-symmetric edge handling: the ring always wraps; zero the halos
        # that crossed the global boundary (== ppermute's zero-fill).
        me = jax.lax.axis_index(axis)
        nsh = jax.lax.axis_size(axis)
        left_halo = jnp.where(me == 0, jnp.zeros_like(left_halo), left_halo)
        right_halo = jnp.where(
            me == nsh - 1, jnp.zeros_like(right_halo), right_halo
        )
    return left_halo[:, :, : left or 1, :], right_halo[:, :, : right or 1, :]
