"""Spatial sharding: halo-exchanged generator inference over the mesh.

This is the build's sequence-parallel analog (SURVEY.md section 5,
"Long-context / sequence parallelism" row): the reference's "long input"
problem is spatial — applying G to a full 721x1440 global field — and the
judged config (BASELINE.json line 10) demands it in ONE jitted call via
halo-exchanged spatial tiling.

Design (and why it is EXACT, not approximate):
  * the width (longitude) axis is sharded over the mesh 'spatial' axis;
  * every conv pads its W axis by exchanging a halo of exactly its kernel
    margin with ring neighbors (lax.ppermute; wrap-around for the periodic
    longitude, zero-filled at the global edges otherwise — ppermute's
    missing-source semantics give zero padding for free);
  * instance norm computes its spatial statistics *globally* via pmean, so
    normalization is identical to the whole-field forward;
  * conv-transposes dilate locally to W_local * stride so the shard
    concatenation equals the global dilation (nn/layers.py).
Hence the sharded forward computes literally the same function as the
whole-field forward — verified to float tolerance by
tests/distributed/test_spatial.py — instead of the classic overlap-tile
approximation, which breaks under any norm with global statistics.

Constraints: W_global must be divisible by n_shards * stride_product (use
pad_to_multiple), and reflect padding on W is unsupported (use 'wrap' —
physically right for longitude — or 'zero').
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HaloCtx:
    """SpatialCtx implementation (see nn/layers.py protocol) for a width axis
    sharded over ``n_shards`` devices along mesh axis ``axis``."""

    axis: str = "spatial"
    n_shards: int = 1
    periodic: bool = True
    # use the Pallas inter-chip RDMA ring (ops/pallas_halo.py) instead of
    # lax.ppermute — both halo directions ride the two ICI ring directions
    # concurrently. Inference-only (no VJP). interpret=True runs the kernel
    # under the Pallas TPU interpreter (CPU tests).
    rdma: bool = False
    interpret: bool = False

    def _perm(self, towards_right: bool):
        n = self.n_shards
        if towards_right:  # data moves r -> r+1 (dest receives its LEFT halo)
            pairs = [(i, i + 1) for i in range(n - 1)]
            if self.periodic:
                pairs.append((n - 1, 0))
        else:  # data moves r -> r-1 (dest receives its RIGHT halo)
            pairs = [(i + 1, i) for i in range(n - 1)]
            if self.periodic:
                pairs.append((0, n - 1))
        return pairs

    def pad_w(self, x: Array, left: int, right: int) -> Array:
        """Exchange halos along W (axis 2 of NHWC). Non-periodic global edges
        receive zeros (ppermute zero-fills missing sources = zero padding)."""
        if self.rdma and (left > 0 or right > 0):
            from biasgan_tpu.ops.pallas_halo import halo_exchange_w

            lh, rh = halo_exchange_w(
                x, left, right, self.axis, self.periodic, self.interpret
            )
            parts = ([lh] if left > 0 else []) + [x] + ([rh] if right > 0 else [])
            return jnp.concatenate(parts, axis=2)
        if max(left, right) > x.shape[2]:
            raise ValueError(
                f"halo ({left},{right}) wider than local shard width "
                f"{x.shape[2]}; use fewer shards or a wider field"
            )
        parts = []
        if left > 0:
            send = x[:, :, -left:, :]
            parts.append(jax.lax.ppermute(send, self.axis, self._perm(True)))
        parts.append(x)
        if right > 0:
            send = x[:, :, :right, :]
            parts.append(jax.lax.ppermute(send, self.axis, self._perm(False)))
        return jnp.concatenate(parts, axis=2) if len(parts) > 1 else x

    def mean_w(self, x: Array, axes: Sequence[int], keepdims: bool = True) -> Array:
        """Global mean when axis 2 (W) is in the reduction (equal shard
        widths make a plain pmean of local means exact)."""
        m = jnp.mean(x, axis=tuple(axes), keepdims=keepdims)
        if 2 in axes:
            m = jax.lax.pmean(m, self.axis)
        return m


def pad_to_multiple(
    x: Array, multiple: int, axis: int = 2, mode: str = "wrap"
) -> Tuple[Array, int]:
    """Pad ``axis`` up to the next multiple (wrap = periodic continuation,
    natural for longitude). Returns (padded, original_size) for cropping."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, target - size)
    if mode == "zero":
        return jnp.pad(x, cfg), size
    return jnp.pad(x, cfg, mode=mode), size


def _batch_leaf_spec(leaf, data: bool, scan: bool = False) -> P:
    """Partition spec for one batch-dict leaf under spatial(+data) training:
    (B,H,W,C) fields shard W over 'spatial' (and B over 'data' when a data
    axis exists); lower-rank riders (per-variable stats) shard only B. Under
    ``scan`` (--steps_per_call stacks) every leaf carries a leading
    replicated (k, ...) axis, so the field rank threshold and both shard
    axes shift right by one."""
    d = "data" if data else None
    lead = (None,) if scan else ()
    ndim = getattr(leaf, "ndim", 0)
    if ndim >= 4 + len(lead):
        return P(*lead, d, None, "spatial", None)
    return P(*lead, d) if d else P()


def spatial_train_step(train_step, mesh: Mesh, cfg=None, scan_k: int = 1):
    """shard_map a train step for spatially-sharded TRAINING: the W
    (longitude) axis of every field in the batch is sharded over the mesh
    'spatial' axis (composing with a 'data' axis when the mesh has one), the
    state stays replicated, and the step — built with a HaloCtx and
    axis_name covering every mesh axis — exchanges conv halos and pmeans
    instance-norm stats, losses and grads over ICI.

    The in-graph W-flip / lon-roll augmentation is nonlocal along the
    sharded axis, so it is applied HERE, at the jit level outside the
    shard_map, where GSPMD partitions the flip/roll (collectives as needed);
    the step itself skips aug under a ctx. Standardization is pointwise and
    commutes with both, so it stays inside.

    Sequence-parallel-analog TRAINING (SURVEY.md section 5): fields larger
    than one chip's memory train exactly — same function as the whole-field
    step (tests/distributed/test_spatial_train.py).

    ``scan_k > 1`` composes with --steps_per_call: ``train_step`` is then a
    make_scan_step wrapper over (k, ...) stacked batches; the stack's leading
    axis stays replicated while B/W shard as usual, and the wrapper-level aug
    mirrors the scan body's per-step rng fold so each scanned step draws the
    same augmentations the sequential run would."""
    data = "data" in mesh.axis_names
    aug = cfg is not None and getattr(cfg, "in_graph_aug", False)
    scan = scan_k > 1

    def wrapped(state, batch, rng):
        return train_step(state, batch, rng)

    def _state_specs(state):
        """Params/opts/step replicate; replay-pool field buffers (rank>=4,
        e.g. CycleGAN's (pool_size, H, W, C) fakes) shard their W axis like
        the batch — the pool is a pytree of the SAME sharded fields."""
        specs = jax.tree_util.tree_map(lambda _: P(), state)
        pools = getattr(state, "pools", None)
        if pools:
            pool_specs = jax.tree_util.tree_map(
                lambda l: P(None, None, "spatial", None)
                if getattr(l, "ndim", 0) >= 4
                else P(),
                pools,
            )
            specs = specs.replace(pools=pool_specs)
        return specs

    def call(state, batch, rng):
        if aug:
            from biasgan_tpu.data.transforms import in_graph_augment
            from biasgan_tpu.models.common import aug_key

            # the SAME constant-fold key the in-step aug uses (common.py
            # aug_key): disjoint from every split-derived dropout/gp/pool
            # stream by construction, and draw-for-draw identical to the
            # single-device run when there is no data axis
            flip = not getattr(cfg, "no_flip", False)
            roll = getattr(cfg, "aug_lon_roll", False)
            if scan:
                # per-scanned-step keys: the scan body steps with
                # fold_in(rng, i) (models/common.py make_scan_step), so
                # step i's aug key is aug_key(fold_in(rng, i))
                keys = jnp.stack(
                    [aug_key(jax.random.fold_in(rng, i)) for i in range(scan_k)]
                )
                batch = jax.vmap(
                    lambda b, r: in_graph_augment(b, r, flip=flip, lon_roll=roll)
                )(batch, keys)
            else:
                batch = in_graph_augment(
                    batch, aug_key(rng), flip=flip, lon_roll=roll
                )
        st_spec = _state_specs(state)
        in_specs = (
            st_spec,
            {k: _batch_leaf_spec(v, data, scan) for k, v in batch.items()},
            P(),
        )
        vis_spec = P("data" if data else None, None, "spatial", None)
        return _shard_map(
            wrapped,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(st_spec, P(), vis_spec),
            check_vma=False,
        )(state, batch, rng)

    return call


def shard_batch_spatial(batch, mesh: Mesh, scan: bool = False):
    """Place a host batch with W sharded over 'spatial' (and the batch axis
    over 'data' when present); ``scan`` for (k, ...) --steps_per_call
    stacks."""
    from jax.sharding import NamedSharding

    data = "data" in mesh.axis_names
    return {
        k: jax.device_put(v, NamedSharding(mesh, _batch_leaf_spec(v, data, scan)))
        for k, v in batch.items()
    }


def spatial_apply(
    module,
    mesh: Mesh,
    train: bool = False,
    periodic: bool = True,
    mesh_axis: str = "spatial",
    rdma: bool = False,
    interpret: Optional[bool] = None,
) -> Callable[[Any, Array], Array]:
    """Build fn(variables, x_global) running ``module`` with x's W axis
    sharded over ``mesh_axis``. Jit the result once and reuse — one jitted
    call end-to-end, collectives ride ICI. ``rdma=True`` swaps the ppermute
    halo exchange for the Pallas remote-DMA ring (inference only)."""
    n = mesh.shape[mesh_axis]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ctx = HaloCtx(
        axis=mesh_axis, n_shards=n, periodic=periodic, rdma=rdma,
        interpret=interpret,
    )

    def fwd(variables, x_local):
        return module.apply(variables, x_local, train, ctx)

    spec = P(None, None, mesh_axis, None)
    return _shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), spec),
        out_specs=spec,
        check_vma=False,
    )
