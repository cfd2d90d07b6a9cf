"""Data-parallel training over the mesh 'data' axis.

Replaces the reference's ``DataParallel(gpu_ids)`` scatter/gather (SURVEY.md
section 3.5 [K]) with true SPMD: the per-model train step (built with
``axis_name='data'`` so it pmeans grads, batch-norm stats and losses over
ICI) runs under shard_map; parameters and optimizer state stay replicated,
the batch is sharded on its leading axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def data_parallel_step(train_step, mesh: Mesh, batch_axis: int = 0):
    """Wrap a train step (built with axis_name='data') in shard_map.

    in:  state replicated, batch sharded on ``batch_axis``, rng replicated
    out: state replicated (grads were pmean'd), losses replicated,
         visuals sharded on their batch axis.

    ``batch_axis=1`` composes with make_scan_step's stacked (k, B, ...)
    batches — the scan runs inside shard_map, so each shard scans its own
    k-step slice while grads pmean over ICI every step.
    """
    batch_spec = P(*([None] * batch_axis), "data")
    return _shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P(), P("data")),
        check_vma=False,
    )


def shard_batch(
    batch: Dict[str, Any], mesh: Mesh, batch_axis: int = 0
) -> Dict[str, Any]:
    """Place a host batch with axis ``batch_axis`` sharded over 'data'
    (axis 1 for (k, B, ...) stacked multi-step batches)."""
    sharding = NamedSharding(mesh, P(*([None] * batch_axis), "data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
