"""Distribution layer: device mesh, data parallelism, spatial sharding.

The reference's only distribution is single-process ``torch.nn.DataParallel``
(SURVEY.md sections 2.3 and 3.5 [K]). This layer replaces it wholesale with SPMD
over a ``jax.sharding.Mesh``:

  * data_parallel — shard_map'd train step, grads/stats pmean'd over ICI;
  * spatial       — halo-exchange width sharding of the generator for exact
                    full-globe tiled inference (the sequence-parallel analog).
"""

from biasgan_tpu.parallel.mesh import make_mesh
from biasgan_tpu.parallel.data_parallel import data_parallel_step, shard_batch
from biasgan_tpu.parallel.spatial import HaloCtx, spatial_apply, pad_to_multiple

__all__ = [
    "make_mesh",
    "data_parallel_step",
    "shard_batch",
    "HaloCtx",
    "spatial_apply",
    "pad_to_multiple",
]
