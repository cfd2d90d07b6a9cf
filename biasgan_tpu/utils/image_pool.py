"""In-graph ImagePool: the reference's 50-slot fake replay buffer
(util/image_pool.py, SURVEY.md section 2.2 [K]) as pure pytree state.

Reference semantics per incoming image (sequential over the batch):
  * while the pool is not full: store the image, return it;
  * once full: with p=0.5 return a randomly chosen stored image and swap the
    new one into its slot, else return the new image untouched.

The naive port would be a stateful host-side buffer — a device round-trip per
step. Here the buffer and fill count live inside the GANTrainState and the
query is a lax.scan of gathers/scatters, so it stays inside the single jitted
train step. Under data parallelism the pool is REPLICATED state: the CycleGAN
DP step all_gathers the global fake batch and queries ONE pool with a shared
rng, so every shard holds an identical buffer and the result matches the
single-device run exactly (models/cyclegan.py query; invariant enforced by
tests/distributed/test_data_parallel.py::
test_cyclegan_pools_replicated_and_match_single_device). Do NOT "fix" this
into per-shard pools — shard_map out_specs P() requires the replication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class PoolState:
    buffer: Array  # (pool_size, H, W, C)
    count: Array  # () int32 — slots filled so far


def create_pool(pool_size: int, shape, dtype=jnp.float32) -> PoolState:
    return PoolState(
        buffer=jnp.zeros((pool_size,) + tuple(shape), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def pool_query(pool: PoolState, images: Array, rng: Array):
    """Query a batch of images through the pool. Returns (new_pool, out)."""
    p = pool.buffer.shape[0]
    if p == 0:
        return pool, images
    keys = jax.random.split(rng, images.shape[0])

    def body(carry, inp):
        buffer, count = carry
        img, key = inp
        k_coin, k_idx = jax.random.split(key)
        not_full = count < p
        swap = jnp.logical_and(
            jnp.logical_not(not_full), jax.random.uniform(k_coin) > 0.5
        )
        rand_idx = jax.random.randint(k_idx, (), 0, p)
        write_idx = jnp.where(not_full, count, rand_idx)
        out = jnp.where(swap, buffer[rand_idx], img)
        new_img = jnp.where(jnp.logical_or(not_full, swap), img, buffer[write_idx])
        buffer = buffer.at[write_idx].set(new_img)
        count = jnp.minimum(count + not_full.astype(jnp.int32), p)
        return (buffer, count), out

    (buf, count), outs = jax.lax.scan(body, (pool.buffer, pool.count), (images, keys))
    return PoolState(buffer=buf, count=count), outs
