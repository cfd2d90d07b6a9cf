"""Unit tests: in-graph ImagePool matches the reference's replay semantics
(util/image_pool.py [K])."""

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu.utils.image_pool import create_pool, pool_query


def _img(v):
    return jnp.full((1, 2, 2, 1), float(v))


def test_fills_before_replaying():
    pool = create_pool(4, (2, 2, 1))
    rng = jax.random.PRNGKey(0)
    for i in range(4):
        pool, out = pool_query(pool, _img(i), jax.random.fold_in(rng, i))
        # while filling, the query returns the incoming image untouched
        np.testing.assert_array_equal(np.asarray(out), np.asarray(_img(i)))
    assert int(pool.count) == 4
    stored = sorted(float(x) for x in np.asarray(pool.buffer[:, 0, 0, 0]))
    assert stored == [0.0, 1.0, 2.0, 3.0]


def test_replay_statistics():
    """Once full: ~50% of queries return a stored image (and swap)."""
    pool = create_pool(8, (2, 2, 1))
    rng = jax.random.PRNGKey(1)
    for i in range(8):
        pool, _ = pool_query(pool, _img(-1 - i), jax.random.fold_in(rng, i))
    replayed = 0
    n = 400
    for i in range(n):
        # distinct incoming value each query, so a replayed (stored) return
        # is always distinguishable from passthrough
        pool, out = pool_query(pool, _img(1000 + i), jax.random.fold_in(rng, 100 + i))
        if float(out[0, 0, 0, 0]) != 1000 + i:
            replayed += 1
    assert 0.35 < replayed / n < 0.65


def test_zero_pool_passthrough():
    pool = create_pool(0, (2, 2, 1))
    pool2, out = pool_query(pool, _img(5), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_img(5)))


def test_batch_is_sequential():
    """Batched query applies the reference's per-image sequential logic."""
    pool = create_pool(2, (2, 2, 1))
    batch = jnp.concatenate([_img(0), _img(1), _img(2)], axis=0)
    pool, out = pool_query(pool, batch, jax.random.PRNGKey(0))
    assert int(pool.count) == 2  # filled by the first two images
