"""Pallas RDMA ring halo exchange (ops/pallas_halo.py) under the TPU
interpreter on the virtual CPU mesh: raw-op semantics vs ppermute, and the
full spatially-sharded generator forward with rdma halos vs the whole-field
forward (exactness is the whole point — SURVEY.md section 5 long-context row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from biasgan_tpu.nn import define_G, init_params
from biasgan_tpu.ops.pallas_halo import halo_exchange_w
from biasgan_tpu.parallel import make_mesh, spatial_apply
from biasgan_tpu.parallel.spatial import HaloCtx

N_SHARDS = 4


def _mesh():
    return make_mesh(data=1, spatial=N_SHARDS)


def _x(w_total, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (2, 6, w_total, 3))


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("left,right", [(1, 1), (2, 3), (3, 0), (0, 2)])
def test_rdma_halos_match_ppermute(periodic, left, right):
    mesh = _mesh()
    x = _x(8 * N_SHARDS)
    ref_ctx = HaloCtx(axis="spatial", n_shards=N_SHARDS, periodic=periodic)

    def via_rdma(xl):
        lh, rh = halo_exchange_w(
            xl, left, right, "spatial", periodic, interpret=True
        )
        parts = ([lh] if left else []) + [xl] + ([rh] if right else [])
        return jnp.concatenate(parts, axis=2)

    def via_ppermute(xl):
        return ref_ctx.pad_w(xl, left, right)

    spec = P(None, None, "spatial", None)
    got = jax.jit(
        shard_map(via_rdma, mesh=mesh, in_specs=(spec,), out_specs=spec,
                  check_vma=False)
    )(x)
    want = jax.jit(
        shard_map(via_ppermute, mesh=mesh, in_specs=(spec,), out_specs=spec,
                  check_vma=False)
    )(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_generator_with_rdma_equals_whole_field():
    mesh = _mesh()
    G = define_G("resnet_2blocks", output_nc=3, ngf=8, norm="instance",
                 w_mode="wrap")
    x = _x(16 * N_SHARDS, seed=3)
    v = init_params(G, jax.random.PRNGKey(1), x)
    whole = G.apply(v, x, False)
    fwd = jax.jit(spatial_apply(G, mesh, train=False, periodic=True,
                                rdma=True, interpret=True))
    sharded = fwd(v, x)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(whole), rtol=2e-5, atol=2e-5
    )


def test_halo_wider_than_shard_rejected():
    x = jnp.zeros((1, 4, 4, 1))  # local shard width 4 inside shard_map

    def f(xl):
        return halo_exchange_w(xl, 5, 0, "spatial", True, interpret=True)[0]

    mesh = _mesh()
    spec = P(None, None, "spatial", None)
    with pytest.raises(ValueError, match="wider than local shard"):
        jax.jit(
            shard_map(f, mesh=mesh, in_specs=(spec,), out_specs=spec,
                      check_vma=False)
        )(jnp.zeros((1, 4, 4 * N_SHARDS, 1)))
