"""Distributed (virtual CPU mesh): halo-exchange spatial sharding.

THE invariant (SURVEY.md section 4 item 3, BASELINE.json line 10): the
spatially-sharded generator forward equals the whole-field forward to float
tolerance — for every architecture, including instance norm (global stats via
pmean) and stride-2 down/up paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.nn import define_G, init_params
from biasgan_tpu.parallel import make_mesh, pad_to_multiple, spatial_apply
from biasgan_tpu.parallel.spatial import HaloCtx

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

RNG = jax.random.PRNGKey(0)


def _field(h, w, c=1, key=3):
    return jax.random.normal(jax.random.PRNGKey(key), (1, h, w, c))


def test_halo_pad_matches_wrap():
    """HaloCtx.pad_w on a sharded axis == jnp.pad(mode='wrap') globally."""
    mesh = make_mesh(data=1, spatial=4)
    x = _field(8, 32)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ctx = HaloCtx("spatial", 4, periodic=True)
    f = shard_map(
        lambda v: ctx.pad_w(v, 2, 1),
        mesh=mesh,
        in_specs=P(None, None, "spatial", None),
        out_specs=P(None, None, "spatial", None),
        check_vma=False,
    )
    out = np.asarray(jax.jit(f)(x))  # (1, 8, 4*(8+3), 1) shard-concatenated
    xn = np.asarray(x)
    for r in range(4):
        lo, hi = r * 8, (r + 1) * 8
        seg = np.concatenate(
            [xn[:, :, (lo - 2) % 32 : (lo - 2) % 32 + 2], xn[:, :, lo:hi],
             xn[:, :, hi % 32 : hi % 32 + 1]], axis=2,
        )
        np.testing.assert_array_equal(out[:, :, r * 11 : (r + 1) * 11], seg)


@pytest.mark.parametrize(
    "netG,norm,hw",
    [
        ("resnet_3blocks", "instance", 32),
        ("resnet_6blocks", "instance", 64),
        ("unet_d3", "instance", 64),
        ("unet_d3", "none", 32),
    ],
)
def test_sharded_forward_equals_whole_field(netG, norm, hw):
    n_shards = 4
    G = define_G(netG, output_nc=1, ngf=8, norm=norm, w_mode="wrap")
    x = _field(hw, hw)
    v = init_params(G, RNG, x)
    whole = G.apply(v, x, False)

    mesh = make_mesh(data=1, spatial=n_shards)
    fwd = jax.jit(spatial_apply(G, mesh, train=False, periodic=True))
    sharded = fwd(v, x)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(whole), rtol=1e-4, atol=1e-5
    )


def test_sharded_forward_zero_edges():
    """Non-periodic: ppermute zero-fill must equal local zero padding."""
    G = define_G("resnet_3blocks", output_nc=1, ngf=8, norm="instance", w_mode="zero")
    # reflect on H is fine; W uses zero so edges must match local zero-pad
    x = _field(32, 32)
    v = init_params(G, RNG, x)
    whole = G.apply(v, x, False)
    mesh = make_mesh(data=1, spatial=4)
    fwd = jax.jit(spatial_apply(G, mesh, train=False, periodic=False))
    np.testing.assert_allclose(
        np.asarray(fwd(v, x)), np.asarray(whole), rtol=1e-4, atol=1e-5
    )


def test_global_grid_pipeline():
    """Downscaled full-globe path (BASELINE.json line 10): odd sizes (721-like,
    i.e. 91x180 downscaled 721x1440) -> pad H (reflect, non-periodic latitude)
    and W (wrap, periodic longitude) to multiples -> sharded forward -> crop
    -> equals whole-field on the same padded grid."""
    G = define_G("resnet_3blocks", output_nc=2, ngf=8, norm="instance", w_mode="wrap")
    x = _field(91, 180, c=2)  # odd H, non-multiple W (downscaled 721x1440)
    xp, h0 = pad_to_multiple(x, 4, axis=1, mode="reflect")  # 2^downs
    xp, w0 = pad_to_multiple(xp, 8 * 4, axis=2, mode="wrap")  # shards * 2^downs
    v = init_params(G, RNG, xp)
    whole = G.apply(v, xp, False)[:, :h0, :w0, :]
    mesh = make_mesh(data=1, spatial=4)
    fwd = jax.jit(spatial_apply(G, mesh, train=False, periodic=True))
    sharded = fwd(v, xp)[:, :h0, :w0, :]
    assert sharded.shape == (1, 91, 180, 2)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(whole), rtol=1e-4, atol=1e-5
    )


def test_pad_to_multiple():
    x = jnp.arange(10.0).reshape(1, 1, 10, 1)
    xp, orig = pad_to_multiple(x, 8, axis=2, mode="wrap")
    assert xp.shape[2] == 16 and orig == 10
    np.testing.assert_array_equal(np.asarray(xp[0, 0, 10:16, 0]), np.arange(6.0))
