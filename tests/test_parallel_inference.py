"""Sharded stereo/TSDF inference vs single-device results (8-dev CPU mesh).

conftest spoofs an 8-device CPU platform; the same code paths drive real
TPU slices.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # long tail: excluded from the default (<5 min) selection

import jax
import jax.numpy as jnp

from gs2mesh_tpu.parallel.mesh import make_mesh
from gs2mesh_tpu.parallel.inference import (make_sharded_dlnr,
                                            make_sharded_integrate,
                                            shard_volume)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(data=8, gauss=1)


def test_sharded_dlnr_matches_single(mesh, request):
    from gs2mesh_tpu.stereo import DLNRConfig, dlnr_forward, init_dlnr_params
    from gs2mesh_tpu.stereo.layers import matmul_dtype

    # Pin full f32: this test validates SHARDING equivalence; under the
    # bf16 matmul policy XLA may tile the sharded vs single conv layouts
    # differently, adding rounding noise unrelated to the sharding.
    ctx = matmul_dtype(None)
    ctx.__enter__()
    request.addfinalizer(lambda: ctx.__exit__(None, None, None))

    params = init_dlnr_params(seed=0)
    cfg = DLNRConfig(iters=1)
    rng = np.random.default_rng(0)
    H, W = 32, 64
    im1 = jnp.asarray(rng.uniform(0, 255, (8, 3, H, W)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (8, 3, H, W)).astype(np.float32))

    run = make_sharded_dlnr(mesh, cfg)
    flow_s, disp_s = run(params, im1, im2)

    flow_1, disp_1 = jax.jit(
        lambda p, a, b: dlnr_forward(p, a, b, cfg))(params, im1, im2)
    np.testing.assert_allclose(np.asarray(disp_s), np.asarray(disp_1),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(flow_s), np.asarray(flow_1),
                               atol=2e-4, rtol=1e-3)


def test_sharded_tsdf_matches_single(mesh):
    from gs2mesh_tpu.fusion import TSDFConfig, create_volume, integrate_view
    from gs2mesh_tpu.fusion.tsdf import allocate
    from tests.test_fusion import look_at_extrinsic, sphere_depth

    cfg = TSDFConfig(voxel_size=0.05, sdf_trunc=0.2, block_capacity=1 << 10)
    K = jnp.asarray(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                             np.float32))
    rng = np.random.default_rng(1)

    vol_single = create_volume(cfg)
    vol_shard = shard_volume(create_volume(cfg), mesh)
    step = make_sharded_integrate(mesh, cfg)

    for i, ang in enumerate((0.0, 0.8, 1.6)):
        eye = np.array([3 * np.sin(ang), 0.3, -3 * np.cos(ang)])
        E = look_at_extrinsic(eye)
        depth = sphere_depth(K, E, 64, 64)
        color = jnp.asarray(
            rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        depth = jnp.asarray(depth)
        E = jnp.asarray(E)

        vol_single = integrate_view(vol_single, color, depth, K, E,
                                    depth_trunc=5.0, cfg=cfg)
        # sharded: same host-driven allocation, sharded integrate
        vol_shard = allocate(vol_shard, depth, K, E, 5.0, cfg)
        vol_shard = step(vol_shard, color, depth, K, E, jnp.float32(5.0))

    assert int(vol_shard.n_blocks) == int(vol_single.n_blocks)
    np.testing.assert_array_equal(np.asarray(vol_shard.keys),
                                  np.asarray(vol_single.keys))
    np.testing.assert_allclose(np.asarray(vol_shard.tsdf),
                               np.asarray(vol_single.tsdf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vol_shard.weight),
                               np.asarray(vol_single.weight), atol=1e-5)
