import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.stereo import DLNRConfig, InputPadder, dlnr_forward, init_dlnr_params
from gs2mesh_tpu.stereo.corr import build_corr_pyramid, lookup_corr
from gs2mesh_tpu.stereo.dlnr import upsample_flow


def test_corr_pyramid_and_lookup_match_naive():
    from gs2mesh_tpu.stereo.layers import matmul_dtype

    rng = np.random.default_rng(0)
    B, H, W, D = 1, 4, 16, 8
    f1 = jnp.asarray(rng.normal(size=(B, H, W, D)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, H, W, D)).astype(np.float32))
    with matmul_dtype(None):      # exact-math check of the volume structure
        pyr = build_corr_pyramid(f1, f2, num_levels=2)

    naive = np.einsum("bhwd,bhvd->bhwv", np.asarray(f1), np.asarray(f2))
    naive /= np.sqrt(D)
    np.testing.assert_allclose(np.asarray(pyr[0]), naive, atol=1e-5)

    # Integer coords at level 0 should reproduce direct indexing.
    x = jnp.full((B, H, W), 5.0)
    out = lookup_corr(pyr, x, radius=1)
    got = np.asarray(out)[..., :3]          # level-0 window (dx=-1,0,1)
    want = np.stack([naive[..., 4], naive[..., 5], naive[..., 6]], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_flow_uniform_mask_averages():
    rng = np.random.default_rng(1)
    flow = jnp.asarray(rng.normal(size=(1, 4, 6, 2)).astype(np.float32))
    mask = jnp.zeros((1, 4, 6, 9 * 16), jnp.float32)  # uniform softmax
    up = np.asarray(upsample_flow(flow, mask, factor=4))
    assert up.shape == (1, 16, 24, 2)
    # Uniform convex weights -> each output pixel is the mean of the 3x3
    # (zero-padded) neighborhood of 4*flow; check an interior block.
    f = 4 * np.asarray(flow)
    want = f[:, 0:3, 0:3, :].mean(axis=(1, 2))
    np.testing.assert_allclose(up[:, 4, 4, :], want, atol=1e-5)


def test_input_padder_roundtrip():
    x = np.random.default_rng(2).normal(size=(1, 3, 50, 70)).astype(np.float32)
    p = InputPadder(x.shape, divis_by=32)
    (xp,) = p.pad(x)
    assert xp.shape[2] % 32 == 0 and xp.shape[3] % 32 == 0
    np.testing.assert_array_equal(p.unpad(xp), x)


def test_dlnr_forward_shapes_and_warm_start():
    params = init_dlnr_params(seed=0)
    rng = np.random.default_rng(3)
    H, W = 64, 96
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    cfg = DLNRConfig(iters=2)

    flow_low, disp = jax.jit(
        lambda p, a, b: dlnr_forward(p, a, b, cfg))(params, img1, img2)
    assert flow_low.shape == (1, 2, H // 4, W // 4)
    assert disp.shape == (1, 1, H, W)
    assert bool(jnp.isfinite(disp).all())
    # Vertical flow is pinned to zero (dlnr.py:107 of the reference).
    assert float(jnp.abs(flow_low[:, 1]).max()) == 0.0

    # Warm start shifts the result deterministically.
    flow_low2, disp2 = jax.jit(
        lambda p, a, b, fi: dlnr_forward(p, a, b, cfg, flow_init=fi))(
        params, img1, img2, flow_low)
    assert bool(jnp.isfinite(disp2).all())
    assert not np.allclose(np.asarray(disp), np.asarray(disp2))


def test_dlnr_bf16_matmul_policy_close_to_f32():
    """bf16 conv/einsum operands are an OPTIONAL speed mode (the TPU analog
    of the reference's autocast mixed precision, stereo_utils.py:55); the
    shipped default is full f32 (layers.MATMUL_DTYPE = None). This validates
    that enabling the mode keeps disparity close to the f32 path."""
    from gs2mesh_tpu.stereo.layers import matmul_dtype

    params = init_dlnr_params(seed=0)
    rng = np.random.default_rng(4)
    H, W = 64, 96
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    cfg = DLNRConfig(iters=2)

    with matmul_dtype(None):
        _, disp_f32 = jax.jit(
            lambda p, a, b: dlnr_forward(p, a, b, cfg))(params, img1, img2)
    with matmul_dtype(jnp.bfloat16):
        _, disp_bf16 = jax.jit(
            lambda p, a, b: dlnr_forward(p, a, b, cfg))(params, img1, img2)

    a, b = np.asarray(disp_f32), np.asarray(disp_bf16)
    assert np.isfinite(b).all()
    # Random-weight disparities live in sub-pixel range here; the recurrent
    # bf16 accumulation noise must stay well under a pixel.
    scale = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - b).max() / scale < 0.15, (
        np.abs(a - b).max(), scale)
