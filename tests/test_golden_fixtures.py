"""Golden-output regression tests for the neural-net ports.

The parity scripts (tools/parity_{dlnr,sam2,gdino}.py) validate these ports
against the torch reference but need torch + the reference tree, so the CI
suite can't run them. These tests replay frozen full-output fixtures
captured from the parity-validated implementations
(tools/make_golden_fixtures.py) — a refactor that changes the math fails
here even though the shape/behavior tests would still pass.

Tolerances are loose enough for XLA-version scheduling noise (1e-4 rel) but
far below any real math change.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_nets.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIX)


def _close(got, want, rtol=1e-4, atol=1e-4):
    got, want = np.asarray(got), np.asarray(want)
    finite = np.isfinite(want)
    # Non-finite positions (masked logits) must match exactly.
    assert np.array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], want[finite],
                               rtol=rtol, atol=atol)


@pytest.mark.slow
def test_dlnr_golden(golden):
    from gs2mesh_tpu.stereo import DLNRConfig, dlnr_forward, init_dlnr_params
    from gs2mesh_tpu.stereo.layers import matmul_dtype

    params = init_dlnr_params(seed=0)
    rng = np.random.default_rng(3)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)).astype(np.float32))
    with matmul_dtype(None):
        flow_low, disp = jax.jit(lambda p, a, b: dlnr_forward(
            p, a, b, DLNRConfig(iters=2)))(params, img1, img2)
    # The recurrent net amplifies XLA fusion-order noise (the test runs
    # under the 8-device conftest mesh, the capture ran single-device):
    # ~6e-4 observed; real math changes move these by orders more.
    _close(flow_low, golden["dlnr_flow_low"], rtol=3e-3, atol=3e-3)
    _close(np.asarray(disp)[:, :, ::8, ::8], golden["dlnr_disp_sub"],
           rtol=3e-3, atol=3e-3)


def test_gdino_golden(golden):
    from gs2mesh_tpu.gdino.bert import BertConfig
    from gs2mesh_tpu.gdino.model import (GDINOConfig, gdino_forward,
                                         init_gdino_params,
                                         prepare_text_inputs)
    from gs2mesh_tpu.gdino.swin import SwinConfig

    cfg = GDINOConfig(
        swin=SwinConfig(embed_dim=32, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        bert=BertConfig(hidden_size=64, num_layers=2, num_heads=2,
                        intermediate_size=128),
        num_queries=20, num_encoder_layers=2, num_decoder_layers=2)
    gparams = init_gdino_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    rng.uniform(0, 255, (1, 3, 64, 96))          # keep rng stream aligned
    rng.uniform(0, 255, (1, 3, 64, 96))          # with the capture script
    img = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    token_ids = np.array([[101, 5, 6, 1012, 7, 102]])
    ids, pos_ids, self_masks, pad_mask = prepare_text_inputs(token_ids, cfg)
    o = jax.jit(lambda p, i: gdino_forward(
        p, cfg, i, ids, pos_ids, self_masks, pad_mask))(gparams, img)
    _close(np.asarray(o["pred_logits"])[:, :, :8],
           golden["gdino_logits_sub"])
    _close(o["pred_boxes"], golden["gdino_boxes"])


@pytest.mark.slow
def test_sam2_golden(golden):
    from gs2mesh_tpu.sam2 import (SAM2Config, SAM2ImagePredictor,
                                  SAM2VideoPredictor, init_sam2_params)
    from gs2mesh_tpu.sam2.model import NO_OBJ_SCORE, forward_image

    scfg = SAM2Config.tiny(image_size=128)
    sparams = init_sam2_params(scfg, seed=0)
    # Open the object gate (mirrors the fixture generator) so the pinned
    # outputs exercise the two-way decoder + memory attention rather than
    # the NO_OBJ_SCORE fill.
    sparams["sam_mask_decoder"]["pred_obj_score_head"]["layers"]["2"]["b"] \
        = jnp.full((1,), 5.0, jnp.float32)
    rng = np.random.default_rng(3)
    rng.uniform(0, 255, (1, 3, 64, 96))
    rng.uniform(0, 255, (1, 3, 64, 96))
    rng.normal(size=(1, 64, 96, 3))
    img128 = jnp.asarray(
        rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    feats = jax.jit(lambda p, i: forward_image(p, scfg, i))(sparams, img128)
    leaves = jax.tree.leaves(feats)
    _close(np.asarray(leaves[0]).reshape(-1)[::97][:256],
           golden["sam2_feat0_sub"])
    _close(np.asarray(leaves[-1]).reshape(-1)[::97][:256],
           golden["sam2_feat_last_sub"])

    pred = SAM2ImagePredictor(sparams, scfg)
    image = rng.uniform(0, 255, (96, 120, 3)).astype(np.uint8)
    pred.set_image(image)
    _, ious, low = pred.predict(point_coords=np.array([[60.0, 48.0]]),
                                point_labels=np.array([1]))
    _close(ious, golden["sam2_ious"], rtol=1e-3, atol=1e-3)
    low_sub = np.asarray(low).reshape(-1)[::31][:512]
    # Mask-decoder signal: logits must be REAL decoder output, not the
    # object-gate fill, and must match the pinned fixture.
    assert np.all(low_sub > NO_OBJ_SCORE / 2)
    assert np.std(low_sub) > 1e-3
    _close(low_sub, golden["sam2_low_masks_sub"], rtol=1e-3, atol=1e-3)

    vid = SAM2VideoPredictor(sparams, scfg)
    vf = [np.asarray(rng.uniform(0, 255, (96, 120, 3)), np.uint8)
          for _ in range(2)]
    state = vid.init_state(frames=vf)
    vid.add_new_points_or_box(state, frame_idx=0, box=[30, 20, 70, 60])
    prop = {f: logits for f, _, logits in vid.propagate_in_video(state)}
    f1_sub = np.asarray(prop[1]).reshape(-1)[::23][:512]
    assert np.std(f1_sub) > 1e-3
    _close(f1_sub, golden["sam2_video_f1_sub"], rtol=1e-3, atol=1e-3)
