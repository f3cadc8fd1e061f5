"""SAM2 JAX port: shape/finiteness/behavior tests (tiny config, small
images). Numerical parity vs the torch reference is validated separately by
_parity_sam2.py (worst rel 2.2e-4 across the full stack)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

pytestmark = pytest.mark.slow  # 17s module setup + heavy calls; default SAM2 coverage lives in test_golden_fixtures

from gs2mesh_tpu.sam2 import SAM2Config, SAM2ImagePredictor, SAM2VideoPredictor, init_sam2_params

IMG = 128


@pytest.fixture(scope="module")
def tiny():
    cfg = SAM2Config.tiny(image_size=IMG)
    params = init_sam2_params(cfg, seed=0)
    return params, cfg


def _frames(n=3, h=96, w=120, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[20 + i:60 + i, 30 + i:70 + i] = [200, 40, 40]   # moving square
        out.append(f)
    return out


def test_image_predictor_point_and_box(tiny):
    params, cfg = tiny
    pred = SAM2ImagePredictor(params, cfg)
    img = _frames(1)[0]
    pred.set_image(img)
    masks, ious, low = pred.predict(point_coords=[[50, 40]],
                                    point_labels=[1])
    assert masks.shape == (3, img.shape[0], img.shape[1])
    assert ious.shape == (3,)
    assert np.isfinite(ious).all()

    masks_b, ious_b, _ = pred.predict(box=[30, 20, 70, 60],
                                      multimask_output=False)
    assert masks_b.shape == (1, img.shape[0], img.shape[1])


def test_video_propagation(tiny):
    params, cfg = tiny
    pred = SAM2VideoPredictor(params, cfg)
    frames = _frames(3)
    state = pred.init_state(frames=frames)
    fidx, ids, logits = pred.add_new_points_or_box(
        state, frame_idx=0, box=[30, 20, 70, 60])
    assert fidx == 0 and logits.shape == (1, 1, 96, 120)

    seen = []
    for frame_idx, obj_ids, mask_logits in pred.propagate_in_video(state):
        assert mask_logits.shape == (1, 1, 96, 120)
        assert np.isfinite(mask_logits).all()
        seen.append(frame_idx)
    assert seen == [0, 1, 2]
    # memory bank populated for the tracked frames
    assert sorted(state["non_cond_outputs"]) == [1, 2]


def test_video_mask_prompt(tiny):
    params, cfg = tiny
    pred = SAM2VideoPredictor(params, cfg)
    frames = _frames(2)
    state = pred.init_state(frames=frames)
    mask = np.zeros((96, 120), bool)
    mask[20:60, 30:70] = True
    pred.add_new_mask(state, 0, 0, mask)
    outs = list(pred.propagate_in_video(state))
    assert len(outs) == 2
    # conditioning frame's output mask reproduces the prompt
    cond_low = np.asarray(state["cond_outputs"][0]["pred_masks"])
    assert np.isfinite(cond_low).all()
