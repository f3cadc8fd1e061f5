"""Capture golden output fixtures for the neural-net ports (CPU, f32).

The SAM2 / GroundingDINO / DLNR ports were numerically validated against
the torch reference by tools/parity_*.py (which need torch + the reference
tree). The in-suite tests are shape/behavior only, so a refactor could
silently change the math between parity runs. This script freezes small
full-output arrays of the CURRENT (validated) implementations on fixed
random weights/inputs into tests/fixtures/golden_nets.npz;
tests/test_golden_fixtures.py replays them.

Regenerate ONLY after re-validating parity:
    python tools/make_golden_fixtures.py
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def capture():
    out = {}

    # --- DLNR (2 iters, tiny frame, random weights, full-f32 policy)
    from gs2mesh_tpu.stereo import DLNRConfig, dlnr_forward, init_dlnr_params
    from gs2mesh_tpu.stereo.layers import matmul_dtype
    params = init_dlnr_params(seed=0)
    rng = np.random.default_rng(3)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)).astype(np.float32))
    with matmul_dtype(None):
        flow_low, disp = jax.jit(lambda p, a, b: dlnr_forward(
            p, a, b, DLNRConfig(iters=2)))(params, img1, img2)
    out["dlnr_flow_low"] = np.asarray(flow_low)
    out["dlnr_disp_sub"] = np.asarray(disp)[:, :, ::8, ::8]

    # --- GroundingDINO (small config, random weights)
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
    img = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    token_ids = np.array([[101, 5, 6, 1012, 7, 102]])
    ids, pos_ids, self_masks, pad_mask = prepare_text_inputs(token_ids, cfg)
    o = jax.jit(lambda p, i: gdino_forward(
        p, cfg, i, ids, pos_ids, self_masks, pad_mask))(gparams, img)
    out["gdino_logits_sub"] = np.asarray(o["pred_logits"])[:, :, :8]
    out["gdino_boxes"] = np.asarray(o["pred_boxes"])

    # --- SAM2 (tiny config): encoder features + predictor IoU head + the
    # full mask path. Random weights alone leave the object-score head near
    # zero and the gate closed (mask logits pinned to NO_OBJ_SCORE, no
    # decoder signal); biasing the head's last layer opens the gate so the
    # fixture pins REAL two-way-decoder and memory-attention outputs.
    from gs2mesh_tpu.sam2 import (SAM2Config, SAM2ImagePredictor,
                                  SAM2VideoPredictor, init_sam2_params)
    from gs2mesh_tpu.sam2.model import forward_image
    scfg = SAM2Config.tiny(image_size=128)
    sparams = init_sam2_params(scfg, seed=0)
    sparams["sam_mask_decoder"]["pred_obj_score_head"]["layers"]["2"]["b"] \
        = jnp.full((1,), 5.0, jnp.float32)          # object gate OPEN
    img128 = jnp.asarray(
        rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    feats = jax.jit(lambda p, i: forward_image(p, scfg, i))(sparams, img128)
    leaves = jax.tree.leaves(feats)
    out["sam2_feat0_sub"] = np.asarray(leaves[0]).reshape(-1)[::97][:256]
    out["sam2_feat_last_sub"] = np.asarray(leaves[-1]).reshape(-1)[::97][:256]

    pred = SAM2ImagePredictor(sparams, scfg)
    image = rng.uniform(0, 255, (96, 120, 3)).astype(np.uint8)
    pred.set_image(image)
    masks, ious, low = pred.predict(point_coords=np.array([[60.0, 48.0]]),
                                    point_labels=np.array([1]))
    out["sam2_ious"] = np.asarray(ious)
    out["sam2_low_masks_sub"] = np.asarray(low).reshape(-1)[::31][:512]

    # Video propagation: frame 1's logits flow through memory encoding of
    # frame 0 + memory attention + the two-way decoder.
    vid = SAM2VideoPredictor(sparams, scfg)
    vf = [np.asarray(rng.uniform(0, 255, (96, 120, 3)), np.uint8)
          for _ in range(2)]
    state = vid.init_state(frames=vf)
    vid.add_new_points_or_box(state, frame_idx=0, box=[30, 20, 70, 60])
    prop = {f: logits for f, _, logits in vid.propagate_in_video(state)}
    out["sam2_video_f1_sub"] = np.asarray(prop[1]).reshape(-1)[::23][:512]

    return out


def main():
    os.makedirs(FIX, exist_ok=True)
    arrs = capture()
    path = os.path.join(FIX, "golden_nets.npz")
    np.savez_compressed(path, **arrs)
    for k, v in arrs.items():
        print(f"{k}: {v.shape} {v.dtype} mean={np.asarray(v).mean():+.5f}")
    print("wrote", path)


if __name__ == "__main__":
    main()
