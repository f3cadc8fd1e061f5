"""Parity: JAX SAM2 vs reference torch SAM2 (random weights, CPU, tiny)."""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import sys
import types

import numpy as np

# Stub hydra so the reference sam2 package imports without it.
hydra = types.ModuleType("hydra")
hydra.initialize_config_module = lambda *a, **k: None
core = types.ModuleType("hydra.core")
gh = types.ModuleType("hydra.core.global_hydra")


class _GH:
    def is_initialized(self):
        return True


gh.GlobalHydra = _GH
core.global_hydra = gh
hydra.core = core
sys.modules.setdefault("hydra", hydra)
sys.modules.setdefault("hydra.core", core)
sys.modules.setdefault("hydra.core.global_hydra", gh)

sys.path.insert(0, "/root/reference/third_party/segment-anything-2")

import torch

from sam2.modeling.backbones.hieradet import Hiera
from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
from sam2.modeling.memory_attention import (MemoryAttention,
                                            MemoryAttentionLayer)
from sam2.modeling.memory_encoder import (CXBlock, Fuser, MaskDownSampler,
                                          MemoryEncoder)
from sam2.modeling.position_encoding import PositionEmbeddingSine
from sam2.modeling.sam.transformer import RoPEAttention
from sam2.modeling.sam2_base import SAM2Base

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gs2mesh_tpu.sam2 import SAM2Config
from gs2mesh_tpu.sam2.convert import convert_sam2_state_dict
from gs2mesh_tpu.sam2.model import (condition_features, encode_new_memory,
                                    forward_image, forward_sam_heads)
from gs2mesh_tpu.sam2.predictor import preprocess_image

IMG = 256


def build_torch_tiny():
    trunk = Hiera(embed_dim=96, num_heads=1, stages=[1, 2, 7, 2],
                  global_att_blocks=[5, 7, 9],
                  window_pos_embed_bkg_spatial_size=[7, 7])
    neck = FpnNeck(position_encoding=PositionEmbeddingSine(
        num_pos_feats=256, normalize=True, scale=None, temperature=10000),
        d_model=256, backbone_channel_list=[768, 384, 192, 96],
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=1)

    def make_layer():
        return MemoryAttentionLayer(
            activation="relu", dim_feedforward=2048, dropout=0.1,
            pos_enc_at_attn=False,
            self_attention=RoPEAttention(rope_theta=10000.0,
                                         feat_sizes=[32, 32],
                                         embedding_dim=256, num_heads=1,
                                         downsample_rate=1, dropout=0.1),
            d_model=256, pos_enc_at_cross_attn_keys=True,
            pos_enc_at_cross_attn_queries=False,
            cross_attention=RoPEAttention(rope_theta=10000.0,
                                          feat_sizes=[32, 32],
                                          rope_k_repeat=True,
                                          embedding_dim=256, num_heads=1,
                                          downsample_rate=1, dropout=0.1,
                                          kv_in_dim=64))

    mem_attn = MemoryAttention(d_model=256, pos_enc_at_input=True,
                               layer=make_layer(), num_layers=4)
    mem_enc = MemoryEncoder(
        out_dim=64,
        position_encoding=PositionEmbeddingSine(num_pos_feats=64,
                                                normalize=True, scale=None,
                                                temperature=10000),
        mask_downsampler=MaskDownSampler(kernel_size=3, stride=2, padding=1),
        fuser=Fuser(CXBlock(dim=256, kernel_size=7, padding=3,
                            layer_scale_init_value=1e-6, use_dwconv=True),
                    num_layers=2))
    model = SAM2Base(
        image_encoder=encoder, memory_attention=mem_attn,
        memory_encoder=mem_enc, num_maskmem=7, image_size=IMG,
        sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, use_high_res_features_in_sam=True,
        multimask_output_in_sam=True, iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True, add_tpos_enc_to_obj_ptrs=False,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True, multimask_min_pt_num=0,
        multimask_max_pt_num=1, use_mlp_for_obj_ptr_proj=True)
    model.eval()
    # randomize the zero-initialized positional params so parity is nontrivial
    with torch.no_grad():
        for p in (model.image_encoder.trunk.pos_embed,
                  model.image_encoder.trunk.pos_embed_window,
                  model.no_mem_embed, model.no_mem_pos_enc,
                  model.maskmem_tpos_enc, model.no_obj_ptr):
            p.normal_(0, 0.02)
        # force a positive object score so the mask path is exercised
        model.sam_mask_decoder.pred_obj_score_head.layers[-1].bias.fill_(5.0)
    return model


def cmp(name, t, j, tol=2e-4):
    t = np.asarray(t.detach() if hasattr(t, "detach") else t)
    j = np.asarray(j)
    if j.shape != t.shape and j.ndim == 4:   # NHWC -> NCHW
        j = j.transpose(0, 3, 1, 2)
    err = np.abs(t - j).max()
    scale = np.abs(t).max() + 1e-9
    print(f"{name:26s} maxabs {err:.3e}  rel {err / scale:.3e}")
    return err / scale


def main():
    torch.manual_seed(0)
    model = build_torch_tiny()
    params = convert_sam2_state_dict(model.state_dict())
    cfg = SAM2Config.tiny(image_size=IMG)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (IMG, IMG, 3)).astype(np.uint8)
    x = preprocess_image(img, IMG)                      # (1, S, S, 3)
    xt = torch.from_numpy(np.ascontiguousarray(
        x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        t_back = model.forward_image(xt)
        (_, t_feats, t_pos, t_sizes) = model._prepare_backbone_features(
            t_back)

    j_back = jax.jit(lambda p, a: forward_image(p, cfg, a))(
        params, jnp.asarray(x))
    worst = 0.0
    for lvl in range(3):
        worst = max(worst, cmp(f"backbone_fpn[{lvl}]",
                               t_back["backbone_fpn"][lvl],
                               j_back["backbone_fpn"][lvl]))

    # --- frame 0: point-prompted SAM heads on no-mem features
    B = 1
    H16 = IMG // 16
    t_feat16 = t_feats[-1] + model.no_mem_embed
    t_feat16 = t_feat16.permute(1, 2, 0).view(B, 256, H16, H16)
    t_high = [
        f.permute(1, 2, 0).view(B, -1, *s)
        for f, s in zip(t_feats[:2], t_sizes[:2])
    ]
    pts = torch.tensor([[[60.0, 80.0]]])
    labs = torch.tensor([[1]], dtype=torch.int32)
    with torch.no_grad():
        t_out = model._forward_sam_heads(
            t_feat16, point_inputs={"point_coords": pts,
                                    "point_labels": labs},
            high_res_features=t_high, multimask_output=True)

    j_feat16 = j_back["backbone_fpn"][2] + params["no_mem_embed"][0, 0]
    j_high = [j_back["backbone_fpn"][0], j_back["backbone_fpn"][1]]
    j_out = forward_sam_heads(
        params, cfg, j_feat16,
        point_coords=jnp.asarray(pts.numpy()),
        point_labels=jnp.asarray(labs.numpy()),
        high_res_features=j_high, multimask_output=True)
    for name, i in (("low_multi", 0), ("high_multi", 1), ("ious", 2),
                    ("low_best", 3), ("obj_ptr", 5), ("obj_logits", 6)):
        tt = t_out[i]
        jj = j_out[i]
        if hasattr(tt, "ndim") and tt.ndim == 4 and np.asarray(jj).ndim == 4:
            worst = max(worst, cmp(name, tt, jj, ))
        else:
            worst = max(worst, cmp(name, tt, jj))

    # --- memory encoding + frame-1 conditioning
    with torch.no_grad():
        t_mem, t_mem_pos = model._encode_new_memory(
            t_feats[-1:], t_sizes[-1:], t_out[4], False)
        mem = t_mem.flatten(2).permute(2, 0, 1)
        mem_pos = t_mem_pos[-1].flatten(2).permute(2, 0, 1) \
            + model.maskmem_tpos_enc[model.num_maskmem - 1]
        obj_ptrs = t_out[5].unsqueeze(0)          # (1, B, C)
        obj_tok = obj_ptrs.reshape(-1, B, 4, 64).permute(0, 2, 1, 3) \
            .flatten(0, 1)
        mem_full = torch.cat([mem, obj_tok], dim=0)
        pos_full = torch.cat(
            [mem_pos, torch.zeros(4, B, 64)], dim=0)
        t_cond = model.memory_attention(
            curr=t_feats[-1:], curr_pos=t_pos[-1:], memory=mem_full,
            memory_pos=pos_full, num_obj_ptr_tokens=4)
        t_cond = t_cond.permute(1, 2, 0).view(B, 256, H16, H16)

    j_mem, j_mem_pos = encode_new_memory(params, cfg, j_back["backbone_fpn"][2],
                                         j_out[4])
    worst = max(worst, cmp("maskmem_features", t_mem, j_mem))
    memories = j_mem[:, None]
    memory_pos = (j_mem_pos[None] +
                  params["maskmem_tpos_enc"][cfg.num_maskmem - 1])[None]
    j_cond = condition_features(
        params, cfg, j_back["backbone_fpn"][2],
        j_back["vision_pos_enc"][2], memories, memory_pos,
        j_out[5][:, None], None)
    worst = max(worst, cmp("conditioned_feat", t_cond, j_cond))

    print("WORST rel:", worst)
    print("OK" if worst < 5e-3 else "MISMATCH")


if __name__ == "__main__":
    main()
