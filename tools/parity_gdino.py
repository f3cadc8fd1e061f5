"""Parity: JAX GroundingDINO vs reference torch (random weights, CPU).

Builds the torch model from its classes with a random-init BERT (no hub
access), mirrors the reference forward explicitly, and compares against
gdino_forward stage by stage.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import sys
import types

import numpy as np

import torch
sys.path.insert(0, "/root/reference/third_party/GroundingDINO")
from transformers import BertConfig as HFBertConfig, BertModel

# Stub torchvision AFTER transformers import (only nms is used; unused in
# inference).
tv = types.ModuleType("torchvision")
ops = types.ModuleType("torchvision.ops")
boxes_mod = types.ModuleType("torchvision.ops.boxes")
boxes_mod.nms = lambda *a, **k: None
boxes_mod.box_area = lambda *a, **k: None
ops.boxes = boxes_mod
tv.ops = ops
tv.__version__ = "0.20.0"
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.ops", ops)
sys.modules.setdefault("torchvision.ops.boxes", boxes_mod)

# Stub addict + yapf (SLConfig deps, unused here).
addict = types.ModuleType("addict")
addict.Dict = dict
sys.modules.setdefault("addict", addict)
yapf = types.ModuleType("yapf")
yapf.yapflib = types.ModuleType("yapf.yapflib")
yapf.yapflib.yapf_api = types.ModuleType("yapf.yapflib.yapf_api")
yapf.yapflib.yapf_api.FormatCode = lambda *a, **k: ("", True)
sys.modules.setdefault("yapf", yapf)
sys.modules.setdefault("yapf.yapflib", yapf.yapflib)
sys.modules.setdefault("yapf.yapflib.yapf_api", yapf.yapflib.yapf_api)
# supervision stub (annotate-only dependency)
sv = types.ModuleType("supervision")
sys.modules.setdefault("supervision", sv)
# pycocotools stub (visualizer dep)
pct = types.ModuleType("pycocotools")
pct.mask = types.ModuleType("pycocotools.mask")
sys.modules.setdefault("pycocotools", pct)
sys.modules.setdefault("pycocotools.mask", pct.mask)
tvm = types.ModuleType("torchvision.models")
tvmu = types.ModuleType("torchvision.models._utils")
tvmu.IntermediateLayerGetter = object
tvm._utils = tvmu
tv.models = tvm
sys.modules.setdefault("torchvision.models", tvm)
sys.modules.setdefault("torchvision.models._utils", tvmu)

# Minimal timm.models.layers (DropPath inert at eval, helpers trivial)
timm = types.ModuleType("timm")
timm_models = types.ModuleType("timm.models")
timm_layers = types.ModuleType("timm.models.layers")


class _DropPath(torch.nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()

    def forward(self, x):
        return x


def _to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def _trunc_normal_(t, std=1.0, **k):
    with torch.no_grad():
        t.normal_(0, std).clamp_(-2 * std, 2 * std)
    return t


timm_layers.DropPath = _DropPath
timm_layers.to_2tuple = _to_2tuple
timm_layers.trunc_normal_ = _trunc_normal_
timm_models.layers = timm_layers
timm.models = timm_models
sys.modules.setdefault("timm", timm)
sys.modules.setdefault("timm.models", timm_models)
sys.modules.setdefault("timm.models.layers", timm_layers)

# --- torch model construction (bypassing hub + hydra-free) ---------------
from groundingdino.models.GroundingDINO.backbone.swin_transformer import build_swin_transformer
from groundingdino.models.GroundingDINO.backbone.backbone import Joiner
from groundingdino.models.GroundingDINO.backbone.position_encoding import PositionEmbeddingSineHW
from groundingdino.models.GroundingDINO.transformer import Transformer
from groundingdino.models.GroundingDINO.bertwarper import (
    BertModelWarper, generate_masks_with_special_tokens_and_transfer_map)
from groundingdino.models.GroundingDINO.utils import (ContrastiveEmbed, MLP,
                                                      gen_encoder_output_proposals)
from groundingdino.util.misc import NestedTensor, inverse_sigmoid

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gs2mesh_tpu.gdino import GDINOConfig, gdino_forward
from gs2mesh_tpu.gdino.convert import convert_gdino_state_dict
from gs2mesh_tpu.gdino.model import prepare_text_inputs

NQ = 50
H, W = 224, 256
NT = 8  # tokens


class TorchGDINO(torch.nn.Module):
    """Minimal reference assembly mirroring build_groundingdino +
    GroundingDINO.forward internals (groundingdino.py:52-365)."""

    def __init__(self):
        super().__init__()
        swin = build_swin_transformer("swin_T_224_1k", pretrain_img_size=224,
                                      out_indices=(1, 2, 3), dilation=False)
        pos = PositionEmbeddingSineHW(128, temperatureH=20, temperatureW=20,
                                      normalize=True)
        backbone = Joiner(swin, pos)
        backbone.num_channels = swin.num_features[1:]
        self.backbone = backbone
        self.transformer = Transformer(
            d_model=256, nhead=8, num_queries=NQ, num_encoder_layers=6,
            num_decoder_layers=6, dim_feedforward=2048, dropout=0.0,
            activation="relu", return_intermediate_dec=True, query_dim=4,
            num_feature_levels=4, enc_n_points=4, dec_n_points=4,
            learnable_tgt_init=True, two_stage_type="standard",
            embed_init_tgt=True, use_text_enhancer=True,
            use_fusion_layer=True, use_checkpoint=False,
            use_transformer_ckpt=False, use_text_cross_attention=True,
            text_dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0)
        bert = BertModel(HFBertConfig())
        self.bert = BertModelWarper(bert_model=bert)
        self.feat_map = torch.nn.Linear(768, 256)
        self.input_proj = torch.nn.ModuleList()
        chans = list(backbone.num_channels)
        for c in chans:
            self.input_proj.append(torch.nn.Sequential(
                torch.nn.Conv2d(c, 256, 1), torch.nn.GroupNorm(32, 256)))
        self.input_proj.append(torch.nn.Sequential(
            torch.nn.Conv2d(chans[-1], 256, 3, stride=2, padding=1),
            torch.nn.GroupNorm(32, 256)))
        _bbox = MLP(256, 256, 4, 3)
        self.bbox_embed = torch.nn.ModuleList([_bbox] * 6)
        self.class_embed = torch.nn.ModuleList([ContrastiveEmbed()] * 6)
        self.transformer.decoder.bbox_embed = self.bbox_embed
        self.transformer.decoder.class_embed = self.class_embed
        self.transformer.enc_out_bbox_embed = MLP(256, 256, 4, 3)
        self.transformer.enc_out_class_embed = ContrastiveEmbed()

    @torch.no_grad()
    def run(self, img, input_ids):
        tokenized = {"input_ids": input_ids,
                     "attention_mask": torch.ones_like(input_ids),
                     "token_type_ids": torch.zeros_like(input_ids)}

        class Tok:
            pass

        masks, position_ids, _ = \
            generate_masks_with_special_tokens_and_transfer_map(
                tokenized, [101, 102, 1012, 1029], Tok())
        bert_out = self.bert(input_ids=input_ids, attention_mask=masks,
                             position_ids=position_ids,
                             token_type_ids=tokenized["token_type_ids"])
        encoded_text = self.feat_map(bert_out["last_hidden_state"])
        text_token_mask = tokenized["attention_mask"].bool()
        text_dict = {"encoded_text": encoded_text,
                     "text_token_mask": text_token_mask,
                     "position_ids": position_ids,
                     "text_self_attention_masks": masks}

        samples = NestedTensor(img, torch.zeros(
            (1, img.shape[2], img.shape[3]), dtype=torch.bool))
        features, poss = self.backbone(samples)
        srcs, ms = [], []
        for l, feat in enumerate(features):
            src, mask = feat.decompose()
            srcs.append(self.input_proj[l](src))
            ms.append(mask)
        src = self.input_proj[3](features[-1].tensors)
        m = samples.mask
        mask = torch.nn.functional.interpolate(
            m[None].float(), size=src.shape[-2:]).to(torch.bool)[0]
        pos_l = self.backbone[1](NestedTensor(src, mask)).to(src.dtype)
        srcs.append(src)
        ms.append(mask)
        poss.append(pos_l)

        hs, reference, hs_enc, ref_enc, _ = self.transformer(
            srcs, ms, None, poss, None, None, text_dict)
        delta = self.bbox_embed[-1](hs[-1])
        boxes = (delta + inverse_sigmoid(reference[-2])).sigmoid()
        logits = self.class_embed[-1](hs[-1], text_dict)
        return logits, boxes, encoded_text


def main():
    torch.manual_seed(0)
    model = TorchGDINO().eval()
    params = convert_gdino_state_dict(model.state_dict())
    cfg = GDINOConfig(num_queries=NQ)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, H, W)).astype(np.float32)
    # caption-like ids: [CLS] w w w . w w [SEP]
    ids = np.array([[101, 2000, 2001, 2002, 1012, 2003, 2004, 102]],
                   np.int64)
    assert ids.shape[1] == NT

    t_logits, t_boxes, t_text = model.run(torch.from_numpy(img),
                                          torch.from_numpy(ids))

    jids, jpos, jself, jpad = prepare_text_inputs(ids, cfg)
    out = gdino_forward(params, cfg,
                        jnp.asarray(img.transpose(0, 2, 3, 1)),
                        jids, jpos, jself, jpad)

    def cmp(name, t, j):
        t = np.asarray(t)
        j = np.asarray(j)
        # -inf padding columns compare equal
        finite = np.isfinite(t)
        err = np.abs(t[finite] - j[finite]).max()
        scale = np.abs(t[finite]).max() + 1e-9
        assert (np.isinf(t) == np.isinf(np.asarray(j))).all()
        print(f"{name:14s} maxabs {err:.3e}  rel {err / scale:.3e}")
        return err / scale

    worst = cmp("pred_boxes", t_boxes, out["pred_boxes"])
    worst = max(worst, cmp("pred_logits", t_logits, out["pred_logits"]))
    print("WORST rel:", worst)
    print("OK" if worst < 1e-2 else "MISMATCH")


if __name__ == "__main__":
    main()
