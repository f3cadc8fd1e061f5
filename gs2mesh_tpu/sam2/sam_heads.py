"""SAM prompt encoder, two-way transformer, and mask decoder.

Port of sam2/modeling/sam/{prompt_encoder.py,transformer.py,mask_decoder.py}
(inference path, pred_obj_scores variant of SAM2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2mesh_tpu.sam2.layers import (attention, conv2d, conv_transpose2d_s2,
                                     layer_norm, layer_norm_2d, mlp,
                                     random_pe_coords, random_pe_grid)

f32 = jnp.float32


# ------------------------------------------------------------ prompt encoder

def embed_points(p, points, labels, input_image_size, pad: bool):
    """_embed_points (prompt_encoder.py:80-104). points: (B, N, 2) pixel
    coords; labels: (B, N) in {-1, 0, 1, 2, 3}."""
    points = points + 0.5
    if pad:
        b = points.shape[0]
        points = jnp.concatenate([points, jnp.zeros((b, 1, 2), f32)], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
    coords = points / jnp.asarray(
        [input_image_size[1], input_image_size[0]], f32)
    pe = random_pe_coords(p["pe_layer"]["positional_encoding_gaussian_matrix"],
                          coords)
    lab = labels[..., None]
    out = jnp.where(lab == -1, p["not_a_point_embed"]["weight"][0], pe)
    for i in range(4):
        out = out + jnp.where(lab == i,
                              p["point_embeddings"][str(i)]["weight"][0], 0.0)
    return out


def embed_boxes(p, boxes, input_image_size):
    """_embed_boxes (prompt_encoder.py:106-114). boxes: (B, 4) xyxy."""
    coords = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray(
        [input_image_size[1], input_image_size[0]], f32)
    pe = random_pe_coords(p["pe_layer"]["positional_encoding_gaussian_matrix"],
                          coords)
    pe = pe.at[:, 0].add(p["point_embeddings"]["2"]["weight"][0])
    pe = pe.at[:, 1].add(p["point_embeddings"]["3"]["weight"][0])
    return pe


def embed_masks(p, masks):
    """mask_downscaling Sequential (prompt_encoder.py:57-65); NHWC."""
    x = conv2d(masks, p["mask_downscaling"]["0"], stride=2)
    x = jax.nn.gelu(layer_norm_2d(x, p["mask_downscaling"]["1"]),
                    approximate=False)
    x = conv2d(x, p["mask_downscaling"]["3"], stride=2)
    x = jax.nn.gelu(layer_norm_2d(x, p["mask_downscaling"]["4"]),
                    approximate=False)
    return conv2d(x, p["mask_downscaling"]["6"])


def prompt_encoder(p, image_embedding_size, input_image_size,
                   points=None, boxes=None, masks=None, batch_size=1):
    """Returns (sparse (B, N, C), dense (B, H, W, C))."""
    parts = []
    if points is not None:
        coords, labels = points
        parts.append(embed_points(p, coords, labels, input_image_size,
                                  pad=boxes is None))
    if boxes is not None:
        parts.append(embed_boxes(p, boxes, input_image_size))
    sparse = jnp.concatenate(parts, axis=1) if parts else \
        jnp.zeros((batch_size, 0, p["no_mask_embed"]["weight"].shape[-1]), f32)
    if masks is not None:
        dense = embed_masks(p, masks)
    else:
        h, w = image_embedding_size
        dense = jnp.broadcast_to(
            p["no_mask_embed"]["weight"][0][None, None, None, :],
            (sparse.shape[0], h, w,
             p["no_mask_embed"]["weight"].shape[-1]))
    return sparse, dense


def get_dense_pe(p, image_embedding_size):
    return random_pe_grid(
        p["pe_layer"]["positional_encoding_gaussian_matrix"],
        *image_embedding_size)                              # (H, W, C)


# ------------------------------------------------------- two-way transformer

def twoway_block(p, queries, keys, query_pe, key_pe, num_heads: int,
                 skip_first_layer_pe: bool):
    if skip_first_layer_pe:
        queries = attention(queries, queries, queries, p["self_attn"],
                            num_heads)
    else:
        q = queries + query_pe
        queries = queries + attention(q, q, queries, p["self_attn"],
                                      num_heads)
    queries = layer_norm(queries, p["norm1"])

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + attention(q, k, keys, p["cross_attn_token_to_image"],
                                  num_heads)
    queries = layer_norm(queries, p["norm2"])

    queries = queries + mlp(queries, p["mlp"], num_layers=2)
    queries = layer_norm(queries, p["norm3"])

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + attention(k, q, queries, p["cross_attn_image_to_token"],
                            num_heads)
    keys = layer_norm(keys, p["norm4"])
    return queries, keys


def twoway_transformer(p, image_embedding, image_pe, point_embedding,
                       depth: int = 2, num_heads: int = 8):
    """image_embedding/image_pe: (B, H, W, C); point_embedding (B, N, C).
    Returns (queries, keys(B, HW, C))."""
    b, h, w, c = image_embedding.shape
    keys = image_embedding.reshape(b, h * w, c)
    key_pe = image_pe.reshape(b, h * w, c) if image_pe.ndim == 4 else image_pe

    queries = point_embedding
    for i in range(depth):
        queries, keys = twoway_block(p["layers"][str(i)], queries, keys,
                                     point_embedding, key_pe, num_heads,
                                     skip_first_layer_pe=(i == 0))
    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + attention(q, k, keys, p["final_attn_token_to_image"],
                                  num_heads)
    queries = layer_norm(queries, p["norm_final_attn"])
    return queries, keys


# ------------------------------------------------------------- mask decoder

def mask_decoder(p, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool, high_res_features,
                 num_mask_tokens: int = 4, pred_obj_scores: bool = True,
                 use_multimask_token_for_obj_ptr: bool = True):
    """MaskDecoder.forward/predict_masks (mask_decoder.py:115-245); NHWC.

    image_embeddings/dense_prompt: (B, H, W, C); image_pe: (H, W, C).
    Returns (masks (B,M,h4,w4), iou_pred (B,M), sam_tokens (B,·,C),
    object_score_logits (B,1))."""
    b = sparse_prompt.shape[0]
    toks = [p["iou_token"]["weight"], p["mask_tokens"]["weight"]]
    s = 0
    if pred_obj_scores:
        toks = [p["obj_score_token"]["weight"]] + toks
        s = 1
    output_tokens = jnp.concatenate(toks, axis=0)
    output_tokens = jnp.broadcast_to(
        output_tokens[None], (b,) + output_tokens.shape)
    tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)

    src = image_embeddings + dense_prompt
    pos_src = jnp.broadcast_to(image_pe[None], src.shape)

    hs, src_out = twoway_transformer(p["transformer"], src, pos_src, tokens)
    iou_token_out = hs[:, s]
    mask_tokens_out = hs[:, s + 1: s + 1 + num_mask_tokens]

    B, H, W, C = src.shape
    src_img = src_out.reshape(B, H, W, C)

    # output upscaling with high-res skip features (mask_decoder.py:218-226)
    feat_s0, feat_s1 = high_res_features
    up = conv_transpose2d_s2(src_img, p["output_upscaling"]["0"], kernel=2)
    up = jax.nn.gelu(layer_norm_2d(up + feat_s1, p["output_upscaling"]["1"]),
                     approximate=False)
    up = conv_transpose2d_s2(up, p["output_upscaling"]["3"], kernel=2)
    up = jax.nn.gelu(up + feat_s0, approximate=False)       # (B, 4H, 4W, c8)

    hyper = jnp.stack(
        [mlp(mask_tokens_out[:, i], p["output_hypernetworks_mlps"][str(i)],
             num_layers=3) for i in range(num_mask_tokens)], axis=1)
    Bh, Hu, Wu, Cu = up.shape
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)

    iou_pred = mlp(iou_token_out, p["iou_prediction_head"], num_layers=3,
                   sigmoid_output=True)
    if pred_obj_scores:
        object_score_logits = mlp(hs[:, 0], p["pred_obj_score_head"],
                                  num_layers=3)
    else:
        object_score_logits = 10.0 * jnp.ones((b, 1), f32)

    if multimask_output:
        masks = masks[:, 1:]
        iou_pred = iou_pred[:, 1:]
        sam_tokens_out = mask_tokens_out[:, 1:] \
            if use_multimask_token_for_obj_ptr else mask_tokens_out[:, 0:1]
    else:
        masks = masks[:, 0:1]
        iou_pred = iou_pred[:, 0:1]
        sam_tokens_out = mask_tokens_out[:, 0:1]
    return masks, iou_pred, sam_tokens_out, object_score_logits
