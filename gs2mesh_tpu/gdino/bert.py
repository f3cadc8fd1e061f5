"""BERT text encoder (HF bert-base layout) + GroundingDINO text masking.

Functional port of the BertModelWarper path (groundingdino/models/
GroundingDINO/bertwarper.py): standard BERT embeddings + encoder driven
with the sub-sentence self-attention masks and per-phrase position ids
produced by generate_masks_with_special_tokens_and_transfer_map
(bertwarper.py:224-273). Parameter names mirror the HF state dict.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.sam2.layers import layer_norm, linear

f32 = jnp.float32
MASK_NEG = -1e30


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2


def bert_embeddings(p, input_ids, position_ids, token_type_ids=None):
    x = p["word_embeddings"]["weight"][input_ids]
    x = x + p["position_embeddings"]["weight"][position_ids]
    tt = token_type_ids if token_type_ids is not None \
        else jnp.zeros_like(input_ids)
    x = x + p["token_type_embeddings"]["weight"][tt]
    return layer_norm(x, p["LayerNorm"], eps=1e-12)


def _self_attention(x, p, num_heads: int, ext_mask):
    B, N, C = x.shape
    d = C // num_heads

    def heads(t):
        return t.reshape(B, N, num_heads, d).transpose(0, 2, 1, 3)

    q = heads(linear(x, p["self"]["query"]))
    k = heads(linear(x, p["self"]["key"]))
    v = heads(linear(x, p["self"]["value"]))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d))
    attn = attn + ext_mask
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    out = linear(out, p["output"]["dense"])
    return layer_norm(x + out, p["output"]["LayerNorm"], eps=1e-12)


def bert_layer(x, p, num_heads: int, ext_mask):
    x = _self_attention(x, p["attention"], num_heads, ext_mask)
    h = jax.nn.gelu(linear(x, p["intermediate"]["dense"]),
                    approximate=False)
    h = linear(h, p["output"]["dense"])
    return layer_norm(x + h, p["output"]["LayerNorm"], eps=1e-12)


def bert_encoder(p, input_ids, attention_mask_3d, position_ids,
                 cfg: BertConfig = BertConfig()):
    """attention_mask_3d: (B, N, N) bool — True where attention allowed
    (the sub-sentence masks). Returns last hidden state (B, N, hidden)."""
    ext = jnp.where(attention_mask_3d[:, None], 0.0, MASK_NEG)
    x = bert_embeddings(p["embeddings"], input_ids, position_ids)
    for i in range(cfg.num_layers):
        x = bert_layer(x, p["encoder"]["layer"][str(i)], cfg.num_heads, ext)
    return x


def generate_masks_with_special_tokens(input_ids: np.ndarray,
                                       special_token_ids) -> tuple:
    """bertwarper.py:224-273 (host-side): per-phrase block-diagonal
    self-attention masks + restarted position ids. input_ids: (B, N) numpy.
    Returns (attention_mask (B,N,N) bool, position_ids (B,N) int)."""
    bs, num_token = input_ids.shape
    special = np.zeros((bs, num_token), bool)
    for tok in special_token_ids:
        special |= input_ids == tok

    attention_mask = np.tile(np.eye(num_token, dtype=bool), (bs, 1, 1))
    position_ids = np.zeros((bs, num_token), np.int64)
    idxs = np.argwhere(special)
    previous_col = 0
    for row, col in idxs:
        if col == 0 or col == num_token - 1:
            attention_mask[row, col, col] = True
            position_ids[row, col] = 0
        else:
            attention_mask[row, previous_col + 1: col + 1,
                           previous_col + 1: col + 1] = True
            position_ids[row, previous_col + 1: col + 1] = \
                np.arange(0, col - previous_col)
        previous_col = col
    return attention_mask, position_ids


def init_bert_params(pm, cfg: BertConfig = BertConfig()):
    def layer():
        return {
            "attention": {
                "self": {"query": pm.lin(cfg.hidden_size, cfg.hidden_size),
                         "key": pm.lin(cfg.hidden_size, cfg.hidden_size),
                         "value": pm.lin(cfg.hidden_size, cfg.hidden_size)},
                "output": {"dense": pm.lin(cfg.hidden_size, cfg.hidden_size),
                           "LayerNorm": pm.ln(cfg.hidden_size)},
            },
            "intermediate": {"dense": pm.lin(cfg.hidden_size,
                                             cfg.intermediate_size)},
            "output": {"dense": pm.lin(cfg.intermediate_size,
                                       cfg.hidden_size),
                       "LayerNorm": pm.ln(cfg.hidden_size)},
        }

    return {
        "embeddings": {
            "word_embeddings": {"weight": pm.randn(
                (cfg.vocab_size, cfg.hidden_size))},
            "position_embeddings": {"weight": pm.randn(
                (cfg.max_position_embeddings, cfg.hidden_size))},
            "token_type_embeddings": {"weight": pm.randn(
                (cfg.type_vocab_size, cfg.hidden_size))},
            "LayerNorm": pm.ln(cfg.hidden_size),
        },
        "encoder": {"layer": {str(i): layer()
                              for i in range(cfg.num_layers)}},
    }
