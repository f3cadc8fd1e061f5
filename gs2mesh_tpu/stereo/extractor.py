"""Channel-Attention Transformer extractor (Restormer-style U-Net).

Functional JAX port of DLNR's Channel_Attention_Transformer_Extractor
(/root/reference/third_party/DLNR/core/extractor.py:229-341): PixelUnshuffle
(4) embed, 4 encoder levels (dims 64/128/256/512, blocks [4,6,6,8], heads
[1,2,4,8]), PixelShuffle decoder with skip concats, and dual context heads
emitted at 1/4, 1/8 and 1/16 resolution plus the shared volume feature.
"""

from __future__ import annotations

import jax.numpy as jnp

from gs2mesh_tpu.stereo.layers import (ParamMaker, conv2d, downsample,
                                       pixel_unshuffle, transformer_stack,
                                       upsample)

DIM = 64
NUM_BLOCKS = (4, 6, 6, 8)
HEADS = (1, 2, 4, 8)


def extractor_forward(x, p):
    """x: (B, H, W, 3) in [-1, 1]. Returns (outputs04, outputs08, outputs16,
    v) where outputsNN are [head0, head1] lists over the FIRST half of the
    batch (the reference computes context heads for image1 only,
    extractor.py:325-340) and v is the full-batch 1/4 volume feature."""
    half = x.shape[0] // 2

    inp = pixel_unshuffle(x, 4)                              # (B, H/4, W/4, 48)
    e1 = conv2d(inp, p["patch_embed"]["proj"], padding=1)    # 64
    e1 = transformer_stack(e1, p["encoder_level1"], HEADS[0])

    e2 = downsample(e1, p["down1_2"])                        # 128 @ 1/8
    e2 = transformer_stack(e2, p["encoder_level2"], HEADS[1])

    e3 = downsample(e2, p["down2_3"])                        # 256 @ 1/16
    e3 = transformer_stack(e3, p["encoder_level3"], HEADS[2])

    e4 = downsample(e3, p["down3_4"])                        # 512 @ 1/32
    latent = transformer_stack(e4, p["latent"], HEADS[3])

    d3 = upsample(latent, p["up4_3"])                        # 256 @ 1/16
    d3 = jnp.concatenate([d3, e3], axis=-1)                  # 512
    d3 = conv2d(d3, p["reduce_chan_level3"], padding=0)      # 256
    d3_head = d3[:half]
    # outputs16 applies the SAME conv twice (extractor.py:295: the ModuleList
    # holds two references to output16) — both heads are identical.
    o16a = conv2d(d3_head, p["output16"], padding=0)
    outputs16 = [o16a, o16a]
    d3 = transformer_stack(d3, p["decoder_level3"], HEADS[2])

    d2 = upsample(d3, p["up3_2"])                            # 128 @ 1/8
    d2 = jnp.concatenate([d2, e2], axis=-1)                  # 256
    d2_head = d2[:half]
    outputs08 = [conv2d(d2_head, p["reduce_chan_level2"], padding=0),
                 conv2d(d2_head, p["reduce_chan_level2_copy"], padding=0)]
    d2 = conv2d(d2, p["reduce_chan_level2"], padding=0)      # 128
    d2 = transformer_stack(d2, p["decoder_level2"], HEADS[1])

    d1 = upsample(d2, p["up2_1"])                            # 64 @ 1/4
    v = jnp.concatenate([d1, e1], axis=-1)                   # 128
    v_head = v[:half]
    outputs04 = [transformer_stack(v_head, p["decoder_level1"], HEADS[0]),
                 transformer_stack(v_head, p["decoder_level1_copy"],
                                   HEADS[0])]
    return outputs04, outputs08, outputs16, v


def init_extractor_params(pm: ParamMaker):
    d = DIM
    return {
        "patch_embed": {"proj": pm.conv(3, 3, 48, d, bias=False)},
        "encoder_level1": pm.tstack(NUM_BLOCKS[0], d, HEADS[0]),
        "down1_2": {"body": {"0": pm.conv(3, 3, d, d // 2, bias=False)}},
        "encoder_level2": pm.tstack(NUM_BLOCKS[1], 2 * d, HEADS[1]),
        "down2_3": {"body": {"0": pm.conv(3, 3, 2 * d, d, bias=False)}},
        "encoder_level3": pm.tstack(NUM_BLOCKS[2], 4 * d, HEADS[2]),
        "down3_4": {"body": {"0": pm.conv(3, 3, 4 * d, 2 * d, bias=False)}},
        "latent": pm.tstack(NUM_BLOCKS[3], 8 * d, HEADS[3]),
        "up4_3": {"body": {"0": pm.conv(3, 3, 8 * d, 16 * d, bias=False)}},
        "reduce_chan_level3": pm.conv(1, 1, 8 * d, 4 * d, bias=False),
        "decoder_level3": pm.tstack(NUM_BLOCKS[2], 4 * d, HEADS[2]),
        "up3_2": {"body": {"0": pm.conv(3, 3, 4 * d, 8 * d, bias=False)}},
        "reduce_chan_level2": pm.conv(1, 1, 4 * d, 2 * d, bias=False),
        "reduce_chan_level2_copy": pm.conv(1, 1, 4 * d, 2 * d, bias=False),
        "decoder_level2": pm.tstack(NUM_BLOCKS[1], 2 * d, HEADS[1]),
        "up2_1": {"body": {"0": pm.conv(3, 3, 2 * d, 4 * d, bias=False)}},
        "decoder_level1": pm.tstack(NUM_BLOCKS[0], 2 * d, HEADS[0]),
        "decoder_level1_copy": pm.tstack(NUM_BLOCKS[0], 2 * d, HEADS[0]),
        "output16": pm.conv(1, 1, 4 * d, 2 * d, bias=False),
    }
