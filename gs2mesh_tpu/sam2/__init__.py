"""SAM2 (Segment Anything 2) in functional JAX — video object segmentation
for the automatic masking stage.

Reference: /root/reference/third_party/segment-anything-2 (Meta SAM2).
Re-implemented TPU-first: Hiera trunk + FPN neck, prompt encoder, two-way
mask decoder, streaming memory attention/encoder, and image/video predictor
APIs. `convert.convert_sam2_checkpoint` maps the released torch checkpoints
(sam2_hiera_{tiny,small,base_plus,large}.pt) onto this parameter pytree.
"""

from gs2mesh_tpu.sam2.model import SAM2Config, init_sam2_params
from gs2mesh_tpu.sam2.predictor import SAM2ImagePredictor, SAM2VideoPredictor
from gs2mesh_tpu.sam2.convert import convert_sam2_checkpoint

__all__ = ["SAM2Config", "init_sam2_params", "SAM2ImagePredictor",
           "SAM2VideoPredictor", "convert_sam2_checkpoint"]
