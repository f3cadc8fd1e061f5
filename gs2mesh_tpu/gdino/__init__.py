"""GroundingDINO (open-vocabulary detector) in functional JAX.

Reference: /root/reference/third_party/GroundingDINO (IDEA Research).
Re-implemented TPU-first: Swin-T backbone, BERT text encoder, bidirectional
vision-language feature enhancer, multi-scale deformable attention
encoder/decoder (the CUDA ms_deform_attn kernel becomes a gather-based
bilinear sampler), language-guided two-stage query selection, and the
`load_model`/`predict` inference API. `convert.convert_gdino_checkpoint`
maps the released groundingdino_swint_ogc.pth weights.
"""

from gs2mesh_tpu.gdino.model import GDINOConfig, init_gdino_params, gdino_forward
from gs2mesh_tpu.gdino.convert import convert_gdino_checkpoint, convert_gdino_state_dict
from gs2mesh_tpu.gdino.inference import predict

__all__ = ["GDINOConfig", "init_gdino_params", "gdino_forward",
           "convert_gdino_checkpoint", "convert_gdino_state_dict", "predict"]
