"""DLNR stereo-matching network (CVPR'23 "High-Frequency Stereo Matching
Network"), reimplemented TPU-first in functional JAX.

Reference: /root/reference/third_party/DLNR (core/dlnr.py:24-133). Used
inference-only by the pipeline with DLNR_Middlebury / DLNR_SceneFlow
checkpoints; `convert.convert_torch_state_dict` maps the released torch
weights onto this implementation's parameter pytree.
"""

from gs2mesh_tpu.stereo.dlnr import DLNRConfig, dlnr_forward, init_dlnr_params
from gs2mesh_tpu.stereo.padder import InputPadder
from gs2mesh_tpu.stereo.convert import convert_torch_state_dict

__all__ = ["DLNRConfig", "dlnr_forward", "init_dlnr_params", "InputPadder",
           "convert_torch_state_dict"]
