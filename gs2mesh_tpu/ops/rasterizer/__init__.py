from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.api import rasterize, RasterizeOutput
