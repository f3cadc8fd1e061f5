"""Image-quality metrics (vendored-equivalents of the reference's
metrics.py stack: PSNR/SSIM live in ops.ssim; LPIPS here)."""

from gs2mesh_tpu.metrics.lpips import (convert_lpips_checkpoint,
                                       init_lpips_params, lpips)

__all__ = ["lpips", "init_lpips_params", "convert_lpips_checkpoint"]
