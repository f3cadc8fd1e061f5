"""Static configuration for the TPU tile rasterizer."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RasterizerConfig:
    """Static (compile-time) rasterizer parameters.

    The CUDA reference uses 16x16 pixel tiles (config.h:16-17); on TPU we use
    32x32 = 1024 pixels so a tile's pixel vector fills exactly one (8, 128)
    f32 VPU/VMEM native tile, and per-chunk compositing matmuls are MXU-sized.
    """

    tile: int = 32                  # pixel tile edge (tile*tile == 1024)
    chunk: int = 128                # Gaussians composited per MXU chunk
    pair_capacity: int = 1 << 20    # max (tile, gaussian) pairs per frame
    # Numerical-semantics constants (identical to the CUDA reference):
    alpha_clamp: float = 0.99       # max per-gaussian alpha (forward.cu:346)
    alpha_min: float = 1.0 / 255.0  # skip threshold (forward.cu:347)
    transmittance_eps: float = 1e-4  # early-stop threshold (forward.cu:349)
    near: float = 0.2               # near-cull view-space z (auxiliary.h:154)
    dilation: float = 0.3           # low-pass cov2d dilation (forward.cu:110)
    fov_clamp: float = 1.3          # EWA tangent-plane clamp (forward.cu:86)
    # Sort-payload compression (emit.py). jax.lax.sort cost scales per
    # 4-byte payload column, so packing two bf16-rounded columns per u32
    # halves the carry cost:
    #   feat_carry_bf16 — conic/opacity/rgb columns ride the (tile, depth)
    #     sort as bf16 pairs (means stay f32: sub-pixel precision). Image
    #     error ~2^-9 relative on alpha/color — invisible in 8-bit output
    #     and in training loss, but NOT bit-parity with the golden renderer;
    #     parity tests pin this to False.
    #   grad_carry_bf16 — per-pair cotangents ride the emission-order sort
    #     as bf16 pairs (~0.4% relative noise on per-pair gradient terms,
    #     averaged down by the per-gaussian sum).
    feat_carry_bf16: bool = True
    grad_carry_bf16: bool = True
    # Sort stability. The reference's radix sort is stable over its full
    # 64-bit (tile | f32-depth) key; our 32-bit key quantizes depth to its
    # msbs, and `sort_stable` controls whether quantization ties resolve to
    # emission order (reference-like) or arbitrarily (~2.5 ms faster at
    # K=2.75M on v5e; ties require depth agreement to ~2^-14 relative, so
    # tie order is visually and statistically immaterial). Exact-carry mode
    # (feat_carry_bf16=False) always sorts stable.
    sort_stable: bool = False
    # Tile-row stride for sharded emission (parallel/sharded_train.py).
    # Local tile row l maps to global tile row  row_offset + l*row_stride:
    # stride G with offset = device index gives round-robin (interleaved)
    # row ownership, which balances per-device pair counts on center-heavy
    # scenes (contiguous bands give middle devices several times the edge
    # devices' load). 1 = identity (single chip).
    row_stride: int = 1
    # Testing escape hatch: run the production Pallas paths (fused emission
    # decode + tile compositors) in interpret mode off-TPU, e.g. on the
    # 8-virtual-device CPU mesh, so multi-chip tests exercise the REAL
    # kernels including the strided (row_stride > 1) decode. Production
    # code never sets this; on TPU it is a no-op.
    force_pallas: bool = False
    # Backward cotangent compaction: the render backward appends only the
    # chunks it computes (fused path) / zero chunks are dropped before the
    # reduction sort (fallback path). Static sort capacity as a fraction of
    # pair chunks; when the live count exceeds it the backward falls back
    # to the full-size sort (correctness never depends on the fraction).
    # The bench scene measures ~26-27% computed chunks on v5e; 0.3 keeps
    # ~12% headroom plus the always-correct fallback.
    bwd_compact_frac: float = 0.3

    @property
    def pixels_per_tile(self) -> int:
        return self.tile * self.tile

    def grid_size(self, width: int, height: int):
        gx = -(-width // self.tile)
        gy = -(-height // self.tile)
        return gx, gy
