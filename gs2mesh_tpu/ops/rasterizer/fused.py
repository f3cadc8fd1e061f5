"""Fused differentiable emission -> sort -> Pallas composite (TPU hot path).

One custom-vjp op spanning what ``emit.emit_sorted_pairs`` +
``pallas_kernels.render_tiles_pallas`` expose as two: fusing them lets the
backward use the COMPACTED gradient layout end to end. The replay-backward
kernel appends only the chunks it actually computes (~25% of capacity on
saturated scenes, pallas_kernels.bwd_call_compact), with per-pair gaussian
ids riding each appended chunk — so the per-gaussian reduction consumes the
compacted stream directly. The positional-layout machinery this kills (the
liveness reduce over all of capacity, the permutation-gather compaction, the
VJP zero-fill of skipped chunks — ~3.5 ms/frame at DTU scale on v5e) existed
only because the two ops' VJP boundary forced a dense (K/chunk, FEAT, chunk)
cotangent between them.

Requires the packed bf16 feature carry (cfg.feat_carry_bf16): the ids the
backward recovers ride the mean-mantissa bits (emit.stuff_ids). The CUDA
reference's equivalent boundary is rasterizer_impl.cu:275-318 (forward
binning) + backward.cu:399-557 (atomicAdd per-gaussian reduction); here the
whole differentiable pipeline is scatter-free and deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.emit import (NCOLS, _emit_fwd,
                                             reduce_compact_cts)
from gs2mesh_tpu.ops.rasterizer.pallas_kernels import (_fwd_call,
                                                       bwd_call_compact)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def emit_render_fused(feat9, depths, rect, tiles_touched,
                      width: int, height: int, cfg: RasterizerConfig,
                      row_offset=0):
    """feat9 (N, 9) per-gaussian features -> (color (T,3,P) pre-background,
    final_T (T,P), EmitAux). Differentiable w.r.t. feat9 only."""
    out, _ = _fused_fwd(feat9, depths, rect, tiles_touched, width, height,
                        cfg, row_offset)
    return out


def _fused_fwd(feat9, depths, rect, tiles_touched, width, height, cfg,
               row_offset=0):
    assert cfg.feat_carry_bf16, \
        "fused path needs the id-carrying packed feature layout"
    (pair_feat, aux), _ = _emit_fwd(feat9, depths, rect, tiles_touched,
                                    width, height, cfg, row_offset)
    # Stage boundary: keep XLA from fusing the index plumbing into the
    # compositing graph (see api.rasterize).
    pair_feat, starts, counts = jax.lax.optimization_barrier(
        (pair_feat, aux.tile_starts, aux.tile_counts))
    gx, gy = cfg.grid_size(width, height)
    color, finalT = _fwd_call(pair_feat, starts, counts, gx, gy, cfg)
    res = (pair_feat, starts, counts, color, finalT, feat9.shape[0])
    return (color, finalT, aux), res


def _fused_bwd(width, height, cfg, res, cot):
    pair_feat, starts, counts, color, finalT, n_rows = res
    dC, dTf = cot[0], cot[1]                     # aux cotangent is int-typed
    gx, gy = cfg.grid_size(width, height)
    dpairs, n_written = bwd_call_compact(
        pair_feat, starts, counts, color, finalT, dC, dTf, gx, gy, cfg)
    drows = reduce_compact_cts(dpairs, n_written, n_rows, cfg)
    return (drows[:, :NCOLS], None, None, None, None)


emit_render_fused.defvjp(lambda *a: _fused_fwd(*a), _fused_bwd)
