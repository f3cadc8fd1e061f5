"""Pair-feature gather with a scatter-free custom backward.

Forward: one fused row gather of the per-Gaussian feature rows into the
chunk-transposed (K/chunk, FEAT, chunk) pair layout.

Backward: XLA's scatter-add on TPU costs ~100 ns/row (430+ ms for a DTU-sized
frame), so instead the per-pair cotangents are permuted to EMISSION order
(where each Gaussian's pairs are contiguous) with one row gather, then
reduced per-Gaussian by a Pallas kernel that turns the segmented sum into
one-hot MXU matmuls over 128-Gaussian blocks — deterministic, no atomics,
no scatter. This replaces the role of the CUDA reference's atomicAdd
gradient accumulation (backward.cu:523-554) with something strictly better
on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.tile_render import FEAT

f32 = jnp.float32
HI = jax.lax.Precision.HIGHEST


def build_feature_rows(prep) -> jnp.ndarray:
    """(N+1, FEAT) per-Gaussian feature rows (last row = dummy zeros)."""
    N = prep.means2d.shape[0]
    rows = jnp.concatenate([
        prep.means2d, prep.conic, prep.opacity[:, None], prep.rgb,
        jnp.zeros((N, FEAT - 9), jnp.float32)], axis=1)
    return jnp.concatenate([rows, jnp.zeros((1, FEAT), jnp.float32)], axis=0)


SPAN = 8  # emission chunks fetched per DMA (amortizes DMA issue latency)


def _segsum_kernel(c0_ref, nc_ref, ct_hbm, ids_hbm, out_ref,
                   ctbuf, idbuf, sems, *, chunk: int):
    """Per-128-Gaussian-block segmented sum via one-hot matmuls.

    Each block's emission chunks are streamed in double-buffered SPAN-chunk
    DMAs; every sub-chunk contributes one (pair, gauss) one-hot x (pair,
    FEAT) MXU matmul. Boundary chunks shared between adjacent blocks are
    visited by both; the one-hot comparison against the block's own gaussian
    ids keeps the contributions disjoint."""
    b = pl.program_id(0)
    g0 = b * chunk
    nc = nc_ref[b]
    c0 = c0_ref[b]
    nspans = (nc + SPAN - 1) // SPAN

    gcol = g0 + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)  # (1, chunk)

    def dma(slot, si):
        at = c0 + si * SPAN
        return (pltpu.make_async_copy(ct_hbm.at[pl.ds(at, SPAN)],
                                      ctbuf.at[slot], sems.at[2 * slot]),
                pltpu.make_async_copy(ids_hbm.at[pl.ds(at, SPAN)],
                                      idbuf.at[slot], sems.at[2 * slot + 1]))

    @pl.when(nspans > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    def body(si, acc):
        slot = jax.lax.rem(si, 2)

        @pl.when(si + 1 < nspans)
        def _():
            for d in dma(1 - slot, si + 1):
                d.start()

        for d in dma(slot, si):
            d.wait()
        for j in range(SPAN):
            live = jnp.where(si * SPAN + j < nc, 1.0, 0.0)
            ids = idbuf[slot, j]                      # (1, chunk)
            onehot = (ids.T == gcol).astype(f32) * live  # (pair, gauss)
            acc = acc + jax.lax.dot_general(
                onehot, ctbuf[slot, j], (((0,), (1,)), ((), ())),
                preferred_element_type=f32, precision=HI)  # (gauss, FEAT)
        return acc

    acc = jax.lax.fori_loop(0, nspans, body, jnp.zeros((chunk, FEAT), f32))
    out_ref[0] = acc


def _segment_sum_tpu(ct3d, ids3d, block_c0, block_nc, n_rows: int,
                     cfg: RasterizerConfig):
    chunk = cfg.chunk
    NB = block_c0.shape[0]
    # Tail-pad so a SPAN-sized DMA starting at the last chunk stays in
    # bounds (masked out of the matmuls by the `live` factor).
    ct3d = jnp.concatenate(
        [ct3d, jnp.zeros((SPAN, FEAT, chunk), f32)], axis=0)
    ids3d = jnp.concatenate(
        [ids3d, jnp.full((SPAN, 1, chunk), -1, ids3d.dtype)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((1, chunk, FEAT), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, SPAN, FEAT, chunk), f32),
            pltpu.VMEM((2, SPAN, 1, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NB, chunk, FEAT), f32)],
        interpret=jax.default_backend() != "tpu",
    )(block_c0, block_nc, ct3d, ids3d)[0]
    out = out.reshape(NB * chunk, FEAT)
    drows = jnp.zeros((n_rows, FEAT), f32)
    take = min(NB * chunk, n_rows)
    return drows.at[:take].set(out[:take])


NCOLS = 9  # live feature columns (x, y, conic a/b/c, opacity, rgb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gather_pairs(rows, pair_ids, emission_of_sorted, emission_ids3d,
                 block_c0, block_nc, cfg: RasterizerConfig):
    """rows (N+1, FEAT) -> chunk-transposed (K/chunk, FEAT, chunk) pairs
    in sorted (tile, depth) order."""
    K = pair_ids.shape[0]
    chunk = cfg.chunk
    g = rows[pair_ids]
    return g.reshape(K // chunk, chunk, FEAT).transpose(0, 2, 1)


def _gather_fwd(rows, pair_ids, emission_of_sorted, emission_ids3d,
                block_c0, block_nc, cfg):
    out = gather_pairs(rows, pair_ids, emission_of_sorted, emission_ids3d,
                       block_c0, block_nc, cfg)
    res = (rows.shape[0], pair_ids, emission_of_sorted, emission_ids3d,
           block_c0, block_nc)
    return out, res


def _gather_bwd(cfg, res, ct3d):
    (n_rows, pair_ids, emission_of_sorted, emission_ids3d,
     block_c0, block_nc) = res
    K = pair_ids.shape[0]
    chunk = cfg.chunk
    if jax.default_backend() == "tpu":
        # Permute cotangents to emission order (each Gaussian's pairs
        # contiguous) by SORTING on the emission index and carrying the live
        # columns as sort payload — a random row gather over the K-sized
        # array runs at ~2 GB/s on TPU, while the payload sort is ~3x
        # faster. Keys are a permutation (unique), so stability is moot.
        flat = ct3d.transpose(0, 2, 1).reshape(K, FEAT)
        cols = tuple(flat[:, i] for i in range(NCOLS))
        sorted_ = jax.lax.sort((emission_of_sorted,) + cols, num_keys=1,
                               is_stable=False)
        ct_e = jnp.stack(sorted_[1:], axis=1)              # (K, NCOLS)
        ct_e = jnp.concatenate(
            [ct_e, jnp.zeros((K, FEAT - NCOLS), f32)], axis=1)
        ct_e3d = ct_e.reshape(K // chunk, chunk, FEAT).transpose(0, 2, 1)
        drows = _segment_sum_tpu(ct_e3d, emission_ids3d, block_c0, block_nc,
                                 n_rows, cfg)
    else:
        flat = ct3d.transpose(0, 2, 1).reshape(K, FEAT)
        drows = jnp.zeros((n_rows, FEAT), f32).at[pair_ids].add(flat)
    return (drows, None, None, None, None, None)


gather_pairs.defvjp(_gather_fwd, _gather_bwd)


def pack_pair_features_fast(prep, binning, cfg: RasterizerConfig):
    """Differentiable pair packing with the scatter-free backward."""
    chunk = cfg.chunk
    K = binning.pair_ids.shape[0]
    ids3d = binning.emission_ids.reshape(K // chunk, 1, chunk)
    rows = build_feature_rows(prep)
    return gather_pairs(rows, binning.pair_ids, binning.emission_of_sorted,
                        ids3d, binning.block_chunk_start,
                        binning.block_chunk_count, cfg)
