"""Fused emission → (tile, depth) sort → packed pair features.

One differentiable op replacing the binning + pair-gather pair of stages.
TPU-native redesign of the CUDA reference's duplicateWithKeys + radix sort +
identifyTileRanges + per-pair feature fetch (rasterizer_impl.cu:275-318 plus
the renderCUDA collectives that re-read per-Gaussian data, forward.cu:281-309):

  * Per-pair features are decoded in EMISSION order with the one-hot MXU
    run-length decode (emission slots touch at most 128 consecutive compacted
    gaussian rows per 128-slot chunk), directly from a single (N, 16) table
    that now carries the full feature row (means2d, conic, opacity, rgb) —
    merging what used to be two separate K-row lookups (binning's gtable
    decode and pack's feature gather).
  * The (tile | depth-msbs) single-u32-key sort CARRIES the nine feature
    columns as sort payload instead of gathering them afterwards: payload
    movement through jax.lax.sort costs ~1.8 ms per column at K=4M on v5e
    while a K-row random gather costs ~33 ms — the sort IS the gather.
  * The backward permutes per-pair cotangents to emission order with the
    same payload-sort trick (key = the carried emission index) and reduces
    per-Gaussian with the one-hot MXU segment-sum kernel — deterministic,
    scatter-free, atomics-free (the reference uses atomicAdd,
    backward.cu:523-554).

Everything index-shaped runs under stop_gradient; gradients flow only
through the nine feature columns via the hand-written VJP.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.tile_render import FEAT

f32 = jnp.float32
i32 = jnp.int32
HI = jax.lax.Precision.HIGHEST

NCOLS = 9  # live feature columns: x, y, conic a/b/c, opacity, r, g, b


class EmitAux(NamedTuple):
    """Non-differentiable plumbing produced alongside the pair features."""
    tile_starts: jnp.ndarray        # (T,) i32 start into the sorted pairs
    tile_counts: jnp.ndarray        # (T,) i32 per-tile pair count
    num_pairs: jnp.ndarray          # () i32 true emission count
    overflow: jnp.ndarray           # () bool — capacity exceeded
    emission_of_sorted: jnp.ndarray  # (K,) i32 emission slot per sorted slot
    emission_ids: jnp.ndarray       # (K,) i32 gaussian id per EMISSION slot
    block_chunk_start: jnp.ndarray  # (NB,) i32 first emission chunk per block
    block_chunk_count: jnp.ndarray  # (NB,) i32 emission chunks per block


class Emission(NamedTuple):
    """Emission-order decode: everything known before the (tile,depth) sort."""
    key: jnp.ndarray          # (K,) u32 packed [tile_id | depth msbs]
    g: jnp.ndarray            # (K,) i32 real gaussian id per emission slot
    slot_valid: jnp.ndarray   # (K,) bool emission slot holds a real pair
    feat9: jnp.ndarray        # (K, 9) f32 emission-order feature columns
    num_pairs: jnp.ndarray    # () i32
    overflow: jnp.ndarray     # () bool
    emission_ids: jnp.ndarray  # (K,) i32 (== g where valid, else -1)
    block_chunk_start: jnp.ndarray
    block_chunk_count: jnp.ndarray


def emission_core(feat9, depths, rect, tiles_touched, width: int, height: int,
                  cfg: RasterizerConfig) -> Emission:
    """Emission-order slot decode + alpha-cut cull + packed sort key.

    feat9: (N, 9) per-gaussian feature rows [mx, my, ca, cb, cc, op, r, g, b].
    All inputs are treated as constants (stop_gradient applied here).
    """
    N = depths.shape[0]
    K = cfg.pair_capacity
    gx, gy = cfg.grid_size(width, height)
    num_tiles = gx * gy
    chunk = cfg.chunk

    feat9 = jax.lax.stop_gradient(feat9)
    depths = jax.lax.stop_gradient(depths)
    rect = jax.lax.stop_gradient(rect)
    tiles = jax.lax.stop_gradient(tiles_touched)

    # Exclusive prefix of per-gaussian tile counts -> pair slot offsets.
    cum = jnp.cumsum(tiles)
    num_pairs = cum[-1]
    offsets = cum - tiles                                  # (N,)
    has = (tiles > 0) & (offsets < K)
    slot_valid = jnp.arange(K, dtype=i32) < jnp.minimum(num_pairs, K)

    # Compacted per-run row table indexed by run id (run = emitting gaussian
    # in index order): [real_id, offset, x0, y0, rect_w, depth, mx, my, ca,
    # cb, cc, op, r, g, b, 0]. real_id/offset stay < 2^24 so their f32
    # round-trip through the one-hot matmul is exact; raw f32 values pass
    # through exactly at HIGHEST precision.
    assert K < (1 << 24), "pair_capacity must fit f32-exact integers"
    OSENT = f32(1 << 28)           # offset sentinel for non-run table rows
    gtable = jnp.concatenate([
        jnp.stack([
            jnp.arange(N, dtype=f32),                      # real id
            offsets.astype(f32),
            rect[:, 0].astype(f32),
            rect[:, 1].astype(f32),
            jnp.maximum(rect[:, 2] - rect[:, 0], 1).astype(f32),
            depths,
        ], axis=1),
        feat9,
        jnp.zeros((N, 1), f32),
    ], axis=1)                                             # (N, 16)
    # Compaction: run id -> real id via one 1-D scatter, then ONE row gather
    # (1-D column gathers are ~20x slower than row gathers on TPU). Rows
    # beyond the live run count select the sentinel row (offset = OSENT) so
    # the slot->run step compare below never counts them.
    sent_row = jnp.zeros((1, 16), f32).at[0, 1].set(OSENT)
    gtable_ext = jnp.concatenate([gtable, sent_row], axis=0)
    run_pos = jnp.cumsum(has.astype(i32)) - 1              # (N,)
    ridx = jnp.full((N,), N, i32).at[
        jnp.where(has, run_pos, N)
    ].set(jnp.arange(N, dtype=i32), mode="drop")
    ctable = gtable_ext[ridx]                              # one (N, 16) row gather
    nb128 = -(-N // 128) + 1                               # +1 spare block
    ctable = jnp.concatenate([
        ctable,
        jnp.tile(sent_row, (nb128 * 128 - N, 1))], axis=0)

    # One-hot MXU run-length decode. Run offsets ascend strictly, so the run
    # of slot k is  r(k) = (# runs with offset <= k) - 1,  and within a
    # 128-slot chunk r spans <= 128 consecutive runs: two aligned 128-row
    # blocks of the compacted table cover the chunk. The within-window run
    # index comes from a STEP compare against the gathered offset column
    # (loc = row-sum of [offset_j <= slot] - 1) — this replaces a K-sized
    # scatter + K-sized cumsum (~14 ms at K=2.75M on v5e: XLA lowers both
    # poorly) with one fused compare+reduce over the already-gathered blocks.
    if K >= 128 and K % 128 == 0:
        C = K // 128
        # First run of each chunk, from a small C-sized searchsorted over
        # the compacted offsets (clip into the real table range).
        # Window = three aligned 64-row blocks (192 rows): covers at least
        # 192 - 63 = 129 >= 128 runs past any 64-aligned start, and a chunk
        # spans <= 128 runs — minimal coverage at 75% of the 256-row
        # operand footprint (the (C, 128, W) one-hot is the decode's
        # dominant memory cost).
        W = 192
        nb64 = nb128 * 2
        eo = ctable[:, 1]                                  # (nb128*128,) f32
        chunk0 = (jnp.arange(C, dtype=i32) * 128).astype(f32)
        r_start = jnp.searchsorted(eo, chunk0, side="right").astype(i32) - 1
        blk = jnp.clip(jnp.maximum(r_start, 0) // 64, 0, nb64 - 3)  # (C,)
        blocks = jax.lax.gather(
            ctable.reshape(nb64, 64, 16), blk[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(3, 64, 16)).reshape(C, W, 16)
        eo_win = blocks[:, :, 1]                           # (C, W)
        slot_f = (jnp.arange(K, dtype=i32).reshape(C, 128)).astype(f32)
        step = eo_win[:, None, :] <= slot_f[:, :, None]    # (C, 128, W)
        loc = jnp.sum(step, axis=2, dtype=i32) - 1         # (C, 128)
        onehot = (loc[:, :, None]
                  == jnp.arange(W, dtype=i32)[None, None, :])
        dec = jnp.einsum("cis,csf->cif", onehot.astype(f32), blocks,
                         precision=HI).reshape(K, 16)
    else:                          # tiny capacities: plain row gather
        r = jnp.searchsorted(ctable[:, 1], jnp.arange(K, dtype=i32).astype(f32),
                             side="right").astype(i32) - 1
        dec = ctable[jnp.clip(r, 0, ctable.shape[0] - 1)]

    g = dec[:, 0].astype(i32)                              # real gaussian id
    local = jnp.arange(K, dtype=i32) - dec[:, 1].astype(i32)
    rw = jnp.maximum(dec[:, 4].astype(i32), 1)
    tx = dec[:, 2].astype(i32) + local % rw
    ty = dec[:, 3].astype(i32) + local // rw
    depth_of_slot = dec[:, 5]

    # Exact alpha-cut pair culling: the compositors skip contributions with
    # alpha < 1/255 (forward.cu:336-441 `if (alpha < 1.0f/255.0f) continue`),
    # so a pair whose MAX alpha over its whole tile box is below the cut
    # contributes exactly zero — route it to the sentinel tile so render
    # kernels never stream it. Max alpha = op * exp(-Qmin) with Qmin the
    # closed-form minimum of the conic quadratic over the tile's pixel box
    # (interior stationary point or one of the four clamped edge minima);
    # a 2% threshold margin absorbs float disagreement with the kernels'
    # own per-pixel test, keeping outputs bit-identical.
    mx, my = dec[:, 6], dec[:, 7]
    ca, cb, cc = dec[:, 8], dec[:, 9], dec[:, 10]
    op = dec[:, 11]
    t = cfg.tile
    x_lo = tx.astype(f32) * t - mx
    x_hi = x_lo + (t - 1)
    y_lo = ty.astype(f32) * t - my
    y_hi = y_lo + (t - 1)

    def qval(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    def edge_x(dx):                   # min over dy in [y_lo, y_hi] at dx
        dy = jnp.clip(-cb * dx / jnp.maximum(cc, 1e-12), y_lo, y_hi)
        return qval(dx, dy)

    def edge_y(dy):
        dx = jnp.clip(-cb * dy / jnp.maximum(ca, 1e-12), x_lo, x_hi)
        return qval(dx, dy)

    inside = (x_lo <= 0) & (0 <= x_hi) & (y_lo <= 0) & (0 <= y_hi)
    qmin = jnp.minimum(jnp.minimum(edge_x(x_lo), edge_x(x_hi)),
                       jnp.minimum(edge_y(y_lo), edge_y(y_hi)))
    qmin = jnp.where(inside, 0.0, qmin)
    alive_pair = op * jnp.exp(-qmin) >= 0.98 / 255.0

    tile_id = jnp.where(slot_valid & alive_pair, ty * gx + tx,
                        num_tiles)                         # sentinel last

    # Single packed u32 key: [tile_id | depth-msbs]. Positive-f32 bit
    # patterns are monotone as unsigned ints, so dropping the low `tb` bits
    # keeps a (quantized) depth order; quantization ties resolve to the
    # stable emission order, matching the reference's stable radix sort.
    tb = int(num_tiles + 1).bit_length()                   # static
    dbits = jax.lax.bitcast_convert_type(depth_of_slot, jnp.uint32) >> tb
    key = (tile_id.astype(jnp.uint32) << (32 - tb)) | dbits

    emission_ids = jnp.where(slot_valid, g, -1)

    # Per-128-gaussian-block emission chunk ranges for the segment-sum kernel.
    nb = -(-N // chunk)
    offsets_ext = jnp.concatenate([offsets, num_pairs[None]]).astype(i32)
    g0 = jnp.minimum(jnp.arange(nb, dtype=i32) * chunk, N)
    g1 = jnp.minimum(g0 + chunk, N)
    start_pairs = jnp.minimum(offsets_ext[g0], K)
    end_pairs = jnp.minimum(offsets_ext[g1], K)
    block_c0 = start_pairs // chunk
    block_nc = jnp.maximum(-(-end_pairs // chunk) - block_c0, 0)
    block_nc = jnp.where(end_pairs > start_pairs, block_nc, 0)

    return Emission(key=key, g=g, slot_valid=slot_valid,
                    feat9=dec[:, 6:15], num_pairs=num_pairs,
                    overflow=num_pairs > K,
                    emission_ids=emission_ids,
                    block_chunk_start=block_c0.astype(i32),
                    block_chunk_count=block_nc.astype(i32))


def tile_ranges_from_sorted_keys(key_s, num_tiles: int):
    """Per-tile [start, start+count) via searchsorted over sorted keys."""
    tb = int(num_tiles + 1).bit_length()
    boundaries = (jnp.arange(num_tiles + 1, dtype=jnp.uint32)
                  << jnp.uint32(32 - tb))
    edges = jnp.searchsorted(key_s, boundaries, side="left").astype(i32)
    return edges[:-1], edges[1:] - edges[:-1]


# ---------------------------------------------------------------------------
# bf16 payload packing: two bf16-rounded f32 columns per u32 sort payload.
# ---------------------------------------------------------------------------


def pack2bf16(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Two f32 -> one u32 [bf16(x) | bf16(y)], round-to-nearest-even."""
    def _rne_hi16(v):
        b = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return (b + jnp.uint32(0x7FFF) + ((b >> 16) & jnp.uint32(1))) \
            & jnp.uint32(0xFFFF0000)
    return _rne_hi16(x) | (_rne_hi16(y) >> 16)


def unpack2bf16(p: jnp.ndarray):
    """Inverse of pack2bf16 (each half exactly representable in f32)."""
    x = jax.lax.bitcast_convert_type(p & jnp.uint32(0xFFFF0000), f32)
    y = jax.lax.bitcast_convert_type(p << 16, f32)
    return x, y


def _pack_cols(cols, packed: bool):
    """9 f32 columns -> sort payload tuple (packed: pairs ride one u32)."""
    if not packed:
        return tuple(cols)
    return (pack2bf16(cols[0], cols[1]), pack2bf16(cols[2], cols[3]),
            pack2bf16(cols[4], cols[5]), pack2bf16(cols[6], cols[7]),
            cols[8])


def _unpack_cols(payload, packed: bool):
    if not packed:
        return list(payload)
    out = []
    for p in payload[:4]:
        x, y = unpack2bf16(p)
        out += [x, y]
    out.append(payload[4])
    return out


# ---------------------------------------------------------------------------
# Per-gaussian cotangent reduction (the backward of the feature carry).
# ---------------------------------------------------------------------------

SPAN = 16  # emission chunks fetched per DMA (amortizes DMA issue latency)
IDCOL = FEAT - 1  # gaussian ids ride the spare last feature column
                  # (bitcast i32) so each span needs ONE DMA stream


def _segsum_kernel(c0_ref, nc_ref, ct_hbm, out_ref,
                   ctbuf, sems, *, chunk: int):
    """Per-128-Gaussian-block segmented sum via one-hot matmuls.

    Each block's emission chunks are streamed in double-buffered SPAN-chunk
    DMAs; every sub-chunk contributes one (pair, gauss) one-hot x (pair,
    FEAT) MXU matmul. Boundary chunks shared between adjacent blocks are
    visited by both; the one-hot comparison against the block's own gaussian
    ids (riding feature row IDCOL) keeps the contributions disjoint."""
    b = pl.program_id(0)
    g0 = b * chunk
    nc = nc_ref[b]
    c0 = c0_ref[b]
    nspans = (nc + SPAN - 1) // SPAN

    gcol = g0 + jax.lax.broadcasted_iota(i32, (1, chunk), 1)  # (1, chunk)

    def dma(slot, si):
        return pltpu.make_async_copy(
            ct_hbm.at[pl.ds(c0 + si * SPAN, SPAN)], ctbuf.at[slot],
            sems.at[slot])

    @pl.when(nspans > 0)
    def _():
        dma(0, 0).start()

    def body(si, acc):
        slot = jax.lax.rem(si, 2)

        @pl.when(si + 1 < nspans)
        def _():
            dma(1 - slot, si + 1).start()

        dma(slot, si).wait()
        for j in range(SPAN):
            live = jnp.where(si * SPAN + j < nc, 1.0, 0.0)
            ids = jax.lax.bitcast_convert_type(
                ctbuf[slot, j, IDCOL:IDCOL + 1, :], i32)   # (1, chunk)
            onehot = (ids.T == gcol).astype(f32) * live  # (pair, gauss)
            acc = acc + jax.lax.dot_general(
                onehot, ctbuf[slot, j], (((0,), (1,)), ((), ())),
                preferred_element_type=f32, precision=HI)  # (gauss, FEAT)
        return acc

    acc = jax.lax.fori_loop(0, nspans, body, jnp.zeros((chunk, FEAT), f32))
    out_ref[0] = acc


def segment_sum_tpu(ct3d, block_c0, block_nc, n_rows: int,
                    cfg: RasterizerConfig):
    """(K/chunk, FEAT, chunk) emission-order cotangents (gaussian ids
    bitcast into row IDCOL) -> (n_rows, FEAT)."""
    chunk = cfg.chunk
    NB = block_c0.shape[0]
    # Tail-pad so a SPAN-sized DMA starting at the last chunk stays in
    # bounds (masked out of the matmuls by the `live` factor).
    ct3d = jnp.concatenate(
        [ct3d, jnp.zeros((SPAN, FEAT, chunk), f32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((1, chunk, FEAT), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, SPAN, FEAT, chunk), f32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NB, chunk, FEAT), f32)],
        interpret=jax.default_backend() != "tpu",
    )(block_c0, block_nc, ct3d)[0]
    out = out.reshape(NB * chunk, FEAT)
    drows = jnp.zeros((n_rows, FEAT), f32)
    take = min(NB * chunk, n_rows)
    return drows.at[:take].set(out[:take])


# ---------------------------------------------------------------------------
# Fused differentiable op.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def emit_sorted_pairs(feat9, depths, rect, tiles_touched,
                      width: int, height: int, cfg: RasterizerConfig):
    """feat9 (N, 9) per-gaussian features -> ((K/chunk, FEAT, chunk) sorted
    pair features, EmitAux). Differentiable w.r.t. feat9 only."""
    out, _ = _emit_fwd(feat9, depths, rect, tiles_touched, width, height, cfg)
    return out


def _emit_fwd(feat9, depths, rect, tiles_touched, width, height, cfg):
    K = cfg.pair_capacity
    chunk = cfg.chunk
    gx, gy = cfg.grid_size(width, height)
    em = emission_core(feat9, depths, rect, tiles_touched, width, height, cfg)

    # Means stay f32 (sub-pixel precision); conic/opacity/rgb optionally ride
    # as bf16 pairs to halve sort payload cost (cfg.feat_carry_bf16).
    emission_idx = jnp.arange(K, dtype=i32)
    mcols = (em.feat9[:, 0], em.feat9[:, 1])
    rest = tuple(em.feat9[:, i] for i in range(2, NCOLS))
    if cfg.feat_carry_bf16:
        rest = (pack2bf16(rest[0], rest[1]), pack2bf16(rest[2], rest[3]),
                pack2bf16(rest[4], rest[5]), rest[6])
    sorted_ = jax.lax.sort((em.key, emission_idx) + mcols + rest, num_keys=1,
                           is_stable=True)
    key_s, e_s = sorted_[0], sorted_[1]
    cols = list(sorted_[2:4])
    if cfg.feat_carry_bf16:
        for p in sorted_[4:7]:
            x, y = unpack2bf16(p)
            cols += [x, y]
        cols.append(sorted_[7])
    else:
        cols += list(sorted_[4:])
    # Assemble the chunk-transposed (K/chunk, FEAT, chunk) layout directly:
    # each (K,) column reshapes (free) to (K/chunk, 1, chunk) and one concat
    # writes the final layout — no (K, FEAT) intermediate + transpose.
    pair_feat = jnp.concatenate(
        [c.reshape(K // chunk, 1, chunk) for c in cols]
        + [jnp.zeros((K // chunk, FEAT - NCOLS, chunk), f32)], axis=1)

    tile_starts, tile_counts = tile_ranges_from_sorted_keys(key_s, gx * gy)
    aux = EmitAux(tile_starts=tile_starts, tile_counts=tile_counts,
                  num_pairs=em.num_pairs, overflow=em.overflow,
                  emission_of_sorted=e_s,
                  emission_ids=em.emission_ids,
                  block_chunk_start=em.block_chunk_start,
                  block_chunk_count=em.block_chunk_count)
    res = (feat9.shape[0], e_s, em.emission_ids,
           em.block_chunk_start, em.block_chunk_count)
    return (pair_feat, aux), res


def _emit_bwd(width, height, cfg, res, cot):
    n_rows, e_s, emission_ids, block_c0, block_nc = res
    ct3d, _ = cot                                          # aux is int-typed
    K = cfg.pair_capacity
    chunk = cfg.chunk
    if jax.default_backend() == "tpu":
        # Permute cotangents to emission order (each gaussian's pairs
        # contiguous) by SORTING on the carried emission index — payload
        # sorts run ~3x faster than K-row random gathers on TPU. Keys are a
        # permutation (unique), so stability is moot. Cotangent columns
        # optionally ride as bf16 pairs (cfg.grad_carry_bf16).
        cols = tuple(ct3d[:, j, :].reshape(K) for j in range(NCOLS))
        payload = _pack_cols(cols, cfg.grad_carry_bf16)
        sorted_ = jax.lax.sort((e_s,) + payload, num_keys=1, is_stable=False)
        ecols = _unpack_cols(sorted_[1:], cfg.grad_carry_bf16)
        # Gaussian ids ride the spare last feature row (bitcast) so the
        # segment-sum kernel streams ONE array.
        ids_f = jax.lax.bitcast_convert_type(emission_ids, f32)
        ct_e3d = jnp.concatenate(
            [c.reshape(K // chunk, 1, chunk) for c in ecols]
            + [jnp.zeros((K // chunk, FEAT - NCOLS - 1, chunk), f32),
               ids_f.reshape(K // chunk, 1, chunk)], axis=1)
        drows = segment_sum_tpu(ct_e3d, block_c0, block_nc, n_rows, cfg)
    else:
        # CPU/interpret: one scatter-add in sorted order (ids gathered from
        # the emission-order table; invalid slots route to a dropped row).
        flat = ct3d.transpose(0, 2, 1).reshape(K, FEAT)
        ids_sorted = emission_ids[e_s]
        safe = jnp.where(ids_sorted >= 0, ids_sorted, n_rows)
        drows = jnp.zeros((n_rows, FEAT), f32).at[safe].add(
            flat, mode="drop")
    return (drows[:, :NCOLS], None, None, None)


emit_sorted_pairs.defvjp(lambda *a: _emit_fwd(*a), _emit_bwd)


def build_feat9(prep) -> jnp.ndarray:
    """(N, 9) differentiable feature rows from a Preprocessed tuple."""
    return jnp.concatenate(
        [prep.means2d, prep.conic, prep.opacity[:, None], prep.rgb], axis=1)
