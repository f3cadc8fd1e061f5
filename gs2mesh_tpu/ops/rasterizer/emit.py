"""Fused emission → (tile, depth) sort → packed pair features.

One differentiable op replacing the binning + pair-gather pair of stages.
TPU-native redesign of the CUDA reference's duplicateWithKeys + radix sort +
identifyTileRanges + per-pair feature fetch (rasterizer_impl.cu:275-318 plus
the renderCUDA collectives that re-read per-Gaussian data, forward.cu:281-309):

  * Per-pair features are decoded in EMISSION order with a one-hot MXU
    run-length decode: emission slots touch at most 128 consecutive compacted
    gaussian rows per 128-slot chunk, so an aligned 256-row window of the
    per-run table covers a chunk, and a (window ≤ slot) step compare turns
    into an exact one-hot selector multiplied on the MXU. On TPU the whole
    decode — window DMA, step compare, one-hot matmul, alpha-cut cull, key
    build, payload packing — runs inside ONE Pallas kernel so the (K, 256)
    one-hot intermediates never touch HBM.
  * The (tile | depth-msbs) single-u32-key sort CARRIES the feature columns
    as sort payload instead of gathering them afterwards: payload movement
    through jax.lax.sort costs ~1.9 ms per column at K=2.75M on v5e while a
    K-row random gather costs ~33 ms — the sort IS the gather. Means are
    carried TILE-LOCAL (shift-invariant for all downstream math) which frees
    their low mantissa bits: the per-pair gaussian id rides inside them
    (11 + 11 bits), saving a whole payload column. Conic/opacity ride as a
    bf16 pair per u32; the rgb triple rides ONE u32 as 11/11/10-bit
    minifloats (pack_rgb). Net: one u32 key + five payload columns.
  * The backward reduces per-pair cotangents per gaussian by sorting them
    ON THE GAUSSIAN ID (recovered from the mean-mantissa bits) and running
    the one-hot MXU segment-sum over the id-sorted stream — deterministic,
    scatter-free, atomics-free (the reference uses atomicAdd,
    backward.cu:523-554). Chunks whose cotangents are exactly zero (the
    compositor's early-termination zero-fill, typically ~75% of capacity on
    saturated scenes) are COMPACTED away before the sort, so the backward
    sorts only the chunks that carry signal.

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
from gs2mesh_tpu.ops.rasterizer.tile_render import FEAT, PAD_CHUNKS

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32
HI = jax.lax.Precision.HIGHEST

NCOLS = 9   # live feature columns: x, y, conic a/b/c, opacity, r, g, b
IDMASK = 0x7FF          # 11 low mantissa bits per mean carry gaussian-id half
IDKEEP = 0xFFFFF800     # complement of IDMASK (u32-safe literal)
OSENT = float(1 << 28)  # offset sentinel for non-run table rows
DEC_S = 32              # chunks decoded per Pallas grid step (32 measured
                        # ~0.1 Mpix/s over 16 on v5e; 8 loses ~0.15)
DEC_W = 256             # decode window rows (2 aligned 128-row blocks)
NEXACT = 8  # table rows decoded f32-exact: rid, offset, x0, y0, rw, depth,
            # mx, my (ints < 2^24 + sub-pixel means). The remaining 8 rows
            # (conic, opacity, rgb, pad) only ever reach downstream math at
            # bf16 payload precision, so their one-hot decode runs as a
            # single-pass bf16 MXU matmul instead of the 6-pass f32 one.


class EmitAux(NamedTuple):
    """Non-differentiable plumbing produced alongside the pair features."""
    tile_starts: jnp.ndarray        # (T,) i32 start into the sorted pairs
    tile_counts: jnp.ndarray        # (T,) i32 per-tile pair count
    num_pairs: jnp.ndarray          # () i32 true emission count
    overflow: jnp.ndarray           # () bool — capacity exceeded
    ids_of_sorted: jnp.ndarray      # (K,) i32 gaussian id per SORTED slot


class Emission(NamedTuple):
    """Emission-order decode: everything known before the (tile,depth) sort."""
    key: jnp.ndarray          # (K,) u32 packed [tile_id | depth msbs]
    g: jnp.ndarray            # (K,) i32 real gaussian id per emission slot
    slot_valid: jnp.ndarray   # (K,) bool emission slot holds a real pair
    feat9: jnp.ndarray        # (K, 9) f32 emission-order features
                              #   (means TILE-LOCAL: mean - tile_origin)
    num_pairs: jnp.ndarray    # () i32
    overflow: jnp.ndarray     # () bool
    emission_ids: jnp.ndarray  # (K,) i32 (== g where valid, else -1)


def _bisect_right(sorted_vals: jnp.ndarray, queries: jnp.ndarray):
    """First index where sorted_vals[i] > q, per query (vectorized binary
    search: log2(n) rounds of one queries-sized gather each — XLA's
    searchsorted lowering is ~100x slower at these sizes on TPU)."""
    n = sorted_vals.shape[0]
    lo = jnp.zeros(queries.shape, i32)
    hi = jnp.full(queries.shape, n, i32)
    for _ in range(max(n, 1).bit_length()):
        mid = (lo + hi) >> 1
        v = sorted_vals[jnp.clip(mid, 0, n - 1)]
        go_right = v <= queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return hi


def _bisect_left_i32(sorted_vals: jnp.ndarray, queries: jnp.ndarray):
    """First index where sorted_vals[i] >= q (i32 arrays)."""
    n = sorted_vals.shape[0]
    lo = jnp.zeros(queries.shape, i32)
    hi = jnp.full(queries.shape, n, i32)
    for _ in range(max(n, 1).bit_length()):
        mid = (lo + hi) >> 1
        v = sorted_vals[jnp.clip(mid, 0, n - 1)]
        go_right = v < queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return hi


def _build_tables(feat9, depths, rect, tiles_touched, cfg: RasterizerConfig):
    """Shared emission front-end: per-run compacted table + slot offsets.

    Returns (ctable (ROWS, 16) f32 sentinel-padded, num_pairs, overflow,
    nrun_blocks). Table rows: [real_id, offset, x0, y0, rect_w, depth,
    mx, my, ca, cb, cc, op, r, g, b, 0]; real_id/offset stay < 2^24 so
    their f32 round-trip through the one-hot matmul is exact."""
    N = depths.shape[0]
    K = cfg.pair_capacity
    assert K < (1 << 24), "pair_capacity must fit f32-exact integers"
    assert N < (1 << 22), "gaussian count must fit the 22-bit id carry"

    feat9 = jax.lax.stop_gradient(feat9)
    depths = jax.lax.stop_gradient(depths)
    rect = jax.lax.stop_gradient(rect)
    tiles = jax.lax.stop_gradient(tiles_touched)

    if cfg.feat_carry_bf16:
        # bf16 rounding is THE semantics of packed-carry mode: conic /
        # opacity / rgb are rounded ONCE here so the alpha-cut cull, the
        # Pallas decode's single-pass bf16 MXU matmul and the payload
        # packing all see identical values on every path.
        feat9 = jnp.concatenate([
            feat9[:, :2],
            feat9[:, 2:].astype(jnp.bfloat16).astype(f32)], axis=1)

    cum = jnp.cumsum(tiles)
    num_pairs = cum[-1]
    offsets = cum - tiles                                  # (N,)
    has = (tiles > 0) & (offsets < K)

    gtable = jnp.concatenate([
        jnp.stack([
            jnp.arange(N, dtype=f32),                      # real id
            jnp.where(has, offsets.astype(f32), OSENT),
            rect[:, 0].astype(f32),
            rect[:, 1].astype(f32),
            jnp.maximum(rect[:, 2] - rect[:, 0], 1).astype(f32),
            depths,
        ], axis=1),
        feat9,
        jnp.zeros((N, 1), f32),
    ], axis=1)                                             # (N, 16)
    # Compaction: stable sort on the one-bit liveness key carries the row
    # index as payload — live rows land first in id order, dead rows (their
    # offset column already the OSENT sentinel, so the slot->run step
    # compare never counts them) sink to the tail. One small 2-column sort
    # replaces an XLA scatter that costs ~6x more at N=300k on v5e, then
    # ONE row gather moves the table (1-D column gathers are ~20x slower
    # than row gathers on TPU).
    dead = jnp.where(has, u32(0), u32(1))
    _, ridx = jax.lax.sort((dead, jnp.arange(N, dtype=i32)), num_keys=1,
                           is_stable=True)
    # (A one-padded-gather variant that folds the tail into the gather was
    # measured SLOWER on v5e — the dynamic-update-slice source de-fuses the
    # gather; the tiled-constant tail's scalar copy fully overlaps.)
    ctable = gtable[ridx]                                  # one (N,16) gather
    sent_row = jnp.zeros((1, 16), f32).at[0, 1].set(OSENT)
    nb128 = -(-N // 128) + 1                               # +1 spare block
    ctable = jnp.concatenate([
        ctable,
        jnp.tile(sent_row, (nb128 * 128 - N, 1))], axis=0)
    return ctable, offsets, num_pairs, num_pairs > K, nb128


# ---------------------------------------------------------------------------
# Pallas-fused emission decode (TPU, packed-carry mode).
# ---------------------------------------------------------------------------


def _decode_kernel(blk_ref, np_ref, ctab_hbm,
                   key_ref, mxs_ref, mys_ref, p1_ref, p2_ref, rgb_ref,
                   wbuf, dbuf, fbuf, sems,
                   *, gx: int, num_tiles: int, tb: int, tile: int,
                   nsteps: int, cfg: RasterizerConfig):
    """One grid step decodes DEC_S consecutive 128-slot emission chunks.

    Streams an aligned window of the compacted run table (transposed,
    (16, rows) — runs on the LANE axis), then per chunk: the (slot x run)
    step compare against the table's offset row, an exact one-hot run
    decode as an NT-matmul on the MXU (both operands contract their lane
    dim, so no in-kernel transpose anywhere), tile/local decode, the exact
    alpha-cut pair cull, key packing, tile-local mean conversion with the
    gaussian id stuffed into the spare mantissa bits, and bf16 payload
    packing. All (128, W)-sized intermediates stay in VMEM."""
    sc = pl.program_id(0)
    slot = jax.lax.rem(sc, 2)
    WIN = DEC_S * 128 + DEC_W

    def base(s):
        return blk_ref[s * DEC_S] * 128

    def dma_w(sl, s):
        return pltpu.make_async_copy(
            ctab_hbm.at[:, pl.ds(base(s), WIN)], wbuf.at[sl], sems.at[sl])

    @pl.when(sc == 0)
    def _():
        dma_w(0, 0).start()

    @pl.when(sc + 1 < nsteps)
    def _():
        dma_w(1 - slot, sc + 1).start()

    dma_w(slot, sc).wait()

    npairs = np_ref[0]
    # Global tile row = row_offset + local_row * row_stride (strided slice
    # ownership, see config.row_stride); y geometry below must use GLOBAL
    # rows while the sort key keeps the LOCAL tile id.
    row_off_f = np_ref[1].astype(f32)
    stride_f = f32(cfg.row_stride)
    sub = jax.lax.broadcasted_iota(i32, (128, 1), 0)
    tile_f = f32(tile)

    # Phase 1 — per-chunk one-hot decode. Only the matmuls are chunk-bound
    # (each chunk contracts against its own table window); their (8, 128)
    # outputs land in a (8, DEC_S, 128) VMEM stack so phase 2 can run the
    # whole per-slot pipeline ONCE at (DEC_S, 128) width instead of DEC_S
    # times at (1, 128) — 1/8-sublane-wide VPU ops were the kernel's
    # dominant cost, not the matmuls.
    for j in range(DEC_S):
        c = sc * DEC_S + j
        off = (blk_ref[c] - blk_ref[sc * DEC_S]) * 128
        win = wbuf[slot, :, pl.ds(off, DEC_W)]             # (16, W)
        eo = win[1:2, :]                                   # (1, W) offsets

        slot_col = (c * 128 + sub).astype(f32)             # (128, 1)
        step = (eo <= slot_col).astype(f32)                # (128, W)
        onehot = step - jnp.concatenate(
            [step[:, 1:], jnp.zeros((128, 1), f32)], axis=1)
        # NT-matmuls: contract the lane (window) dim of BOTH operands —
        # (8, W) x (128, W) -> (8, 128): features land on sublanes, slots
        # on lanes. Split by precision: the first NEXACT table rows
        # (ids/offsets/geometry) need the 6-pass exact-f32 path, the
        # feature rows are already bf16-rounded (_build_tables) so a
        # single-pass bf16 matmul decodes them exactly.
        dbuf[:, j, :] = jax.lax.dot_general(
            win[:NEXACT], onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=HI)      # (8, 128)
        fbuf[:, j, :] = jax.lax.dot_general(
            win[NEXACT:].astype(jnp.bfloat16), onehot.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                    # (8, 128)

    # Phase 2 — full-width per-slot math over all DEC_S chunks at once.
    rid = dbuf[0]                                          # (DEC_S, 128)
    offv = dbuf[1]
    x0, y0, rw = dbuf[2], dbuf[3], dbuf[4]
    depth = dbuf[5]
    mx, my = dbuf[6], dbuf[7]
    ca, cb, cc = fbuf[0], fbuf[1], fbuf[2]
    op = fbuf[3]
    r, g, b = fbuf[4], fbuf[5], fbuf[6]

    row_i = jax.lax.broadcasted_iota(i32, (DEC_S, 128), 0)
    lane_i = jax.lax.broadcasted_iota(i32, (DEC_S, 128), 1)
    slots = (sc * DEC_S + row_i) * 128 + lane_i            # global slot ids
    slot_f = slots.astype(f32)

    local = slot_f - offv                                  # f32-exact ints
    rwm = jnp.maximum(rw, 1.0)
    q = jnp.floor(local / rwm)          # exact floor: ints < 2^24, rw < 64
    txf = x0 + (local - q * rwm)
    tyf = y0 + q

    # Exact alpha-cut pair cull (see emission_core for the derivation).
    tyg = row_off_f + tyf * stride_f                       # global tile row
    x_lo = txf * tile_f - mx
    x_hi = x_lo + (tile_f - 1.0)
    y_lo = tyg * tile_f - my
    y_hi = y_lo + (tile_f - 1.0)

    def qval(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    def edge_x(dx):
        dy = jnp.clip(-cb * dx / jnp.maximum(cc, 1e-12), y_lo, y_hi)
        return qval(dx, dy)

    def edge_y(dy):
        dx = jnp.clip(-cb * dy / jnp.maximum(ca, 1e-12), x_lo, x_hi)
        return qval(dx, dy)

    inside = (x_lo <= 0) & (0 <= x_hi) & (y_lo <= 0) & (0 <= y_hi)
    qmin = jnp.minimum(jnp.minimum(edge_x(x_lo), edge_x(x_hi)),
                       jnp.minimum(edge_y(y_lo), edge_y(y_hi)))
    qmin = jnp.where(inside, 0.0, qmin)
    alive = op * jnp.exp(-qmin) >= 0.98 / 255.0

    valid = slots < npairs
    tile_id = jnp.where(
        valid & alive, (tyf * gx + txf).astype(i32), num_tiles)

    dbits = jax.lax.bitcast_convert_type(depth, u32) >> tb
    key = (tile_id.astype(u32) << (32 - tb)) | dbits

    # Tile-local means with the gaussian id riding the low mantissa bits.
    # Dead slots (beyond num_pairs) carry the 2^22-1 sentinel id exactly
    # like the XLA path, so the backward never attributes a cotangent to
    # a real gaussian even if a compositor change stopped zero-filling
    # dead-slot cotangents. (Alpha-culled pairs keep their real id; the
    # sentinel tile routes them past every render kernel.)
    idu = jnp.where(valid, rid.astype(i32).astype(u32),
                    u32((1 << 22) - 1))
    mxl = mx - txf * tile_f
    myl = my - tyg * tile_f
    ux = ((jax.lax.bitcast_convert_type(mxl, u32) & u32(IDKEEP))
          | (idu & u32(IDMASK)))
    uy = ((jax.lax.bitcast_convert_type(myl, u32) & u32(IDKEEP))
          | ((idu >> 11) & u32(IDMASK)))

    key_ref[...] = key
    mxs_ref[...] = ux
    mys_ref[...] = uy
    p1_ref[...] = pack2bf16(ca, cb)
    p2_ref[...] = pack2bf16(cc, op)
    rgb_ref[...] = pack_rgb(r, g, b)


def emission_decode_pallas(ctable, blk, num_pairs, width: int, height: int,
                           cfg: RasterizerConfig, row_offset=0):
    """TPU decode: returns (key, mxs, mys, p1, p2, rgb32) flat (K,) u32
    arrays ready to be sort payload (packed-carry layout)."""
    K = cfg.pair_capacity
    C = K // 128
    nsteps = C // DEC_S
    gx, gy = cfg.grid_size(width, height)
    num_tiles = gx * gy
    tb = int(num_tiles + 1).bit_length()

    WINPAD = DEC_S * 128 + DEC_W
    sent_col = jnp.zeros((WINPAD, 16), f32).at[:, 1].set(OSENT)
    ctab_pad = jnp.concatenate([ctable, sent_col], axis=0)  # (ROWS, 16)
    ctab_T = ctab_pad.T                                     # (16, ROWS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((DEC_S, 128), lambda s, *_: (s, 0),
                                memory_space=pltpu.VMEM)] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, 16, WINPAD), f32),
            pltpu.VMEM((NEXACT, DEC_S, 128), f32),
            pltpu.VMEM((16 - NEXACT, DEC_S, 128), f32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_decode_kernel, gx=gx, num_tiles=num_tiles, tb=tb,
                          tile=cfg.tile, nsteps=nsteps, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, 128), u32)] * 6,
        interpret=jax.default_backend() != "tpu",
    )(blk, jnp.stack([jnp.asarray(num_pairs, i32).reshape(()),
                      jnp.asarray(row_offset, i32).reshape(())]), ctab_T)
    return tuple(o.reshape(K) for o in outs)


# ---------------------------------------------------------------------------
# XLA emission decode (CPU / parity path; also the semantics reference).
# ---------------------------------------------------------------------------


def emission_core(feat9, depths, rect, tiles_touched, width: int, height: int,
                  cfg: RasterizerConfig, row_offset=0) -> Emission:
    """Emission-order slot decode + alpha-cut cull + packed sort key (XLA).

    feat9: (N, 9) per-gaussian feature rows [mx, my, ca, cb, cc, op, r, g, b]
    with GLOBAL pixel means; the returned feat9 carries TILE-LOCAL means.
    All inputs are treated as constants (stop_gradient applied here).
    `rect` rows are LOCAL tile rows; local row l is global row
    row_offset + l*cfg.row_stride (strided slice ownership) — y geometry
    uses global rows, keys/tile ids stay local.
    """
    K = cfg.pair_capacity
    gx, gy = cfg.grid_size(width, height)
    num_tiles = gx * gy

    ctable, offsets, num_pairs, overflow, nb128 = _build_tables(
        feat9, depths, rect, tiles_touched, cfg)
    slot_valid = jnp.arange(K, dtype=i32) < jnp.minimum(num_pairs, K)

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
        W = 192
        nb64 = nb128 * 2
        # Materialize the offset column ONCE: without the barrier XLA fuses
        # this strided column extraction into every bisect round's gather
        # (~5 ms at K=2.6M on v5e; ~0.05 ms from a contiguous buffer).
        eo = jax.lax.optimization_barrier(ctable[:, 1])    # (nb128*128,) f32
        chunk0 = (jnp.arange(C, dtype=i32) * 128).astype(f32)
        r_start = _bisect_right(eo, chunk0) - 1
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
        r = _bisect_right(ctable[:, 1],
                          jnp.arange(K, dtype=i32).astype(f32)) - 1
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
    tyg = (jnp.asarray(row_offset, i32) + ty * cfg.row_stride).astype(f32)
    x_lo = tx.astype(f32) * t - mx
    x_hi = x_lo + (t - 1)
    y_lo = tyg * t - my
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
    # keeps a (quantized) depth order. Quantization ties resolve to the
    # stable emission order (matching the reference's stable radix sort)
    # only when the sort is stable — cfg.sort_stable=True, or the exact
    # f32-carry mode; the shipped default (sort_stable=False) lets ties
    # resolve arbitrarily for speed (see config.py for the rationale).
    tb = int(num_tiles + 1).bit_length()                   # static
    dbits = jax.lax.bitcast_convert_type(depth_of_slot, u32) >> tb
    key = (tile_id.astype(u32) << (32 - tb)) | dbits

    emission_ids = jnp.where(slot_valid, g, -1)

    # Tile-local means: every downstream consumer (pallas + XLA compositors,
    # backward moment math) works in tile-local coordinates.
    feat9_local = jnp.concatenate([
        (mx - tx.astype(f32) * t)[:, None],
        (my - tyg * t)[:, None],
        dec[:, 8:15],
    ], axis=1)

    return Emission(key=key, g=g, slot_valid=slot_valid,
                    feat9=feat9_local, num_pairs=num_pairs,
                    overflow=overflow,
                    emission_ids=emission_ids)


def tile_ranges_from_sorted_keys(key_s, num_tiles: int):
    """Per-tile [start, start+count) over sorted keys.

    Hand-rolled bisect_left: ceil(log2(K)) rounds of one (T+1,)-sized gather
    each. jnp.searchsorted's XLA lowering costs ~4.7 ms at K=2.75M on v5e;
    this runs in the tens of microseconds."""
    tb = int(num_tiles + 1).bit_length()
    boundaries = (jnp.arange(num_tiles + 1, dtype=u32)
                  << u32(32 - tb))
    K = key_s.shape[0]
    lo = jnp.zeros((num_tiles + 1,), i32)
    hi = jnp.full((num_tiles + 1,), K, i32)
    for _ in range(max(K, 1).bit_length()):
        mid = (lo + hi) >> 1
        v = key_s[jnp.clip(mid, 0, K - 1)]
        go_right = v < boundaries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    edges = hi
    return edges[:-1], edges[1:] - edges[:-1]


# ---------------------------------------------------------------------------
# bf16 payload packing: two bf16-rounded f32 columns per u32 sort payload.
# ---------------------------------------------------------------------------


def pack2bf16(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Two f32 -> one u32 [bf16(x) | bf16(y)], round-to-nearest-even."""
    def _rne_hi16(v):
        b = jax.lax.bitcast_convert_type(v, u32)
        return (b + u32(0x7FFF) + ((b >> 16) & u32(1))) \
            & u32(0xFFFF0000)
    return _rne_hi16(x) | (_rne_hi16(y) >> 16)


def unpack2bf16(p: jnp.ndarray):
    """Inverse of pack2bf16 (each half exactly representable in f32)."""
    x = jax.lax.bitcast_convert_type(p & u32(0xFFFF0000), f32)
    y = jax.lax.bitcast_convert_type(p << 16, f32)
    return x, y


RGB_CLAMP = 3.0e4   # keeps the 5-bit minifloat exponent out of saturation


def _enc_minifloat(x: jnp.ndarray, mbits: int) -> jnp.ndarray:
    """Non-negative f32 -> (5-bit exp | mbits mantissa) code in a u32.

    RNE mantissa rounding (carry into the exponent is exact, matching IEEE);
    values below 2^-14 flush to code 0 (= 0.0) — invisible for color. The
    11/11/10-bit rgb triple this feeds keeps MORE mantissa than bf16 would
    lose anyway for r/g (6 vs 8 bits is the only delta) while fitting all
    three channels in ONE sort-payload column."""
    drop = 23 - mbits
    b = jax.lax.bitcast_convert_type(
        jnp.minimum(jnp.maximum(x, 0.0), RGB_CLAMP), u32)
    b = b + ((b >> drop) & u32(1)) + u32((1 << (drop - 1)) - 1)
    e5 = (b >> 23).astype(i32) - (127 - 15)
    m = (b >> drop) & u32((1 << mbits) - 1)
    code = (jnp.clip(e5, 0, 31).astype(u32) << mbits) | m
    return jnp.where(e5 >= 1, code, u32(0))


def _dec_minifloat(code: jnp.ndarray, mbits: int) -> jnp.ndarray:
    e5 = (code >> mbits).astype(i32)
    m = code & u32((1 << mbits) - 1)
    b = ((e5 + (127 - 15)).astype(u32) << 23) | (m << (23 - mbits))
    return jnp.where(code == 0, 0.0, jax.lax.bitcast_convert_type(b, f32))


def pack_rgb(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Three non-negative color channels -> one u32 [r11 | g11 | b10].

    Relative precision 2^-7 (r, g) / 2^-6 (b, the least perceptually
    weighted channel) vs bf16's 2^-9 — invisible in 8-bit output; frees a
    whole payload column from the (tile, depth) sort."""
    return ((_enc_minifloat(r, 6) << 21) | (_enc_minifloat(g, 6) << 10)
            | _enc_minifloat(b, 5))


def unpack_rgb(p: jnp.ndarray):
    return (_dec_minifloat((p >> 21) & u32(0x7FF), 6),
            _dec_minifloat((p >> 10) & u32(0x7FF), 6),
            _dec_minifloat(p & u32(0x3FF), 5))


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


def stuff_ids(mxl: jnp.ndarray, myl: jnp.ndarray, ids: jnp.ndarray):
    """Ride the 22-bit gaussian id in the low mantissa bits of the two
    tile-local mean columns (11 bits each). Tile-local means are bounded by
    the emission rect (~3 sigma + tile), so the <= 2^-12 relative
    perturbation stays proportional to the splat's own scale."""
    idu = ids.astype(u32)
    ux = ((jax.lax.bitcast_convert_type(mxl, u32) & u32(IDKEEP))
          | (idu & u32(IDMASK)))
    uy = ((jax.lax.bitcast_convert_type(myl, u32) & u32(IDKEEP))
          | ((idu >> 11) & u32(IDMASK)))
    return ux, uy


def unstuff_ids(ux: jnp.ndarray, uy: jnp.ndarray):
    mxl = jax.lax.bitcast_convert_type(ux, f32)
    myl = jax.lax.bitcast_convert_type(uy, f32)
    ids = ((ux & u32(IDMASK))
           | ((uy & u32(IDMASK)) << 11)).astype(i32)
    return mxl, myl, ids


# ---------------------------------------------------------------------------
# Per-gaussian cotangent reduction (the backward of the feature carry).
# ---------------------------------------------------------------------------

SPAN = 16  # chunks fetched per DMA (covers a typical block in one span)
GW = 512   # gaussians per reduction block (measured optimum on v5e:
           # 256 and 1024 both lose ~0.4 Mpix/s): wide blocks cut the number of
           # DMA chains / block overheads 4x vs 128-wide blocks (the extra
           # one-hot width is nearly free on the MXU at bf16)
NBB = 2    # gaussian blocks reduced per grid step (cross-block prefetch
           # pipelining; VMEM holds NBB+1 span buffers)
IDCOL = FEAT - 1  # gaussian ids ride the spare last feature column
                  # (bitcast i32) so each span needs ONE DMA stream


def _segsum_kernel(c0_ref, nc_ref, ct_hbm, out_ref,
                   ctbuf, sems, *, chunk: int, nb_total: int,
                   bf16_mm: bool):
    """Per-GW-Gaussian-block segmented sum via one-hot matmuls.

    NBB blocks per grid step. Block b's id-sorted cotangent chunks stream
    through slot b % (NBB+1); its FIRST span is prefetched while the
    PREVIOUS block computes (cross-block pipelining — consecutive blocks use
    distinct slots so the prefetch never collides), and the rare extra spans
    (nc > SPAN) reload the same slot inline. Every issued DMA is waited
    exactly once (empty blocks still wait their prefetched span). Boundary
    chunks shared between adjacent blocks are visited by both; the one-hot
    comparison against the block's own gaussian ids (riding feature row
    IDCOL) keeps the contributions disjoint. The span loop is a STATIC
    unroll (SPAN per-chunk compare+matmul pairs gated by a scalar limit) —
    no dynamic-trip fori overhead on the hot path."""
    s = pl.program_id(0)
    nslots = NBB + 1

    def dma(b, si):
        slot = jax.lax.rem(b, nslots)
        return pltpu.make_async_copy(
            ct_hbm.at[pl.ds(c0_ref[b] + si * SPAN, SPAN)], ctbuf.at[slot],
            sems.at[slot])

    @pl.when(s == 0)
    def _():
        dma(0, 0).start()

    for bi in range(NBB):
        b = s * NBB + bi
        slot = jax.lax.rem(b, nslots)
        nc = nc_ref[b]
        g0 = b * GW
        gcol = g0 + jax.lax.broadcasted_iota(i32, (1, GW), 1)

        # Prefetch the NEXT block's first span before this block's compute.
        @pl.when(b + 1 < nb_total)
        def _():
            dma(b + 1, 0).start()

        dma(b, 0).wait()

        def span_sum(lim, acc, slot=slot, gcol=gcol):
            """Statically-unrolled reduction of one span: chunks j < lim."""
            for j in range(SPAN):
                ids = jax.lax.bitcast_convert_type(
                    ctbuf[slot, j, IDCOL:IDCOL + 1, :], i32)  # (1, chunk)
                hit = (ids.T == gcol) & (j < lim)             # (pair, gauss)
                if bf16_mm:
                    # grad_carry_bf16 mode: every cotangent column already
                    # rode the id sort bf16-rounded, so bf16 matmul operands
                    # are LOSSLESS for them (one-hot 0/1 exact; bf16
                    # products exact in the f32 accumulator): single MXU
                    # pass instead of the 6-pass exact-f32 path. The
                    # bitcast-id row flushes to zero as a bf16 denormal —
                    # its output column is junk either way (sliced off by
                    # the caller).
                    acc = acc + jax.lax.dot_general(
                        hit.astype(jnp.bfloat16),
                        ctbuf[slot, j].astype(jnp.bfloat16),
                        (((0,), (1,)), ((), ())),
                        preferred_element_type=f32)           # (gauss, FEAT)
                else:
                    acc = acc + jax.lax.dot_general(
                        hit.astype(f32), ctbuf[slot, j],
                        (((0,), (1,)), ((), ())),
                        preferred_element_type=f32, precision=HI)
            return acc

        acc = span_sum(nc, jnp.zeros((GW, FEAT), f32))

        # Rare tail: blocks spanning more than SPAN chunks reload inline.
        nspans = (nc + SPAN - 1) // SPAN

        def extra(si, acc, b=b, nc=nc, slot=slot, gcol=gcol):
            d = dma(b, si)
            d.start()
            d.wait()
            return span_sum(nc - si * SPAN, acc, slot=slot, gcol=gcol)

        acc = jax.lax.fori_loop(1, nspans, extra, acc)
        out_ref[bi] = acc


def segment_sum_tpu(ct3d, block_c0, block_nc, n_rows: int,
                    cfg: RasterizerConfig):
    """(KC, FEAT, chunk) id-sorted cotangents (gaussian ids bitcast into row
    IDCOL) -> (n_rows, FEAT). block_c0/block_nc are the per-GW-gaussian-block
    chunk ranges in the id-sorted stream."""
    chunk = cfg.chunk
    NB = block_c0.shape[0]
    NBp = -(-NB // NBB) * NBB
    if NBp > NB:          # pad to a whole number of grid steps (nc=0 blocks)
        pad = NBp - NB
        block_c0 = jnp.concatenate([block_c0, jnp.zeros((pad,), i32)])
        block_nc = jnp.concatenate([block_nc, jnp.zeros((pad,), i32)])
    # Tail-pad so a SPAN-sized DMA starting at the last chunk stays in
    # bounds (masked out of the matmuls by the per-chunk limit gate).
    ct3d = jnp.concatenate(
        [ct3d, jnp.zeros((SPAN, FEAT, chunk), f32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NBp // NBB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((NBB, GW, FEAT), lambda s, *_: (s, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((NBB + 1, SPAN, FEAT, chunk), f32),
            pltpu.SemaphoreType.DMA((NBB + 1,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, chunk=chunk, nb_total=NBp,
                          bf16_mm=cfg.grad_carry_bf16),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NBp, GW, FEAT), f32)],
        interpret=jax.default_backend() != "tpu",
    )(block_c0, block_nc, ct3d)[0]
    out = out.reshape(NBp * GW, FEAT)
    drows = jnp.zeros((n_rows, FEAT), f32)
    take = min(NBp * GW, n_rows)
    return drows.at[:take].set(out[:take])


# ---------------------------------------------------------------------------
# Fused differentiable op.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def emit_sorted_pairs(feat9, depths, rect, tiles_touched,
                      width: int, height: int, cfg: RasterizerConfig,
                      row_offset=0):
    """feat9 (N, 9) per-gaussian features -> ((K/chunk, FEAT, chunk) sorted
    pair features with TILE-LOCAL means, EmitAux). Differentiable w.r.t.
    feat9 only. `row_offset` (with cfg.row_stride) maps local tile rows to
    global rows for strided slice ownership (sharded_train.py)."""
    out, _ = _emit_fwd(feat9, depths, rect, tiles_touched, width, height,
                       cfg, row_offset)
    return out


def _use_pallas_decode(cfg: RasterizerConfig) -> bool:
    return ((jax.default_backend() == "tpu" or cfg.force_pallas)
            and cfg.feat_carry_bf16
            and cfg.chunk == 128
            and cfg.pair_capacity % (128 * DEC_S) == 0)


def _emit_fwd(feat9, depths, rect, tiles_touched, width, height, cfg,
              row_offset=0):
    K = cfg.pair_capacity
    chunk = cfg.chunk
    gx, gy = cfg.grid_size(width, height)
    num_tiles = gx * gy
    stable = cfg.sort_stable or not cfg.feat_carry_bf16

    if _use_pallas_decode(cfg):
        ctable, _, num_pairs, overflow, nb128 = _build_tables(
            jax.lax.stop_gradient(feat9), jax.lax.stop_gradient(depths),
            jax.lax.stop_gradient(rect),
            jax.lax.stop_gradient(tiles_touched), cfg)
        C = K // 128
        # Per-chunk table-block index WITHOUT a bisect (the 19-round binary
        # search cost ~2.7 ms at C=20480 on v5e — 1-D gathers price every
        # round). Identity: with m = #(offsets <= 128c), the block index
        # max(m-1, 0)//128 equals #{j >= 1 : eo[128j] <= 128c} (a group's
        # start offset being covered is exactly the block count ticking up),
        # so scatter each group start's first covered chunk (+1) and
        # prefix-sum over chunks — one tiny scatter + one cumsum.
        eo = jax.lax.optimization_barrier(ctable[:, 1])
        gstart = eo[128::128]                       # starts of groups 1..
        cmin = jnp.clip(jnp.ceil(gstart * (1.0 / 128.0)).astype(i32), 0, C)
        delta = jnp.zeros((C + 1,), i32).at[cmin].add(1, mode="drop")
        blk = jnp.clip(jnp.cumsum(delta[:C]), 0, nb128 - 1)
        key, mxs, mys, p1, p2, rgb32 = emission_decode_pallas(
            ctable, blk, num_pairs, width, height, cfg, row_offset)
        payload = (mxs, mys, p1, p2, rgb32)
    else:
        em = emission_core(feat9, depths, rect, tiles_touched, width, height,
                           cfg, row_offset)
        key, num_pairs, overflow = em.key, em.num_pairs, em.overflow
        ids = jnp.where(em.slot_valid, em.g, (1 << 22) - 1)
        if cfg.feat_carry_bf16:
            mxs, mys = stuff_ids(em.feat9[:, 0], em.feat9[:, 1], ids)
            payload = (mxs, mys,
                       pack2bf16(em.feat9[:, 2], em.feat9[:, 3]),
                       pack2bf16(em.feat9[:, 4], em.feat9[:, 5]),
                       pack_rgb(em.feat9[:, 6], em.feat9[:, 7],
                                em.feat9[:, 8]))
        else:
            payload = tuple(em.feat9[:, i] for i in range(NCOLS)) + (ids,)

    sorted_ = jax.lax.sort((key,) + payload, num_keys=1, is_stable=stable)
    key_s = sorted_[0]
    if cfg.feat_carry_bf16:
        mxl, myl, ids_sorted = unstuff_ids(sorted_[1], sorted_[2])
        cols = [mxl, myl]
        for p in sorted_[3:5]:
            x, y = unpack2bf16(p)
            cols += [x, y]
        cols.extend(unpack_rgb(sorted_[5]))
    else:
        cols = list(sorted_[1:NCOLS + 1])
        ids_sorted = sorted_[NCOLS + 1]
    # Assemble the chunk-transposed (K/chunk, FEAT, chunk) layout directly:
    # each (K,) column reshapes (free) to (K/chunk, 1, chunk) and one concat
    # writes the final layout — no (K, FEAT) intermediate + transpose.
    # Span-DMA overrun pad (render kernels index up to one span past a
    # tile's last chunk) is folded PER COLUMN before the feature concat:
    # the per-column zero tails fuse into the unpack elementwise chain, so
    # the padded (KC+PAD, FEAT, chunk) layout materializes exactly once (a
    # trailing axis-0 concat costs a second full copy of the array).
    KCP = K // chunk + PAD_CHUNKS
    zpad = jnp.zeros((PAD_CHUNKS * chunk,), f32)
    pair_feat = jnp.concatenate(
        [jnp.concatenate([c, zpad]).reshape(KCP, 1, chunk) for c in cols]
        + [jnp.zeros((KCP, FEAT - NCOLS, chunk), f32)], axis=1)

    tile_starts, tile_counts = tile_ranges_from_sorted_keys(key_s, num_tiles)
    ids_sorted = ids_sorted.astype(i32)
    aux = EmitAux(tile_starts=tile_starts, tile_counts=tile_counts,
                  num_pairs=num_pairs, overflow=overflow,
                  ids_of_sorted=ids_sorted)
    res = (feat9.shape[0], ids_sorted)
    return (pair_feat, aux), res


def _reduce_sorted_cts(ct3d, ids2d, n_rows: int, cfg: RasterizerConfig):
    """Sort (gaussian-id, cotangent columns) and segment-sum per gaussian.

    ct3d: (NCH, FEAT, chunk) cotangents; ids2d: (NCH, chunk) gaussian ids
    (sentinel >= n_rows for dead slots). Returns (n_rows, FEAT)."""
    chunk = cfg.chunk
    NCH = ct3d.shape[0]
    Kc = NCH * chunk
    cols = tuple(ct3d[:, j, :].reshape(Kc) for j in range(NCOLS))
    payload = _pack_cols(cols, cfg.grad_carry_bf16)
    # Unstable: the per-gaussian segment SUM is order-invariant up to f32
    # reassociation, and TPU lax.sort is deterministic either way.
    sorted_ = jax.lax.sort((ids2d.reshape(Kc),) + payload, num_keys=1,
                           is_stable=False)
    ids_s = sorted_[0]
    ecols = _unpack_cols(sorted_[1:], cfg.grad_carry_bf16)
    # Per-GW-gaussian-block chunk ranges in the id-sorted stream.
    nb = -(-n_rows // GW)
    bounds = jnp.arange(nb + 1, dtype=i32) * GW
    edges = _bisect_left_i32(ids_s, bounds)                # (nb+1,)
    start, end = edges[:-1], edges[1:]
    block_c0 = start // chunk
    block_nc = jnp.where(end > start, (end - 1) // chunk - block_c0 + 1, 0)
    ids_f = jax.lax.bitcast_convert_type(ids_s, f32)
    ct_s3d = jnp.concatenate(
        [c.reshape(NCH, 1, chunk) for c in ecols]
        + [jnp.zeros((NCH, FEAT - NCOLS - 1, chunk), f32),
           ids_f.reshape(NCH, 1, chunk)], axis=1)
    return segment_sum_tpu(ct_s3d, block_c0, block_nc, n_rows, cfg)


def reduce_compact_cts(dpairs, n_written, n_rows: int,
                       cfg: RasterizerConfig, force_sort_path: bool = False):
    """Per-gaussian reduction of a KERNEL-COMPACTED cotangent stream.

    dpairs: (KC, FEAT, chunk) from pallas_kernels.bwd_call_compact — chunks
    [0, n_written) are live (rows 0..8 cotangents, row IDCOL the bitcast
    per-pair gaussian ids), chunks beyond are garbage. Masks the garbage
    (sentinel ids + zero payload: stale bits can be NaN patterns, and a
    0*NaN inside the one-hot segment matmul would poison the sum), then
    runs the id-sort + MXU segment sum. The fast path sorts only the
    ``bwd_compact_frac`` prefix; the (never-hit-in-practice) overflow path
    falls back to the full-size sort."""
    KC = dpairs.shape[0]
    chunk = cfg.chunk

    if jax.default_backend() != "tpu" and not force_sort_path:
        # CPU/interpret: exact scatter-add keyed on the carried ids (same
        # as _emit_bwd's off-TPU path — no bf16 cotangent carry).
        live = jnp.arange(KC, dtype=i32) < n_written
        ids2d = jax.lax.bitcast_convert_type(dpairs[:, FEAT - 1, :], i32)
        ids = jnp.where(live[:, None], ids2d, n_rows).reshape(-1)
        safe = jnp.where((ids >= 0) & (ids < n_rows), ids, n_rows)
        flat = dpairs.transpose(0, 2, 1).reshape(KC * chunk, FEAT)
        flat = jnp.where(live[:, None].repeat(chunk, 1).reshape(-1, 1),
                         flat, 0.0)
        return jnp.zeros((n_rows, FEAT), f32).at[safe].add(flat, mode="drop")

    cap = min(KC, max(256, int(KC * cfg.bwd_compact_frac)))

    def reduce_prefix(ct):
        S = ct.shape[0]
        live = jnp.arange(S, dtype=i32) < n_written
        ids2d = jax.lax.bitcast_convert_type(ct[:, FEAT - 1, :], i32)
        ids2d = jnp.where(live[:, None], ids2d, (1 << 22) - 1)
        ct = jnp.where(live[:, None, None], ct, 0.0)
        return _reduce_sorted_cts(ct, ids2d, n_rows, cfg)

    if cap >= KC:
        return reduce_prefix(dpairs)
    return jax.lax.cond(
        n_written <= cap,
        lambda _: reduce_prefix(dpairs[:cap]),
        lambda _: reduce_prefix(dpairs),
        None)


def _emit_bwd_tpu(ct3d, ids_sorted, n_rows: int, cfg: RasterizerConfig):
    """TPU cotangent reduction: zero-chunk compaction -> id sort -> MXU
    segment sum. Returns (n_rows, FEAT). Also runs under interpret mode on
    CPU for testing."""
    chunk = cfg.chunk
    KC = ct3d.shape[0]
    ids2d = ids_sorted.reshape(KC, chunk)
    # Compact away all-zero cotangent chunks (the compositor's
    # early-termination zero-fill leaves most of capacity exactly zero
    # on saturated scenes) before paying for the id sort. Capacity is
    # a static fraction; when the live count exceeds it, fall back to
    # the full-size reduction (never drops gradient signal).
    cap = min(KC, max(256, int(KC * cfg.bwd_compact_frac)))
    if cap >= KC:
        return _reduce_sorted_cts(ct3d, ids2d, n_rows, cfg)
    # Rows NCOLS..FEAT-1 are structurally zero in every cotangent the
    # render backward emits, so the liveness reduce reads 9/16 of the bytes.
    nz = jnp.max(jnp.abs(ct3d[:, :NCOLS]), axis=(1, 2)) > 0.0   # (KC,)
    nv = jnp.sum(nz.astype(i32))
    pos = jnp.cumsum(nz.astype(i32)) - 1
    # Visited-chunk index list; unfilled tail points at the appended
    # zero chunk (ids sentinel) so padding contributes nothing.
    perm = jnp.full((cap,), KC, i32).at[
        jnp.where(nz, pos, cap)].set(jnp.arange(KC, dtype=i32),
                                     mode="drop")
    ct3d_x = jnp.concatenate(
        [ct3d, jnp.zeros((1, FEAT, chunk), f32)], axis=0)
    ids2d_x = jnp.concatenate(
        [ids2d, jnp.full((1, chunk), (1 << 22) - 1, i32)], axis=0)

    def compact_path(_):
        return _reduce_sorted_cts(ct3d_x[perm], ids2d_x[perm],
                                  n_rows, cfg)

    def full_path(_):
        return _reduce_sorted_cts(ct3d, ids2d, n_rows, cfg)

    return jax.lax.cond(nv <= cap, compact_path, full_path, None)


def _emit_bwd(width, height, cfg, res, cot):
    n_rows, ids_sorted = res
    ct3d, _ = cot                                          # aux is int-typed
    K = cfg.pair_capacity
    ct3d = ct3d[:K // cfg.chunk]       # drop the span-DMA overrun pad
    if jax.default_backend() == "tpu":
        drows = _emit_bwd_tpu(ct3d, ids_sorted, n_rows, cfg)
    else:
        # CPU/interpret: one scatter-add keyed directly on the sorted ids.
        flat = ct3d.transpose(0, 2, 1).reshape(K, FEAT)
        safe = jnp.where((ids_sorted >= 0) & (ids_sorted < n_rows),
                         ids_sorted, n_rows)
        drows = jnp.zeros((n_rows, FEAT), f32).at[safe].add(
            flat, mode="drop")
    return (drows[:, :NCOLS], None, None, None, None)


emit_sorted_pairs.defvjp(lambda *a: _emit_fwd(*a), _emit_bwd)


def build_feat9(prep) -> jnp.ndarray:
    """(N, 9) differentiable feature rows from a Preprocessed tuple."""
    return jnp.concatenate(
        [prep.means2d, prep.conic, prep.opacity[:, None], prep.rgb], axis=1)
