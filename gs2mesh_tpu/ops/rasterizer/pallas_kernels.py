"""Pallas TPU kernels for tile compositing (forward + hand-derived backward).

TPU-native re-design of the CUDA renderCUDA fwd/bwd pair
(cuda_rasterizer/forward.cu:261-374, backward.cu:399-557). Key differences
from the CUDA structure — chosen for the TPU execution model, not translated:

  * One grid step per 32x32 image tile; the tile's depth-sorted Gaussian
    pairs are DMA-streamed from HBM through VMEM in double-buffered chunks of
    128 (the VMEM analog of the CUDA shared-memory staging loop, with the
    next chunk's DMA overlapping the current chunk's math).
  * Front-to-back alpha compositing is vectorized across the whole chunk:
    the cumulative log-transmittance along the chunk is a log-depth
    shift-add scan on the VPU, per-Gaussian compositing weights multiply
    into the color accumulator with an MXU matmul, and the early-termination
    "done" flag is a cumulative-count scan. No sequential per-Gaussian loop,
    no data-dependent branches.
  * The backward pass replays the forward *in forward order* using the
    identity  suffix(g) = total - inclusive_prefix(g)  (the CUDA version
    walks back-to-front with an accum_rec recurrence) and reduces per-pair
    gradients with closed-form moment sums — atomics-free and fully
    deterministic.
  * Saturation semantics match the reference: alpha clamp 0.99, alpha <
    1/255 skip, power > 0 skip, and the T < 1e-4 stop that excludes the
    triggering Gaussian. Like the reference backward, gradients do NOT gate
    on the 0.99 clamp (backward.cu:500-505 differentiates op*G).

Pair data is the chunk-transposed (K/chunk, FEAT, chunk) layout produced by
emit.emit_sorted_pairs (means TILE-LOCAL), so every DMA is a lane-aligned
(FEAT, chunk) block and per-pair gradient writes never straddle tiles.
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
NC_G = 9   # gradient-carrying feature rows (x, y, conic a/b/c, op, rgb)


def _mm_prec(carry_bf16: bool):
    """MXU precision for kernel matmuls, tied to the payload-carry mode.

    Packed-carry mode already limits the operands to bf16 information
    content (emit rounds features / cotangents to ride the sort), so a
    single-pass bf16 MXU matmul adds noise of the same order the carry
    already accepts - while the exact-carry mode (golden parity, hwchecks)
    keeps the 6-pass exact-f32 path. Mosaic lowers only DEFAULT / HIGHEST.
    """
    return None if carry_bf16 else HI


def _pixel_coords(tile: int, P: int):
    """(1, P) TILE-LOCAL pixel coordinates for flat pixel p = y*tile + x.

    All kernel math runs in tile-local coordinates (the pair features carry
    TILE-LOCAL means, produced by emit): dx/dy and every moment expression
    are shift-invariant, and local coords keep the math well-conditioned
    (global px up to ~1e3 would amplify f32 cancellation ~1e4x)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (p & (tile - 1)).astype(f32)
    py = (p >> 5 if tile == 32 else p // tile).astype(f32)
    return px, py


def _incl_scan(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Inclusive prefix-sum along axis 0 via log-depth shift-adds (VPU).

    ~5x cheaper than the equivalent triangular-matrix matmul at f32-HIGHEST
    precision for chunk=128 (measured on v5e)."""
    s = 1
    while s < chunk:
        x = x + jnp.concatenate(
            [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0)
        s *= 2
    return x


def _incl_prod(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Inclusive prefix-product along axis 0 (same shift-op scan, with *)."""
    s = 1
    while s < chunk:
        x = x * jnp.concatenate(
            [jnp.ones((s, x.shape[1]), x.dtype), x[:-s]], axis=0)
        s *= 2
    return x


def _power_basis(px, py, P: int):
    """(6, P) monomial basis [1, x, y, x^2, xy, y^2] over tile-local pixel
    coordinates, shared by the forward quadratic-form matmul and the
    backward moment matmul."""
    return jnp.concatenate(
        [jnp.ones((1, P), f32), px, py, px * px, px * py, py * py], axis=0)


def _chunk_alpha(f, px, py, thresh_row, cfg: RasterizerConfig):
    """Per-chunk alpha computation shared by fwd and bwd replay.

    f: (chunk, FEAT) feature rows (transposed in-kernel from the chunk
    layout, means TILE-LOCAL as produced by emit); (px, py): (1, P)
    tile-local pixel coordinates; thresh_row: (chunk, 1) alpha acceptance
    threshold — alpha_min for rows inside this tile's exact
    [start, start+count) pair range, +inf for rows owned by neighboring
    tiles (boundary chunks are shared), so the range mask and the
    reference's `alpha < 1/255` skip collapse into ONE compare. Returns
    dict of (chunk, P)/(chunk, 1) intermediates.

    Runs on the VPU in tile-local coordinates (dx/dy are shift-invariant;
    an MXU monomial expansion was tried and is SLOWER — a K=6 contraction
    at f32-HIGHEST underutilizes the 128-wide systolic array).

    The reference also skips on power > 0 (forward.cu:339-345); that branch
    is unreachable here: conic is the inverse of the dilated 2D covariance
    (PSD with det > 0 enforced by preprocess), so the quadratic form is
    non-negative and power <= 0 up to float rounding (exp(+1e-7) ~ 1 is
    absorbed by the 0.99 clamp). Dropping the test saves two full-size ops.
    """
    gxs, gys = f[:, 0:1], f[:, 1:2]                # tile-local centers
    ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]
    op = f[:, 5:6]
    ca2, cc2 = -0.5 * ca, -0.5 * cc                # (chunk, 1): free
    dx = gxs - px                                  # (chunk, P)
    dy = gys - py
    # 9-op factored quadratic: ca2*dx^2 + dy*(cc2*dy - cb*dx)
    power = ca2 * (dx * dx) + dy * (cc2 * dy - cb * dx)
    alpha_raw = op * jnp.exp(power)
    alpha_eff = jnp.where(alpha_raw >= thresh_row,
                          jnp.minimum(alpha_raw, cfg.alpha_clamp), 0.0)
    return dict(gxs=gxs, gys=gys, ca=ca, cb=cb, cc=cc, op=op,
                alpha_raw=alpha_raw, alpha_eff=alpha_eff, rgb=f[:, 6:9])


def _composite_core(v, T_pix, done, cfg: RasterizerConfig, chunk: int):
    """Shared fwd/replay compositing math. Returns dict of intermediates.

    Transmittance runs as a direct multiplicative prefix scan (no log/exp
    round-trip). The inclusive product s_g = T_pix * prod_{g'<=g}(1-a_g') is
    monotone non-increasing along the chunk, so the CUDA early-stop semantics
    (backward.cu / forward.cu:347-351: a pixel freezes at the first Gaussian
    whose post-composite T drops below eps, with that Gaussian excluded)
    reduce to a single threshold test on s — no second scan needed:
      acc_g  = (not done) & (s_g >= eps)
      T_new  = T_pix * min_g( acc_g ? q_g : 1 )
      done'  = done | (s_last < eps)
    (T_pix factors out of the min; q <= 1 makes the 1-fillers neutral, and
    done pixels see all-1 fillers so T_new == T_pix.) s only crosses eps at
    an accepted Gaussian, so this matches the accept-gated recurrence of
    the reference exactly. Everything accept-shaped stays a bool mask +
    select (never a 0/1 float multiply chain) — 3 fewer full-size VPU ops
    per chunk than the mask-arithmetic form."""
    alpha_eff = v["alpha_eff"]
    eps = cfg.transmittance_eps
    q = _incl_prod(1.0 - alpha_eff, chunk)                  # inclusive prod
    s = T_pix * q
    T_g = jnp.concatenate([T_pix, s[:-1]], axis=0)          # exclusive
    acc = (done <= 0.0) & (s >= eps)                        # (chunk, P) bool
    w = jnp.where(acc, alpha_eff * T_g, 0.0)
    T_new = T_pix * jnp.min(jnp.where(acc, q, 1.0), axis=0, keepdims=True)
    done_new = jnp.maximum(
        done, jnp.where(s[-1:] < eps, 1.0, 0.0))
    return dict(T_g=T_g, w=w, T_new=T_new, done_new=done_new, acc=acc)


# SPAN must never exceed tile_render.PAD_CHUNKS (emit bakes that many zero
# chunks after the last pair chunk for span-DMA overrun).
# Early exit quantizes to one span, so a tile wastes (SPAN/2 - 0.5) chunks
# of full-width math on average past its true exit point. The heavier
# backward prefers exact granularity (SPAN=1); the cheaper forward's
# per-span overhead outweighs its smaller waste at SPAN=1 (both measured
# on v5e on the bench scene). Neither may exceed tile_render.PAD_CHUNKS.
SPAN_FWD = 2
SPAN_BWD = 1


def _forward_kernel(starts_ref, counts_ref, pairs_hbm,
                    color_ref, finalT_ref,
                    bufs, sems,
                    *, gx: int, cfg: RasterizerConfig):
    tile, chunk = cfg.tile, cfg.chunk
    P = cfg.pixels_per_tile
    t = pl.program_id(0)
    lo = starts_ref[t]
    hi = lo + counts_ref[t]
    c0 = lo // chunk
    nchunks = jnp.where(hi > lo, (hi - 1) // chunk - c0 + 1, 0)
    nspans = (nchunks + SPAN_FWD - 1) // SPAN_FWD

    px, py = _pixel_coords(tile, P)
    color_ref[0] = jnp.zeros((3, P), f32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def dma(slot, si):
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(c0 + si * SPAN_FWD, SPAN_FWD)], bufs.at[slot],
            sems.at[slot])

    # Span-0 DMA protocol: every nonempty tile's first span is prefetched by
    # the PREVIOUS grid step (cross-tile pipelining hides the first-DMA
    # latency, which otherwise sits on the critical path of every tile
    # because early exit keeps per-tile span counts low). Tile 0 has no
    # predecessor and issues its own.
    @pl.when((t == 0) & (nspans > 0))
    def _():
        dma(0, 0).start()

    # Early termination, the TPU analog of the CUDA per-pixel T<eps exit
    # (forward.cu:347-351): stop streaming once every pixel in the tile is
    # saturated — all later chunks contribute exactly zero. Exit granularity
    # is one SPAN_FWD of chunks.
    def cond(state):
        si, T_pix, done = state
        return (si < nspans) & (jnp.min(done) < 0.5)

    def body(state):
        si, T_pix, done = state
        slot = jax.lax.rem(si, 2)

        @pl.when(si + 1 < nspans)
        def _():
            dma(1 - slot, si + 1).start()

        dma(slot, si).wait()
        acc = jnp.zeros((3, P), f32)
        for j in range(SPAN_FWD):
            i = si * SPAN_FWD + j
            rowid = (c0 + i) * chunk + row_iota
            thresh = jnp.where((rowid >= lo) & (rowid < hi),
                               cfg.alpha_min, jnp.inf)
            v = _chunk_alpha(bufs[slot, j].T, px, py, thresh, cfg)
            c = _composite_core(v, T_pix, done, cfg, chunk)
            acc = acc + jax.lax.dot_general(
                v["rgb"], c["w"], (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=_mm_prec(cfg.feat_carry_bf16))    # (3, P)
            T_pix, done = c["T_new"], c["done_new"]
        color_ref[0] += acc
        return si + 1, T_pix, done

    s_end, T_fin, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.ones((1, P), f32), jnp.zeros((1, P), f32)))
    finalT_ref[0] = T_fin

    # Drain the prefetch issued for the span after the early exit.
    @pl.when(s_end < nspans)
    def _():
        dma(jax.lax.rem(s_end, 2), s_end).wait()

    # Prefetch the NEXT tile's first span (see span-0 protocol above).
    @pl.when(t + 1 < pl.num_programs(0))
    def _():
        lo_n = starts_ref[jnp.minimum(t + 1, pl.num_programs(0) - 1)]
        cnt_n = counts_ref[jnp.minimum(t + 1, pl.num_programs(0) - 1)]

        @pl.when(cnt_n > 0)
        def _():
            pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(lo_n // chunk, SPAN_FWD)], bufs.at[0],
                sems.at[0]).start()


def _backward_kernel(starts_ref, counts_ref, pairs_hbm,
                     color_in_ref, finalT_ref, dC_ref, dTf_ref,
                     dpairs_hbm, ndone_ref,
                     bufs, gbufs, rbuf, sems, gsems, rsem,
                     *, gx: int, cfg: RasterizerConfig,
                     compact: bool = False, cnt_ref=None, nw_ref=None):
    """Replay-backward over one tile's chunk stream.

    Two write layouts:
      * compact=False — per-chunk gradients land at their SORTED positions
        (c0 + i); the VJP zero-fills skipped chunks using ndone_ref.
      * compact=True — gradients are APPENDED contiguously from slot 0 via
        an SMEM running counter that persists across the sequential grid
        (cnt_ref = [ctr, last_written_global_chunk]); each written chunk
        carries its per-pair gaussian ids (recovered from the mean-mantissa
        carry, emit.stuff_ids) bitcast into feature row IDCOL_G, so the
        downstream per-gaussian reduction needs NO liveness scan, NO
        permutation gather and NO zero-fill — the compacted stream IS the
        reduction input (emit.reduce_compact_cts). A tile whose first chunk
        is shared with the previously-appended chunk read-adds and
        overwrites slot ctr-1 instead of appending a duplicate (duplicates
        would double-count in the segment sum). Requires the packed bf16
        feature carry (ids embedded in the means).
    """
    tile, chunk = cfg.tile, cfg.chunk
    P = cfg.pixels_per_tile
    t = pl.program_id(0)
    lo = starts_ref[t]
    hi = lo + counts_ref[t]
    c0 = lo // chunk
    nchunks = jnp.where(hi > lo, (hi - 1) // chunk - c0 + 1, 0)
    nspans = (nchunks + SPAN_BWD - 1) // SPAN_BWD
    # Spans [0, full_spans) write back as one SPAN_BWD-chunk DMA; the tail span
    # (if any) writes per-chunk so the next tile's chunks are never touched.
    full_spans = nchunks // SPAN_BWD

    if compact:
        @pl.when(t == 0)
        def _():
            cnt_ref[0] = 0                     # next append slot
            cnt_ref[1] = -1                    # last written global chunk
        ctr = cnt_ref[0]
        last_chunk = cnt_ref[1]
        # Shared first chunk: the previous nonempty tile's LAST written chunk
        # is this tile's first chunk (ranges are disjoint ascending, so this
        # is exactly the lo % chunk != 0 boundary case unless that tile
        # early-exited before reaching it — then its contribution is zero
        # and a fresh append is correct).
        shared = (jax.lax.rem(lo, chunk) != 0) & (last_chunk == c0)
        base_slot = jnp.where(shared, ctr - 1, ctr)
    else:
        shared = jax.lax.rem(lo, chunk) != 0
        base_slot = c0

    px, py = _pixel_coords(tile, P)
    # (6, P) monomial basis for the backward moment matmul, CENTERED at the
    # tile center and NORMALIZED by tile/2 (see the moment-cancellation
    # note in chunk_grads; both constants are exact powers of two).
    basis = _power_basis((px - f32((tile - 1) / 2)) * f32(2.0 / tile),
                         (py - f32((tile - 1) / 2)) * f32(2.0 / tile), P)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    # Boundary-chunk accumulator: a tile whose range starts mid-chunk shares
    # its first chunk with the previous tile(s); the sequential TPU grid
    # guarantees their writeback finished, so we read-add instead of
    # overwriting. rbuf is zeroed so unshared chunks add exact zeros.
    rbuf[...] = jnp.zeros((FEAT, chunk), f32)

    dC = dC_ref[0]                                       # (3, P)
    T_fin = finalT_ref[0]                                # (1, P)
    dTf = dTf_ref[0]                                     # (1, P)
    # U_total per pixel = sum_ch C_pre_bg[ch] * dC[ch], with the final-T
    # cotangent term dTf*T_fin folded in once here (it only ever appears as
    # S + dTf*T_fin in dalpha — folding saves a (chunk, P) add per chunk).
    U_tot = (jnp.sum(color_in_ref[0] * dC, axis=0, keepdims=True)
             + dTf * T_fin)

    def dma_in(slot, si):
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(c0 + si * SPAN_BWD, SPAN_BWD)], bufs.at[slot],
            sems.at[slot])

    def dma_out_span(slot, si):
        return pltpu.make_async_copy(
            gbufs.at[slot],
            dpairs_hbm.at[pl.ds(base_slot + si * SPAN_BWD, SPAN_BWD)],
            gsems.at[slot])

    def dma_out_chunk(slot, j, ci):
        return pltpu.make_async_copy(gbufs.at[slot, j],
                                     dpairs_hbm.at[base_slot + ci],
                                     gsems.at[slot])

    # Span-0 protocol: prefetched by the previous grid step (see forward).
    @pl.when((t == 0) & (nspans > 0))
    def _():
        dma_in(0, 0).start()

    # Mirrors the forward's early exit: gradients of chunks past the
    # all-pixels-done point are exactly zero (w == 0, dalpha == 0), so they
    # are skipped; the VJP wrapper zero-fills them using ndone_ref.
    def cond(state):
        si, T_pix, done, U_run = state
        return (si < nspans) & (jnp.min(done) < 0.5)

    def dma_acc():
        return pltpu.make_async_copy(dpairs_hbm.at[base_slot], rbuf, rsem)

    def chunk_grads(i, T_pix, done, U_run, feat):
        """Per-chunk gradient math; feat: (FEAT, chunk)."""
        rowid = (c0 + i) * chunk + row_iota
        thresh = jnp.where((rowid >= lo) & (rowid < hi),
                           cfg.alpha_min, jnp.inf)
        v = _chunk_alpha(feat.T, px, py, thresh, cfg)
        alpha_eff = v["alpha_eff"]
        alpha_raw, op = v["alpha_raw"], v["op"]
        c = _composite_core(v, T_pix, done, cfg, chunk)
        T_g, w = c["T_g"], c["w"]

        # u = c_g . dC per (gaussian, pixel). Packed mode keeps DEFAULT
        # precision: the (chunk, P)-sized output makes the 6-pass exact
        # path ~2 ms/frame, and u's rounding enters dalpha RELATIVELY
        # (no cancellation chain — unlike the moment matmul below).
        u = jax.lax.dot_general(
            v["rgb"], dC, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=_mm_prec(cfg.grad_carry_bf16))     # (chunk, P)
        uw = u * w
        if cfg.grad_carry_bf16:
            # The suffix S_g = sum_{g'>g} uw is what dalpha needs; compute
            # it as  (future-chunk remainder, exact f32 differences)
            #      + (within-chunk STRICT-UPPER-triangular bf16 MXU matmul)
            # replacing the 7-step VPU shift-add scan (the scans were 14 of
            # ~45 wide ops per chunk). The triangular matmul must produce
            # the SUFFIX, not the prefix: S = U_tot - prefix would subtract
            # two large accumulations whose bf16-term error dwarfs the
            # small late-gaussian suffixes; the direct suffix keeps the
            # bf16 noise RELATIVE to each suffix's own magnitude — the same
            # order the packed cotangent carry already accepts. Exact-carry
            # mode (parity/golden) keeps the VPU scan.
            csum = jnp.sum(uw, axis=0, keepdims=True)    # (1, P) f32
            ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            triu = (ci > ri).astype(jnp.bfloat16)        # strict upper
            suffix = jax.lax.dot_general(
                triu, uw.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=f32)              # (chunk, P)
            S = (U_tot - U_run - csum) + suffix
            U_new = U_run + csum
        else:
            U_incl = U_run + _incl_scan(uw, chunk)
            S = U_tot - U_incl
            U_new = U_incl[-1:]

        # The reference gates dalpha on acceptance AND alpha > threshold;
        # alpha_eff == 0 rows contribute dalpha * alpha_raw == dpower == 0
        # through the w == 0 weight anyway, so the composite accept mask
        # (reused, not recomputed) is the only gate needed... except that
        # alpha-rejected rows have w == 0 but acc true; their dalpha would
        # be nonzero noise flowing into dpower. Gate on w > 0 exactly as
        # before but as a single fused select.
        inv1m = 1.0 / (1.0 - alpha_eff)
        dalpha = jnp.where(w > 0.0, u * T_g - S * inv1m, 0.0)

        dpower = dalpha * alpha_raw                      # = op * dalpha * G

        # All six pixel-moment reductions at once as a single (chunk,P)@(P,6)
        # MXU matmul against the per-tile monomial basis — replaces six VPU
        # lane reductions. Gives the closed-form conic/mean gradients without
        # materializing dx/dy products twice.
        # The conic/mean gradients below are DIFFERENCES of these moments
        # (gxs'^2*M0 - 2*gxs'*Mx + Mxx, ...). Over the RAW tile-local basis
        # the cancelling terms sit up to ~10^3 apart, so the packed mode's
        # one-pass matmul put ~25% p99 noise on the scale/rotation grads
        # (measured on v5e vs the packed XLA fallback; a 6-pass exact
        # matmul fixes it but costs ~3 ms/frame — Mosaic pads the 6-wide
        # output to 128 lanes). Instead the basis is CENTERED at the tile
        # center and NORMALIZED by tile/2 (exact powers of two), bounding
        # the monomials by ~1 and the centered means by ~3: the cancelling
        # terms shrink ~200x, putting the one-pass rounding back below the
        # carry noise. The s/s^2 rescale constants fold into the S* terms.
        # Rejected alternatives (all measured on v5e, bench scene): 6-pass
        # HIGHEST +3.3 ms (Mosaic pads the 6-wide output to 128 lanes), a
        # 2-pass hi/lo operand split +1.8 ms — both drop the bench below
        # the 12 Mpix/s bar. Exact-carry mode (grad_carry_bf16=False) runs
        # HIGHEST for reference-grade gradients.
        M = jax.lax.dot_general(
            dpower, basis, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=_mm_prec(cfg.grad_carry_bf16))     # (chunk, 6)
        M0, Mx, My = M[:, 0:1], M[:, 1:2], M[:, 2:3]
        Mxx, Mxy, Myy = M[:, 3:4], M[:, 4:5], M[:, 5:6]
        bs = f32(cfg.tile / 2)
        bc = f32((cfg.tile - 1) / 2)
        gxs = (v["gxs"] - bc) * (1.0 / bs)               # normalized centers
        gys = (v["gys"] - bc) * (1.0 / bs)
        Sdx2 = (bs * bs) * (gxs * gxs * M0 - 2.0 * gxs * Mx + Mxx)
        Sdxy = (bs * bs) * (gxs * gys * M0 - gxs * My - gys * Mx + Mxy)
        Sdy2 = (bs * bs) * (gys * gys * M0 - 2.0 * gys * My + Myy)
        Sdx = bs * (gxs * M0 - Mx)
        Sdy = bs * (gys * M0 - My)

        d_gx = -(v["ca"] * Sdx + v["cb"] * Sdy)
        d_gy = -(v["cc"] * Sdy + v["cb"] * Sdx)
        d_ca = -0.5 * Sdx2
        d_cb = -Sdxy
        d_cc = -0.5 * Sdy2
        # d_op = sum_p G*dalpha = M0 / op (op > 0 for real rows; padding rows
        # have dpower == 0 so the guarded division stays exactly zero).
        d_op = M0 / jnp.maximum(op, 1e-30)
        d_rgb = jax.lax.dot_general(
            w, dC, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=_mm_prec(cfg.grad_carry_bf16))     # (chunk, 3)

        if compact:
            # Per-pair gaussian ids recovered from the mean-mantissa carry
            # (emit.stuff_ids) ride the last feature row as BITCAST f32:
            # pure data movement only — any arithmetic would flush the
            # denormal bit patterns to zero on the VPU.
            fu0 = jax.lax.bitcast_convert_type(v["gxs"], jnp.uint32)
            fu1 = jax.lax.bitcast_convert_type(v["gys"], jnp.uint32)
            ids = ((fu0 & jnp.uint32(0x7FF))
                   | ((fu1 & jnp.uint32(0x7FF)) << 11))
            idrow = jax.lax.bitcast_convert_type(ids, f32)  # (chunk, 1)
            g = jnp.concatenate(
                [d_gx, d_gy, d_ca, d_cb, d_cc, d_op, d_rgb,
                 jnp.zeros((chunk, FEAT - 10), f32), idrow],
                axis=1)                                   # (chunk, FEAT)
        else:
            g = jnp.concatenate(
                [d_gx, d_gy, d_ca, d_cb, d_cc, d_op, d_rgb,
                 jnp.zeros((chunk, FEAT - 9), f32)], axis=1)
        return g.T, c["T_new"], c["done_new"], U_new

    def body(state):
        si, T_pix, done, U_run = state
        slot = jax.lax.rem(si, 2)
        first_shared = (si == 0) & shared

        @pl.when(first_shared)
        def _():
            dma_acc().start()

        @pl.when(si + 1 < nspans)
        def _():
            dma_in(1 - slot, si + 1).start()

        dma_in(slot, si).wait()

        # Wait for this slot's previous writeback (span si-2) before reuse.
        # A tail span can only ever be the LAST span, so si-2 is always a
        # full span here.
        @pl.when(si >= 2)
        def _():
            dma_out_span(slot, si - 2).wait()

        gs = []
        for j in range(SPAN_BWD):
            gT, T_pix, done, U_run = chunk_grads(
                si * SPAN_BWD + j, T_pix, done, U_run, bufs[slot, j])
            gs.append(gT)

        @pl.when(first_shared)
        def _():
            dma_acc().wait()

        flag = jnp.where(first_shared, 1.0, 0.0)
        if compact:
            # Read-add rows 0..8 only; the id row is copied verbatim (the
            # previously-appended chunk carries the SAME ids).
            g0 = gs[0]
            gbufs[slot, 0] = jnp.concatenate(
                [g0[:NC_G] + rbuf[:NC_G] * flag, g0[NC_G:]], axis=0)
        else:
            gbufs[slot, 0] = gs[0] + rbuf[...] * flag    # (FEAT, chunk)
        for j in range(1, SPAN_BWD):
            gbufs[slot, j] = gs[j]

        @pl.when(si < full_spans)
        def _():
            dma_out_span(slot, si).start()

        @pl.when(si >= full_spans)
        def _():
            # Tail span: chunk-granular writes, waited immediately (the
            # tail is the last span, so this stalls nothing downstream).
            for j in range(SPAN_BWD):
                @pl.when(si * SPAN_BWD + j < nchunks)
                def _():
                    d = dma_out_chunk(slot, j, si * SPAN_BWD + j)
                    d.start()
                    d.wait()

        return si + 1, T_pix, done, U_run

    s_end, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.ones((1, P), f32), jnp.zeros((1, P), f32),
         jnp.zeros((1, P), f32)))
    ndone = jnp.minimum(s_end * SPAN_BWD, nchunks)
    ndone_ref[t] = ndone

    # Drain the input prefetch issued past the early exit.
    @pl.when(s_end < nspans)
    def _():
        dma_in(jax.lax.rem(s_end, 2), s_end).wait()

    # Drain outstanding span writebacks (the tail span waits inline).
    @pl.when((s_end >= 2) & (s_end - 2 < full_spans))
    def _():
        dma_out_span(jax.lax.rem(s_end, 2), s_end - 2).wait()

    @pl.when((s_end >= 1) & (s_end - 1 < full_spans))
    def _():
        dma_out_span(jax.lax.rem(s_end - 1, 2), s_end - 1).wait()

    if compact:
        # Append-state update: skipped chunks are simply never appended
        # (no zero-fill anywhere); a following tile sharing the last chunk
        # appends fresh when this tile early-exited before reaching it
        # (its contribution is exactly zero).
        @pl.when(nchunks > 0)
        def _():
            cnt_ref[0] = base_slot + ndone
            cnt_ref[1] = c0 + ndone - 1
        nw_ref[0] = cnt_ref[0]
    else:
        # Early exit skipped chunks [ndone, nchunks). The VJP zero-fills
        # the wholly-owned ones, but the LAST chunk may be shared with
        # (read-added by) the next tiles, so it must hold zeros — write
        # them now that all slot DMAs are drained.
        @pl.when((ndone < nchunks) & (nchunks > 0))
        def _():
            gbufs[0, 0] = jnp.zeros((FEAT, chunk), f32)
            zw = dma_out_chunk(0, 0, nchunks - 1)
            zw.start()
            zw.wait()

    # Prefetch the NEXT tile's first input span (span-0 protocol).
    @pl.when(t + 1 < pl.num_programs(0))
    def _():
        lo_n = starts_ref[jnp.minimum(t + 1, pl.num_programs(0) - 1)]
        cnt_n = counts_ref[jnp.minimum(t + 1, pl.num_programs(0) - 1)]

        @pl.when(cnt_n > 0)
        def _():
            pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(lo_n // chunk, SPAN_BWD)], bufs.at[0],
                sems.at[0]).start()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"




def _fwd_call(pair_feat, tile_starts, tile_counts, gx: int, gy: int,
              cfg: RasterizerConfig):
    num_tiles = gx * gy
    P = cfg.pixels_per_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SPAN_FWD, FEAT, cfg.chunk), f32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, finalT = pl.pallas_call(
        functools.partial(_forward_kernel, gx=gx, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, P), f32),
            jax.ShapeDtypeStruct((num_tiles, 1, P), f32),
        ],
        interpret=_interpret(),
    )(tile_starts, tile_counts, pair_feat)
    return color, finalT[:, 0, :]


def _bwd_call(pair_feat, tile_starts, tile_counts, color, finalT, dC, dTf,
              gx: int, gy: int, cfg: RasterizerConfig):
    num_tiles = gx * gy
    P = cfg.pixels_per_tile
    KC = pair_feat.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 3, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            # Whole-array SMEM output: the sequential TPU grid lets each
            # tile's step write its own slot.
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SPAN_BWD, FEAT, cfg.chunk), f32),
            pltpu.VMEM((2, SPAN_BWD, FEAT, cfg.chunk), f32),
            pltpu.VMEM((FEAT, cfg.chunk), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dpairs, ndone = pl.pallas_call(
        functools.partial(_backward_kernel, gx=gx, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((KC, FEAT, cfg.chunk), f32),
                   jax.ShapeDtypeStruct((num_tiles,), jnp.int32)],
        interpret=_interpret(),
    )(tile_starts, tile_counts, pair_feat, color,
      finalT[:, None, :], dC, dTf[:, None, :])
    return dpairs, ndone


def _backward_kernel_compact(starts_ref, counts_ref, pairs_hbm, color_in_ref,
                             finalT_ref, dC_ref, dTf_ref,
                             dpairs_hbm, ndone_ref, nw_ref,
                             bufs, gbufs, rbuf, sems, gsems, rsem, cnt_ref,
                             *, gx: int, cfg: RasterizerConfig):
    _backward_kernel(starts_ref, counts_ref, pairs_hbm, color_in_ref,
                     finalT_ref, dC_ref, dTf_ref, dpairs_hbm, ndone_ref,
                     bufs, gbufs, rbuf, sems, gsems, rsem,
                     gx=gx, cfg=cfg, compact=True, cnt_ref=cnt_ref,
                     nw_ref=nw_ref)


def bwd_call_compact(pair_feat, tile_starts, tile_counts, color, finalT,
                     dC, dTf, gx: int, gy: int, cfg: RasterizerConfig):
    """Compacted-append backward: gradients of the ~25% computed chunks land
    contiguously from slot 0, each chunk carrying its gaussian ids in row
    FEAT-1. Returns (dpairs (K/chunk, FEAT, chunk) — live prefix
    [0, n_written), garbage beyond — and n_written ()). Consumed by
    emit.reduce_compact_cts; kills the liveness reduce + permutation gather
    + VJP zero-fill of the positional layout."""
    num_tiles = gx * gy
    P = cfg.pixels_per_tile
    KC = cfg.pair_capacity // cfg.chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 3, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SPAN_BWD, FEAT, cfg.chunk), f32),
            pltpu.VMEM((2, SPAN_BWD, FEAT, cfg.chunk), f32),
            pltpu.VMEM((FEAT, cfg.chunk), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    dpairs, _, nw = pl.pallas_call(
        functools.partial(_backward_kernel_compact, gx=gx, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((KC, FEAT, cfg.chunk), f32),
                   jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        interpret=_interpret(),
    )(tile_starts, tile_counts, pair_feat, color,
      finalT[:, None, :], dC, dTf[:, None, :])
    return dpairs, nw[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def render_tiles_pallas(pair_feat, tile_starts, tile_counts,
                        gx: int, gy: int, cfg: RasterizerConfig):
    """Pallas tile renderer. Returns (color (T,3,P) pre-background,
    final_T (T,P)). Differentiable w.r.t. pair_feat."""
    return _fwd_call(pair_feat, tile_starts, tile_counts, gx, gy, cfg)


def _vjp_fwd(pair_feat, tile_starts, tile_counts, gx, gy, cfg):
    color, finalT = _fwd_call(pair_feat, tile_starts, tile_counts, gx, gy, cfg)
    return (color, finalT), (pair_feat, tile_starts, tile_counts, color, finalT)


def _vjp_bwd(gx, gy, cfg, res, cot):
    pair_feat, tile_starts, tile_counts, color, finalT = res
    dC, dTf = cot
    dpairs, ndone = _bwd_call(pair_feat, tile_starts, tile_counts, color,
                              finalT, dC, dTf, gx, gy, cfg)
    # Zero chunks the kernel never wrote. Per-tile computed chunks are the
    # contiguous range [lo_c, lo_c + ndone) plus — when the tile exited
    # early — its last chunk, which the kernel zero-wrote because following
    # tiles read-add into it. Build the membership mask with +1/-1 boundary
    # scatters and a cumsum (no per-chunk gather needed).
    KC = pair_feat.shape[0]
    chunk = cfg.chunk
    lo_c = tile_starts // chunk
    nonempty = tile_counts > 0
    c_last = jnp.where(nonempty, (tile_starts + tile_counts - 1) // chunk, 0)
    nch = jnp.where(nonempty, c_last - lo_c + 1, 0)
    one = jnp.where(nonempty, 1, 0)
    delta = jnp.zeros((KC + 1,), jnp.int32)
    delta = delta.at[jnp.where(nonempty, lo_c, KC)].add(one)
    delta = delta.at[jnp.where(nonempty, jnp.minimum(lo_c + ndone, KC), KC)
                     ].add(-one)
    extra = nonempty & (ndone < nch)
    xone = jnp.where(extra, 1, 0)
    delta = delta.at[jnp.where(extra, c_last, KC)].add(xone)
    delta = delta.at[jnp.where(extra, jnp.minimum(c_last + 1, KC), KC)
                     ].add(-xone)
    computed = jnp.cumsum(delta[:-1]) > 0
    dpairs = jnp.where(computed[:, None, None], dpairs, 0.0)
    return dpairs, None, None


render_tiles_pallas.defvjp(_vjp_fwd, _vjp_bwd)
