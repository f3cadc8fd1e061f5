"""Pallas TPU kernels for tile compositing (forward + hand-derived backward).

TPU-native re-design of the CUDA renderCUDA fwd/bwd pair
(cuda_rasterizer/forward.cu:261-374, backward.cu:399-557). Key differences
from the CUDA structure — chosen for the TPU execution model, not translated:

  * One grid step per 32x32 image tile; the tile's depth-sorted Gaussian
    pairs are DMA-streamed from HBM through VMEM in chunks of 128 (the
    VMEM-resident analog of the CUDA shared-memory staging loop).
  * Front-to-back alpha compositing is reformulated as MXU matmuls: the
    exclusive cumulative product of (1-alpha) along the chunk becomes a
    triangular-matrix matmul in log space, per-Gaussian compositing weights
    multiply into the color accumulator with a second matmul, and the
    early-termination "done" flag is a triangular cumulative-OR. No
    sequential per-Gaussian loop, no data-dependent branches.
  * The backward pass replays the forward *in forward order* using the
    identity  suffix(g) = total - inclusive_prefix(g)  (the CUDA version
    walks back-to-front with an accum_rec recurrence) and reduces per-pair
    gradients with moment sums — atomics-free and fully deterministic.
  * Saturation semantics are bit-matched to the reference: alpha clamp 0.99,
    alpha < 1/255 skip, power > 0 skip, and the T < 1e-4 stop that excludes
    the triggering Gaussian. Like the reference backward, gradients do NOT
    gate on the 0.99 clamp (backward.cu:500-505 differentiates op*G).

Pair ranges are chunk-aligned by binning.bin_gaussians, so every DMA is a
full (128, FEAT) block and per-pair gradient writes never straddle tiles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.tile_render import FEAT

f32 = jnp.float32


def _pixel_coords(t, gx: int, tile: int, P: int):
    """(1, P) pixel-center coordinates for flat pixel p = y*tile + x."""
    tx = (t % gx).astype(f32)
    ty = (t // gx).astype(f32)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = tx * tile + (p & (tile - 1)).astype(f32)
    py = ty * tile + (p >> 5 if tile == 32 else p // tile).astype(f32)
    return px, py


def _triangles(chunk: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri_excl = (r > c).astype(f32)   # strictly-lower: exclusive prefix
    tri_incl = (r >= c).astype(f32)  # lower+diag: inclusive prefix
    return tri_excl, tri_incl


def _chunk_alpha(f, px, py, cfg: RasterizerConfig):
    """Per-chunk alpha computation shared by fwd and bwd replay.

    f: (chunk, FEAT) feature rows (transposed in-kernel from the (FEAT, K)
    HBM layout). Returns dict of (chunk, P)/(chunk, 1) intermediates."""
    gxs, gys = f[:, 0:1], f[:, 1:2]
    ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]
    op = f[:, 5:6]
    dx = gxs - px                                  # (chunk, P)
    dy = gys - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(op * G, cfg.alpha_clamp)
    passes = (power <= 0.0) & (alpha >= cfg.alpha_min)
    alpha_eff = jnp.where(passes, alpha, 0.0)
    return dict(gxs=gxs, gys=gys, ca=ca, cb=cb, cc=cc, op=op,
                G=G, alpha_eff=alpha_eff, rgb=f[:, 6:9])


def _forward_kernel(starts_ref, counts_ref, pairs_hbm,
                    color_ref, finalT_ref,
                    chunk_vmem, sem,
                    *, gx: int, cfg: RasterizerConfig):
    tile, chunk = cfg.tile, cfg.chunk
    P = cfg.pixels_per_tile
    t = pl.program_id(0)
    start = starts_ref[t]
    nchunks = counts_ref[t] // chunk

    px, py = _pixel_coords(t, gx, tile, P)
    tri_excl, tri_incl = _triangles(chunk)

    color_ref[0] = jnp.zeros((3, P), f32)

    def body(i, carry):
        T_pix, done = carry                              # (1, P) each
        dma = pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(pl.multiple_of(start + i * chunk, chunk), chunk)], chunk_vmem, sem)
        dma.start()
        dma.wait()
        v = _chunk_alpha(chunk_vmem[:].T, px, py, cfg)
        alpha_eff = v["alpha_eff"]

        l1m = jnp.log1p(-alpha_eff)
        cum_excl = jax.lax.dot_general(
            tri_excl, l1m, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        T_g = T_pix * jnp.exp(cum_excl)
        test_T = T_g * (1.0 - alpha_eff)
        bad = jnp.where((alpha_eff > 0.0) & (test_T < cfg.transmittance_eps),
                        1.0, 0.0)
        done_cum = jax.lax.dot_general(
            tri_incl, bad, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        m = jnp.where(done + done_cum > 0.0, 0.0, 1.0)   # accepted mask
        w = alpha_eff * m * T_g                          # (chunk, P)

        color_ref[0] += jax.lax.dot_general(
            v["rgb"], w, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)                  # (3, P)

        T_new = T_pix * jnp.exp(jnp.sum(l1m * m, axis=0, keepdims=True))
        done_new = jnp.maximum(
            done, jnp.where(jnp.sum(bad, axis=0, keepdims=True) > 0.0, 1.0, 0.0))
        return T_new, done_new

    T_fin, _ = jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.ones((1, P), f32), jnp.zeros((1, P), f32)))
    finalT_ref[0] = T_fin


def _backward_kernel(starts_ref, counts_ref, pairs_hbm,
                     color_in_ref, finalT_ref, dC_ref, dTf_ref,
                     dpairs_hbm,
                     chunk_vmem, gchunk_vmem, sem_in, sem_out,
                     *, gx: int, cfg: RasterizerConfig):
    tile, chunk = cfg.tile, cfg.chunk
    P = cfg.pixels_per_tile
    t = pl.program_id(0)
    start = starts_ref[t]
    nchunks = counts_ref[t] // chunk

    px, py = _pixel_coords(t, gx, tile, P)
    tri_excl, tri_incl = _triangles(chunk)

    dC = dC_ref[0]                                       # (3, P)
    T_fin = finalT_ref[0]                                # (1, P)
    dTf = dTf_ref[0]                                     # (1, P)
    # U_total per pixel = sum_ch C_pre_bg[ch] * dC[ch]  (1, P)
    U_tot = jnp.sum(color_in_ref[0] * dC, axis=0, keepdims=True)
    dTfT = dTf * T_fin                                   # (1, P)

    def body(i, carry):
        T_pix, done, U_run = carry
        dma = pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(pl.multiple_of(start + i * chunk, chunk), chunk)], chunk_vmem, sem_in)
        dma.start()
        dma.wait()
        v = _chunk_alpha(chunk_vmem[:].T, px, py, cfg)
        alpha_eff = v["alpha_eff"]
        G, op = v["G"], v["op"]

        l1m = jnp.log1p(-alpha_eff)
        cum_excl = jax.lax.dot_general(
            tri_excl, l1m, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        T_g = T_pix * jnp.exp(cum_excl)
        test_T = T_g * (1.0 - alpha_eff)
        bad = jnp.where((alpha_eff > 0.0) & (test_T < cfg.transmittance_eps),
                        1.0, 0.0)
        done_cum = jax.lax.dot_general(
            tri_incl, bad, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        m = jnp.where(done + done_cum > 0.0, 0.0, 1.0)
        w = alpha_eff * m * T_g

        # u = c_g . dC per (gaussian, pixel)
        u = jax.lax.dot_general(
            v["rgb"], dC, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)                  # (chunk, P)
        uw = u * w
        U_incl = U_run + jax.lax.dot_general(
            tri_incl, uw, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        S = U_tot - U_incl

        acc = m * jnp.where(alpha_eff > 0.0, 1.0, 0.0)
        inv1m = 1.0 / (1.0 - alpha_eff)
        dalpha = acc * (u * T_g - (S + dTfT) * inv1m)

        dpower = op * dalpha * G                         # (chunk, P)
        # Moment reductions over pixels (lane reductions).
        def rs(x):
            return jnp.sum(x, axis=1, keepdims=True)     # (chunk, 1)
        M0 = rs(dpower)
        Mx = rs(dpower * px)
        My = rs(dpower * py)
        Mxx = rs(dpower * px * px)
        Mxy = rs(dpower * px * py)
        Myy = rs(dpower * py * py)
        gxs, gys = v["gxs"], v["gys"]
        Sdx2 = gxs * gxs * M0 - 2.0 * gxs * Mx + Mxx     # sum dpower*dx^2
        Sdxy = gxs * gys * M0 - gxs * My - gys * Mx + Mxy
        Sdy2 = gys * gys * M0 - 2.0 * gys * My + Myy
        Sdx = gxs * M0 - Mx
        Sdy = gys * M0 - My

        d_ca = -0.5 * Sdx2
        d_cb = -Sdxy
        d_cc = -0.5 * Sdy2
        d_gx = -(v["ca"] * Sdx + v["cb"] * Sdy)
        d_gy = -(v["cc"] * Sdy + v["cb"] * Sdx)
        d_op = rs(G * dalpha)
        d_rgb = jax.lax.dot_general(
            w, dC, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)                  # (chunk, 3)

        g = jnp.concatenate(
            [d_gx, d_gy, d_ca, d_cb, d_cc, d_op, d_rgb,
             jnp.zeros((chunk, FEAT - 9), f32)], axis=1)  # (chunk, FEAT)
        gchunk_vmem[:] = g.T                              # (FEAT, chunk)
        out_dma = pltpu.make_async_copy(
            gchunk_vmem, dpairs_hbm.at[:, pl.ds(pl.multiple_of(start + i * chunk, chunk), chunk)],
            sem_out)
        out_dma.start()
        out_dma.wait()

        T_new = T_pix * jnp.exp(jnp.sum(l1m * m, axis=0, keepdims=True))
        done_new = jnp.maximum(
            done, jnp.where(jnp.sum(bad, axis=0, keepdims=True) > 0.0, 1.0, 0.0))
        U_new = U_run + jnp.sum(uw, axis=0, keepdims=True)
        return T_new, done_new, U_new

    jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.ones((1, P), f32), jnp.zeros((1, P), f32), jnp.zeros((1, P), f32)))


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
            pltpu.VMEM((FEAT, cfg.chunk), f32),
            pltpu.SemaphoreType.DMA(()),
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
    K = pair_feat.shape[1]
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
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((FEAT, cfg.chunk), f32),
            pltpu.VMEM((FEAT, cfg.chunk), f32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dpairs = pl.pallas_call(
        functools.partial(_backward_kernel, gx=gx, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((FEAT, K), f32)],
        interpret=_interpret(),
    )(tile_starts, tile_counts, pair_feat, color,
      finalT[:, None, :], dC, dTf[:, None, :])[0]
    return dpairs


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
    dpairs = _bwd_call(pair_feat, tile_starts, tile_counts, color, finalT,
                       dC, dTf, gx, gy, cfg)
    # Zero rows the kernel never visited (slots past the last padded range).
    total = tile_starts[-1] + tile_counts[-1]
    valid = jnp.arange(pair_feat.shape[1], dtype=jnp.int32) < total
    dpairs = jnp.where(valid[None, :], dpairs, 0.0)
    return dpairs, None, None


render_tiles_pallas.defvjp(_vjp_fwd, _vjp_bwd)
