"""Measure actual early-termination behavior of the render kernels."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer import preprocess as pp
from gs2mesh_tpu.ops.rasterizer.emit import build_feat9, emit_sorted_pairs
from gs2mesh_tpu.ops.rasterizer.pallas_kernels import (
    render_tiles_pallas, _bwd_call)
from __graft_entry__ import _scene


def timeit(name, f, *a, n=5):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return o


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=2_752_512)
    gx, gy = cfg.grid_size(W, H)
    chunk = cfg.chunk

    feat, aux = jax.jit(lambda *a: emit_sorted_pairs(
        build_feat9(pp.preprocess(*a, cam, 0, cfg=cfg)),
        pp.preprocess(*a, cam, 0, cfg=cfg).depths,
        pp.preprocess(*a, cam, 0, cfg=cfg).rect,
        pp.preprocess(*a, cam, 0, cfg=cfg).tiles_touched, W, H, cfg))(*args)
    jax.block_until_ready(feat)
    starts, counts = aux.tile_starts, aux.tile_counts

    # Max possible chunk visits
    lo, hi = starts, starts + counts
    c0 = lo // chunk
    nch = jnp.where(hi > lo, (hi - 1) // chunk - c0 + 1, 0)
    print(f"max chunk visits: {int(jnp.sum(nch))}")

    # Run bwd once to harvest ndone (actual visited chunks per tile).
    col, fT = jax.jit(lambda f, s, c: render_tiles_pallas(
        f, s, c, gx, gy, cfg))(feat, starts, counts)
    dC = jnp.ones_like(col)
    dTf = jnp.zeros_like(fT)
    _, ndone = jax.jit(lambda *a: _bwd_call(*a, gx, gy, cfg))(
        feat, starts, counts, col, fT, dC, dTf)
    print(f"actual visited chunks (bwd ndone): {int(jnp.sum(ndone))}")

    # fwd with early exit disabled
    cfg_noee = dataclasses.replace(cfg, transmittance_eps=0.0)
    timeit("render fwd (early exit ON)",
           jax.jit(lambda f, s, c: render_tiles_pallas(f, s, c, gx, gy, cfg)),
           feat, starts, counts)
    timeit("render fwd (early exit OFF)",
           jax.jit(lambda f, s, c: render_tiles_pallas(
               f, s, c, gx, gy, cfg_noee)), feat, starts, counts)

    def loss(f, s, c, cc):
        col, t = render_tiles_pallas(f, s, c, gx, gy, cc)
        return jnp.sum(col) + jnp.sum(t)

    timeit("render fwd+bwd (early exit ON)",
           jax.jit(lambda f, s, c: jax.grad(
               lambda ff: loss(ff, s, c, cfg))(f)), feat, starts, counts)
    timeit("render fwd+bwd (early exit OFF)",
           jax.jit(lambda f, s, c: jax.grad(
               lambda ff: loss(ff, s, c, cfg_noee))(f)), feat, starts, counts)


if __name__ == "__main__":
    main()
