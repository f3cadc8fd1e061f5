"""How many emitted pairs survive the alpha cut, and how much would the
opacity-aware ellipse-bbox rect (vs the reference's 3-sigma circle bbox)
shrink emission?"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer import preprocess as pp
from gs2mesh_tpu.ops.rasterizer.emit import (
    _build_tables, _bisect_right, build_feat9, emission_decode_pallas)
from __graft_entry__ import _scene


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=2_621_440)
    gx, gy = cfg.grid_size(W, H)
    num_tiles = gx * gy
    tb = int(num_tiles + 1).bit_length()

    prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
    feat9 = build_feat9(prep)
    ctable, _, num_pairs, _, nb128 = jax.jit(
        lambda f9: _build_tables(f9, prep.depths, prep.rect,
                                 prep.tiles_touched, cfg))(feat9)
    K = cfg.pair_capacity
    C = K // 128
    chunk0 = (jnp.arange(C, dtype=jnp.int32) * 128).astype(jnp.float32)
    r_start = _bisect_right(ctable[:, 1], chunk0) - 1
    blk = jnp.clip(jnp.maximum(r_start, 0) // 128, 0, nb128 - 1)
    cols = jax.jit(lambda ct, b, npz: emission_decode_pallas(
        ct, b, npz, W, H, cfg))(ctable, blk, num_pairs)
    key = np.asarray(cols[0])
    npairs = int(num_pairs)
    tile = key >> (32 - tb)
    alive = int(np.sum(tile[:npairs] != num_tiles))
    print(f"emitted pairs: {npairs}; alive after alpha cut: {alive} "
          f"({alive / npairs:.1%})")

    # Hypothetical ellipse-bbox rect emission count.
    p = jax.device_get(prep)
    vis = p.radius > 0
    m = p.means2d[vis]
    conic = p.conic[vis]          # [ca, cb, cc] = inverse cov (dilated)
    op = p.opacity[vis]
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    det_inv = np.maximum(ca * cc - cb * cb, 1e-12)
    # cov = inv(conic): Sxx = cc/det_inv, Syy = ca/det_inv
    Sxx = cc / det_inv
    Syy = ca / det_inv
    L2 = 2.0 * np.log(np.maximum(255.0 * op, 1.0 + 1e-6))
    ex = np.sqrt(L2 * np.maximum(Sxx, 0)) + 0.51
    ey = np.sqrt(L2 * np.maximum(Syy, 0)) + 0.51
    t = cfg.tile
    x0 = np.clip(((m[:, 0] - ex) / t).astype(np.int64), 0, gx)
    x1 = np.clip(np.floor((m[:, 0] + ex) / t).astype(np.int64) + 1, 0, gx)
    y0 = np.clip(((m[:, 1] - ey) / t).astype(np.int64), 0, gy)
    y1 = np.clip(np.floor((m[:, 1] + ey) / t).astype(np.int64) + 1, 0, gy)
    cnt = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    print(f"ellipse-bbox emission count: {int(cnt.sum())} "
          f"({int(cnt.sum()) / npairs:.1%} of current)")


if __name__ == "__main__":
    main()
