"""One-shot chip probe: alpha-cull rate + early-exit stats on the bench scene.

Decides the chunk-aligned-tile-ranges trade (PERF_NOTES lever 2): alignment
keeps culled pairs in-tile (op=0, depth=+inf) so per-tile counts become the
analytically-computable PRE-cull counts; the cost is that tiles that never
saturate stream the culled+padding tail. This prints both sides of that trade
from the real kernels' own outputs (bwd ndone = chunks actually visited).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _scene
from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.preprocess import preprocess
from gs2mesh_tpu.ops.rasterizer.emit import build_feat9, _emit_fwd
from gs2mesh_tpu.ops.rasterizer import pallas_kernels as pk


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=2_621_440)
    gx, gy = cfg.grid_size(W, H)
    T = gx * gy

    @jax.jit
    def run(margs):
        means, scales, rots, opac, shs = margs
        prep = preprocess(means, scales, rots, opac, shs, cam, 0, cfg, 1.0)
        (pair_feat, aux), _ = _emit_fwd(
            build_feat9(prep), prep.depths, prep.rect, prep.tiles_touched,
            W, H, cfg, 0)
        color, finalT = pk._fwd_call(pair_feat, aux.tile_starts,
                                     aux.tile_counts, gx, gy, cfg)
        dC = jnp.ones_like(color)
        dTf = jnp.zeros_like(finalT)
        _, ndone = pk._bwd_call(pair_feat, aux.tile_starts, aux.tile_counts,
                                color, finalT, dC, dTf, gx, gy, cfg)
        # Pre-cull per-tile histogram via one exact bf16 MXU matmul over the
        # rect indicator columns (counts < 2^24 exact in the f32 accumulator).
        tiles = prep.tiles_touched
        cum = jnp.cumsum(tiles)
        offsets = cum - tiles
        has = (tiles > 0) & (offsets < cfg.pair_capacity)
        rect = prep.rect
        tx = jnp.arange(gx, dtype=jnp.int32)[None, :]
        ty = jnp.arange(gy, dtype=jnp.int32)[None, :]
        A = ((rect[:, 0:1] <= tx) & (tx < rect[:, 2:3])
             & has[:, None]).astype(jnp.bfloat16)           # (N, gx)
        B = ((rect[:, 1:2] <= ty) & (ty < rect[:, 3:4])).astype(jnp.bfloat16)
        hist = jax.lax.dot_general(
            B, A, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (gy, gx)
        return (aux.num_pairs, aux.tile_counts, aux.tile_starts, ndone,
                hist.reshape(-1).astype(jnp.int32), finalT)

    num_pairs, counts, starts, ndone, hist, finalT = map(
        np.asarray, run(args))
    chunk = cfg.chunk
    nonempty = counts > 0
    lo_c = starts // chunk
    c_last = np.where(nonempty, (starts + counts - 1) // chunk, 0)
    nch = np.where(nonempty, c_last - lo_c + 1, 0)
    exited = ndone < nch
    # per-tile residual transmittance: tile fully saturated iff every pixel
    # finished below eps
    tmax = finalT.max(axis=1)

    new_nch = -(-hist // chunk)          # ceil(precull/128)
    aligned_bwd = np.where(exited, ndone, new_nch).sum()
    today_bwd = ndone.sum() + (nonempty & (starts % chunk != 0)).sum()

    # fwd granularity SPAN_FWD=2: visited = min(ceil over spans, ...)
    sf = pk.SPAN_FWD
    vis_spans = -(-ndone // sf)          # proxy: fwd exits at same content
    today_fwd = np.minimum(vis_spans * sf, nch).sum() \
        + (nonempty & (starts % chunk != 0)).sum()
    aligned_fwd = np.where(exited, np.minimum(vis_spans * sf, new_nch),
                           new_nch).sum()

    pad = (-hist) % chunk
    print(json.dumps({
        "num_pairs": int(num_pairs),
        "alive_pairs": int(counts.sum()),
        "cull_frac": round(1 - counts.sum() / max(int(num_pairs), 1), 4),
        "precull_hist_total": int(hist.sum()),
        "tiles": int(T),
        "tiles_nonempty": int(nonempty.sum()),
        "tiles_exited": int(exited.sum()),
        "tiles_saturated(Tmax<eps)": int((tmax < 1e-4).sum()),
        "bwd_chunks_today": int(today_bwd),
        "bwd_chunks_aligned": int(aligned_bwd),
        "fwd_chunks_today_est": int(today_fwd),
        "fwd_chunks_aligned_est": int(aligned_fwd),
        "pad_slots": int(pad.sum()),
        "max_count_today": int(counts.max()),
        "max_count_aligned": int((hist + pad).max()),
    }, indent=1))


if __name__ == "__main__":
    main()
