"""Per-stage rasterizer timings on the live device (perf triage tool)."""

import time

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from gs2mesh_tpu.ops.rasterizer import preprocess as pp
from gs2mesh_tpu.ops.rasterizer.emit import build_feat9, emit_sorted_pairs
from gs2mesh_tpu.ops.rasterizer.pallas_kernels import render_tiles_pallas
from __graft_entry__ import _scene


def timeit(name, f, *a, n=5):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt * 1e3:8.2f} ms", flush=True)
    return o


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=2_621_440)
    gx, gy = cfg.grid_size(W, H)

    prep_f = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))
    prep = timeit("preprocess", prep_f, *args)

    def emit(p):
        return emit_sorted_pairs(build_feat9(p), p.depths, p.rect,
                                 p.tiles_touched, W, H, cfg)

    feat, aux = timeit("emit fwd (sort-carry)", jax.jit(emit), prep)

    timeit("render fwd (pallas)",
           jax.jit(lambda f, s, c: render_tiles_pallas(f, s, c, gx, gy, cfg)),
           feat, aux.tile_starts, aux.tile_counts)

    def render_loss(f, s, c):
        col, t = render_tiles_pallas(f, s, c, gx, gy, cfg)
        return jnp.sum(col) + jnp.sum(t)

    timeit("render fwd+bwd (pallas)",
           jax.jit(lambda f, s, c: jax.grad(render_loss)(f, s, c)),
           feat, aux.tile_starts, aux.tile_counts)

    def emit_loss(p):
        f, _ = emit(p)
        return jnp.sum(f ** 2)

    timeit("emit fwd+bwd (sort+segsum)",
           jax.jit(lambda p: jax.grad(
               lambda m2d: emit_loss(p._replace(means2d=m2d)))(p.means2d)),
           prep)

    def prep_loss(*a):
        pr = pp.preprocess(*a, cam, 0, cfg=cfg)
        return sum(jnp.sum(x) for x in
                   (pr.means2d, pr.conic, pr.opacity, pr.rgb, pr.depths))

    timeit("preprocess fwd+bwd",
           jax.jit(lambda *a: jax.grad(prep_loss)(*a)), *args)

    target = jnp.zeros((3, H, W), jnp.float32)
    full = jax.jit(lambda *a: jax.grad(
        lambda m, *x: jnp.mean(jnp.abs(
            rasterize(m, *x, cam, 0, cfg=cfg).image - target)))(*a))
    timeit("FULL fwd+bwd", full, *args)
    print("num_pairs:", int(jax.jit(
        lambda *a: rasterize(*a, cam, 0, cfg=cfg).num_pairs)(*args)))


if __name__ == "__main__":
    main()
