"""Per-stage rasterizer timings on the live device (perf triage tool)."""

import time

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from gs2mesh_tpu.ops.rasterizer import preprocess as pp
from gs2mesh_tpu.ops.rasterizer.binning import bin_gaussians
from gs2mesh_tpu.ops.rasterizer.pack import pack_pair_features_fast
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
    cfg = RasterizerConfig(pair_capacity=1 << 22)
    gx, gy = cfg.grid_size(W, H)

    prep_f = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))
    prep = timeit("preprocess", prep_f, *args)

    binning = timeit("binning", jax.jit(lambda p: bin_gaussians(p, W, H, cfg)),
                     prep)

    feat = timeit("pack fwd",
                  jax.jit(lambda p, b: pack_pair_features_fast(p, b, cfg)),
                  prep, binning)

    timeit("render fwd (pallas)",
           jax.jit(lambda f, b: render_tiles_pallas(
               f, b.tile_starts, b.tile_counts, gx, gy, cfg)), feat, binning)

    def render_loss(f, b):
        c, t = render_tiles_pallas(f, b.tile_starts, b.tile_counts, gx, gy, cfg)
        return jnp.sum(c) + jnp.sum(t)

    timeit("render fwd+bwd (pallas)",
           jax.jit(lambda f, b: jax.grad(render_loss)(f, b)), feat, binning)

    def pack_loss(p, b):
        return jnp.sum(pack_pair_features_fast(p, b, cfg) ** 2)

    timeit("pack fwd+bwd (segsum)",
           jax.jit(lambda p, b: jax.grad(
               lambda m2d: pack_loss(p._replace(means2d=m2d), b))(p.means2d)),
           prep, binning)

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
