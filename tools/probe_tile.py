"""Bench the full fwd+bwd rasterize at different tile sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from __graft_entry__ import _scene


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    target = jnp.zeros((3, H, W), jnp.float32)

    for tile, cap in ((32, 2_752_512), (48, 1_703_936), (64, 1_282_048)):
        cfg = RasterizerConfig(tile=tile, pair_capacity=cap)

        @jax.jit
        def fwd_bwd(means, rest):
            def loss(m, *x):
                out = rasterize(m, *x, cam, 0, cfg=cfg)
                return jnp.mean(jnp.abs(out.image - target))
            g = jax.grad(loss)(means, *rest)
            return means + 1e-12 * g

        means, rest = args[0], args[1:]
        try:
            m = fwd_bwd(means, rest)
            float(m[0, 0])
        except Exception as e:
            print(f"tile={tile}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            m = fwd_bwd(m, rest)
        float(m[0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"tile={tile} cap={cap}: {dt*1e3:.2f} ms/frame "
              f"= {W*H/dt/1e6:.2f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
