"""Stereo-stage (DLNR) throughput benchmark on the live device.

The pipeline's second hot loop: per rendered view the Stereo stage runs the
DLNR network twice (L->R and flipped R->L, stereo_utils.py:82-147) at
valid_iters=10 refinement steps. This bench measures one full per-view unit
(2 forward passes, 10 iters each) at DTU-like half resolution and reports
Mpixels/s of stereo-processed imagery.

Prints ONE JSON line (same shape as bench.py) to stdout; stage timings to
stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gs2mesh_tpu.stereo import DLNRConfig, dlnr_forward, init_dlnr_params

    H, W = 576, 960
    iters = 10
    params = init_dlnr_params(seed=0)
    cfg = DLNRConfig(iters=iters)

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))

    @jax.jit
    def view_unit(l, r):
        # L->R pass + flipped R->L pass (the stereo stage's per-view work).
        d_lr = dlnr_forward(params, l, r, cfg)
        d_rl = dlnr_forward(params, l[..., ::-1], r[..., ::-1], cfg)
        return d_lr, d_rl

    o = view_unit(left, right)
    jax.block_until_ready(o)

    n = 5
    t0 = time.perf_counter()
    prev = left
    for _ in range(n):
        # Chain outputs into inputs so async dispatch can't overlap frames.
        o = view_unit(prev, right)
        import jax
        leaf = jax.tree.leaves(o)[0]
        prev = left + 1e-12 * leaf.mean()
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n

    mpix_s = (H * W) / dt / 1e6
    print(f"per-view (2x DLNR @ {iters} iters, {W}x{H}): {dt * 1e3:.1f} ms",
          file=sys.stderr)
    print(json.dumps({
        "metric": "stereo_dlnr_view_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
