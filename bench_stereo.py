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

    # One jitted single-pass DLNR, invoked twice per view (L->R, then the
    # flipped R->L) — the same structure the pipeline's Stereo stage uses
    # (stereo_stage.py jits single dlnr_forward calls).
    @jax.jit
    def one_pass(l, r):
        return dlnr_forward(params, l, r, cfg)

    o = one_pass(left, right)
    jax.block_until_ready(o)

    def view_unit(l, r):
        d_lr = one_pass(l, r)
        d_rl = one_pass(l[..., ::-1], r[..., ::-1])
        return d_lr, d_rl

    n = 5
    t0 = time.perf_counter()
    prev = left
    for _ in range(n):
        # Chain outputs into inputs so async dispatch can't overlap frames.
        o = view_unit(prev, right)
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
