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

    # One jitted BATCHED pass per view: rows [L->R, flipped R->L] — the
    # same structure the pipeline's Stereo stage uses (stereo_stage.py
    # batches both directions into one dlnr_forward call; the flip trick
    # makes them the same network problem).
    @jax.jit
    def view_pass(l, r):
        b1 = jnp.concatenate([l, r[..., ::-1]], axis=0)
        b2 = jnp.concatenate([r, l[..., ::-1]], axis=0)
        return dlnr_forward(params, b1, b2, cfg)

    o = view_pass(left, right)
    jax.block_until_ready(o)

    def view_unit(l, r):
        return view_pass(l, r)

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
    result = {
        "metric": "stereo_dlnr_view_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpixels/s/chip",
        "per_view_ms": round(dt * 1e3, 1),
        "config": f"1 batched [LR, RL] DLNR pass, {iters} iters, "
                  f"{W}x{H}, f32 (XLA default bf16-matmul precision)",
    }
    print(json.dumps(result))
    import os
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_STEREO.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
