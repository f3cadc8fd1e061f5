"""Per-op device times for one full fwd+bwd bench frame (v5e triage).

Traces ~3 iterations of the bench step with jax.profiler, then aggregates
``duration_ns`` per event name on the TPU device plane. Events named "0",
"1", ... are per-iteration step markers (their duration IS the full
iteration time — do not divide those by the iteration count)."""

import collections
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from __graft_entry__ import _scene


def main():
    n_gauss, W, H = 300_000, 960, 576
    args, cam = _scene(n_gauss, W, H)
    cfg = RasterizerConfig(pair_capacity=2_621_440)
    target = jnp.zeros((3, H, W), jnp.float32)

    @jax.jit
    def fwd_bwd(means, rest):
        def loss(m, *x):
            out = rasterize(m, *x, cam, 0, cfg=cfg)
            return jnp.mean(jnp.abs(out.image - target))
        g = jax.grad(loss)(means, *rest)
        return means + 1e-12 * g

    means, rest = args[0], args[1:]
    m = fwd_bwd(means, rest)
    float(m[0, 0])
    for _ in range(3):
        m = fwd_bwd(m, rest)
    float(m[0, 0])

    d = "/tmp/trace_frame"
    shutil.rmtree(d, ignore_errors=True)
    ITERS = 3
    jax.profiler.start_trace(d)
    for _ in range(ITERS):
        m = fwd_bwd(m, rest)
    float(m[0, 0])
    jax.profiler.stop_trace()

    pb = sorted(glob.glob(d + "/**/*.xplane.pb", recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_file(pb)
    agg = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns
    print(f"== per-op device ms / iteration (ITERS={ITERS}) ==")
    shown = 0.0
    for name, ns in agg.most_common(60):
        ms = ns / 1e6 / ITERS
        if name.strip().isdigit():
            continue
        if ms < 0.05:
            break
        shown += ms
        print(f"{ms:8.3f} ms  {name[:110]}")
    print(f"   total shown: {shown:.2f} ms")
    marks = sorted((k, v) for k, v in agg.items() if k.strip().isdigit())
    print("iteration markers ms:",
          [round(v / 1e6, 2) for _, v in marks][:8])


if __name__ == "__main__":
    main()
