"""Stage-level timing of one DLNR pass on the live device (perf triage)."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.stereo import DLNRConfig, dlnr_forward, init_dlnr_params
from gs2mesh_tpu.stereo.corr import build_corr_pyramid, lookup_corr
from gs2mesh_tpu.stereo.dlnr import upsample_flow
from gs2mesh_tpu.stereo.extractor import extractor_forward
from gs2mesh_tpu.stereo.layers import conv2d, residual_block_instance
from gs2mesh_tpu.stereo.update import update_block


def timeit(name, f, *a, n=5):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:40s} {(time.perf_counter() - t0)/n*1e3:8.2f} ms",
          flush=True)
    return o


def main():
    H, W = 576, 960
    params = init_dlnr_params(seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))

    ext = timeit("extractor (2 imgs)", jax.jit(
        lambda x: extractor_forward(x, params["extractor"])), x)
    outputs04, outputs08, outputs16, v = ext

    def vol(v):
        vc = residual_block_instance(v, params["volume_conv"]["0"])
        return conv2d(vc, params["volume_conv"]["1"], padding=1)

    vc = timeit("volume conv", jax.jit(vol), v)
    fmap1, fmap2 = vc[:1], vc[1:]

    pyr = timeit("corr pyramid build", jax.jit(
        lambda a, b: build_corr_pyramid(a, b, 4)), fmap1, fmap2)

    h4, w4 = H // 4, W // 4
    flow_x = jnp.zeros((1, h4, w4), jnp.float32)
    timeit("corr lookup (1 iter)", jax.jit(
        lambda p, fx: lookup_corr(p, fx + jnp.arange(w4, dtype=jnp.float32),
                                  4)), pyr, flow_x)

    corr = lookup_corr(pyr, flow_x + jnp.arange(w4, dtype=jnp.float32), 4)
    net_h = tuple(jnp.tanh(o[0][:1]) for o in (outputs04, outputs08,
                                               outputs16))
    net_ext = []
    for i, o in enumerate((outputs04, outputs08, outputs16)):
        biases = conv2d(jax.nn.relu(o[1][:1]),
                        params["extractor"].get("nope", None)
                        or params["bias_convs"][str(i)], padding=1)
        net_ext.append(tuple(jnp.split(biases, 4, axis=-1)))
    flow = jnp.stack([flow_x, jnp.zeros_like(flow_x)], axis=-1)

    timeit("update block (1 iter)", jax.jit(
        lambda nh, ne, c, f: update_block(list(nh), list(nh), ne, c, f,
                                          params["update_block"])),
        net_h, net_ext, corr, flow)

    mask = jnp.zeros((1, h4, w4, 9 * 16), jnp.float32)
    timeit("convex upsample", jax.jit(
        lambda f, m: upsample_flow(f, m, 4)), flow, mask)

    img1 = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    cfg = DLNRConfig(iters=10)
    timeit("FULL dlnr fwd (10 iters)", jax.jit(
        lambda p, a, b: dlnr_forward(p, a, b, cfg)), params, img1, img2, n=3)


if __name__ == "__main__":
    main()
