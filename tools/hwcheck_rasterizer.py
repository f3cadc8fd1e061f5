"""Hardware grad check: pallas-on-TPU vs golden, small scene (triage)."""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from gs2mesh_tpu.ops.rasterizer.golden import render_golden
from tests.scenes import look_at_camera, sphere_scene

CFG = RasterizerConfig(pair_capacity=1 << 14, feat_carry_bf16=False,
                       grad_carry_bf16=False)
CAM = look_at_camera((0.0, 0.0, -3.0), width=96, height=64)
BG = jnp.array([0.1, 0.2, 0.3], jnp.float32)


def main():
    print("backend:", jax.default_backend())
    s = sphere_scene(n=256)
    args = tuple(jnp.asarray(s[k]) for k in
                 ("means3d", "scales", "rotations", "opacities", "shs"))

    golden_img, golden_T, _ = jax.jit(
        lambda a: render_golden(*a, CAM, 0, bg=BG, cfg=CFG))(args)
    out = jax.jit(lambda a: rasterize(*a, CAM, 0, bg=BG, cfg=CFG,
                                      impl="pallas"))(args)
    img_err = float(jnp.abs(out.image - golden_img).max())
    T_err = float(jnp.abs(out.final_T - golden_T).max())
    print(f"fwd: img maxerr {img_err:.2e}  T maxerr {T_err:.2e}")

    def mkloss(impl):
        def loss(*a):
            o = rasterize(*a, CAM, 0, bg=BG, cfg=CFG, impl=impl)
            return jnp.mean(o.image ** 2)
        return loss

    def gloss(*a):
        img, _, _ = render_golden(*a, CAM, 0, bg=BG, cfg=CFG)
        return jnp.mean(img ** 2)

    g1 = jax.jit(lambda a: jax.grad(gloss, argnums=(0, 1, 2, 3, 4))(*a))(args)
    g2 = jax.jit(lambda a: jax.grad(mkloss("pallas"),
                                    argnums=(0, 1, 2, 3, 4))(*a))(args)
    names = ("means", "scales", "rot", "opac", "shs")
    ok = True
    for n, a, b in zip(names, g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        rel = err / (np.abs(a).max() + 1e-12)
        print(f"grad {n:6s}: maxabs {err:.3e}  rel {rel:.3e}")
        ok &= rel < 5e-3

    # Phase 2: the PRODUCTION packed-carry fused path (emit_render_fused:
    # compacted backward + id-carrying append) vs the packed XLA fallback.
    # Expected agreement (measured envelope on v5e): p99 under ~1.5% for
    # means/opac/shs; scale/rotation carry larger tails (p99 ~11% / ~4%) —
    # the one-pass moment matmul's operand rounding amplified through the
    # moment-difference cancellation (see pallas_kernels chunk_grads; the
    # exact fixes cost more than the 12 Mpix/s bar allows, and exact-carry
    # mode stays reference-grade). Thresholds are ~2x that envelope: this
    # phase is a REGRESSION gate on the fused path, not a parity claim.
    cfgp = RasterizerConfig(pair_capacity=1 << 14, sort_stable=True)

    def mklossp(impl):
        def loss(*a):
            o = rasterize(*a, CAM, 0, bg=BG, cfg=cfgp, impl=impl,
                          max_per_tile=4096)
            return jnp.mean(o.image ** 2)
        return loss

    gx = jax.jit(lambda a: jax.grad(mklossp("xla"),
                                    argnums=(0, 1, 2, 3, 4))(*a))(args)
    gp = jax.jit(lambda a: jax.grad(mklossp("pallas"),
                                    argnums=(0, 1, 2, 3, 4))(*a))(args)
    p99_bound = dict(means=3e-2, scales=2.5e-1, rot=1e-1, opac=1e-2,
                     shs=1e-2)
    for n, a, b in zip(names, gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b)
        sc = np.abs(a).max() + 1e-12
        p99 = np.quantile(d, 0.99) / sc
        print(f"packed grad {n:6s}: max rel {d.max() / sc:.3e}  "
              f"p99 rel {p99:.3e}")
        ok &= p99 < p99_bound[n]
    print("OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
