"""Multi-chip GS training step: dp over views x model-parallel Gaussians.

shard_map design (all collectives ride the mesh's ICI axes):

  * Gaussian parameter rows are sharded over the ``gauss`` axis. Each device
    runs the per-Gaussian preprocessing (projection / EWA / SH) on its shard
    only — this is the per-Gaussian FLOPs-heavy stage.
  * The compact splat features (means2d/depth/conic/rgb/opacity/rect,
    ~48 B/Gaussian) are `all_gather`-ed along ``gauss``; binning + tile
    compositing then run on the full splat set. The transpose of that gather
    is an automatic `psum_scatter`, so backward returns shard-local
    gradients with no atomics and no manual bookkeeping.
  * Each ``data`` row renders a different camera view; gradients are
    psum-averaged across ``data`` (overlapped with backward by XLA's
    latency-hiding scheduler).
  * Densification statistics are psum/pmax-reduced across ``data`` so the
    host-side densify logic sees the same totals as single-chip training.

The reference has no equivalent — it is single-GPU only (SURVEY.md §2f).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gs2mesh_tpu.core.camera import Camera
from gs2mesh_tpu.models.gaussians import (GaussianModel, GaussianParams,
                                          GaussianState)
from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.preprocess import Preprocessed, preprocess
from gs2mesh_tpu.ops.rasterizer import tile_render
from gs2mesh_tpu.ops.ssim import gs_loss
from gs2mesh_tpu.train.trainer import TrainConfig

try:  # jax>=0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _gather_prep(prep_local: Preprocessed) -> Preprocessed:
    """all_gather each preprocessed field along the gauss axis (tiled)."""
    return jax.tree.map(
        lambda x: jax.lax.all_gather(x, "gauss", tiled=True), prep_local)


def rasterize_sharded(params: GaussianParams, alive, camera: Camera,
                      sh_degree: int, bg, rcfg: RasterizerConfig,
                      screenspace_offset=None, impl: str = "xla",
                      max_per_tile: int = 4096):
    """Shard-local raster: local preprocess -> all_gather -> full composite.

    Must be called inside shard_map with a ``gauss`` axis in scope.
    """
    opacity = jnp.where(alive, GaussianModel.act_opacity(params), 0.0)
    prep_local = preprocess(
        params.xyz, GaussianModel.act_scaling(params),
        GaussianModel.act_rotation(params), opacity,
        GaussianModel.sh_features(params), camera, sh_degree, rcfg)
    if screenspace_offset is not None:
        prep_local = prep_local._replace(
            means2d=prep_local.means2d + screenspace_offset)

    prep = _gather_prep(prep_local)
    from gs2mesh_tpu.ops.rasterizer.emit import build_feat9, emit_sorted_pairs
    pair_feat, aux = emit_sorted_pairs(
        build_feat9(prep), prep.depths, prep.rect, prep.tiles_touched,
        camera.width, camera.height, rcfg)
    pair_feat, starts, counts = jax.lax.optimization_barrier(
        (pair_feat, aux.tile_starts, aux.tile_counts))
    gx, gy = rcfg.grid_size(camera.width, camera.height)
    if impl == "pallas":
        from gs2mesh_tpu.ops.rasterizer.pallas_kernels import render_tiles_pallas
        color_t, T_t = render_tiles_pallas(pair_feat, starts, counts, gx, gy, rcfg)
    else:
        color_t, T_t = tile_render.render_tiles_xla(
            pair_feat, starts, counts, gx, gy, rcfg, max_per_tile)
    color, final_T = tile_render.assemble_image(
        color_t, T_t, gx, gy, camera.width, camera.height, rcfg.tile)
    image = color + final_T[None] * bg[:, None, None]
    return image, final_T, prep_local.radius


class ShardedStepOutput(NamedTuple):
    params: GaussianParams
    opt_state: Any
    state: GaussianState
    loss: jnp.ndarray


def make_sharded_train_step(mesh: Mesh, tx, capacity: int,
                            camera_static: Camera, cfg: TrainConfig,
                            rcfg: RasterizerConfig, sh_degree: int,
                            impl: str = "xla", max_per_tile: int = 4096):
    """Build the jitted multi-chip train step.

    Inputs at call time:
      params/opt_state/state — gauss-sharded capacity-row pytrees,
      cam_batch — Camera with leading view axis == mesh data size,
      targets — (D, 3, H, W), bg — (3,).
    """

    def row_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return P("gauss")
        return P()

    def local_step(params, opt_state, state, cam, target, bg):
        # cam leaves carry a leading data-shard axis of size 1.
        cam = jax.tree.map(lambda x: x[0], cam)
        target = target[0]
        n_local = params.xyz.shape[0]
        R = jax.lax.axis_size("gauss")
        D = jax.lax.axis_size("data")

        def loss_fn(p, offs):
            image, final_T, radii = rasterize_sharded(
                p, state.alive, cam, sh_degree, bg, rcfg,
                screenspace_offset=offs, impl=impl,
                max_per_tile=max_per_tile)
            return gs_loss(image, target, cfg.lambda_dssim), radii

        offs0 = jnp.zeros((n_local, 2), jnp.float32)
        (loss, radii), (grads, ss_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offs0)

        # The gauss-replicated composite over-counts grads by the axis size
        # (identical loss per gauss member -> psum_scatter sums R copies);
        # the data mean wants 1/D.
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, "data") * (1.0 / (R * D)), grads)

        # Densification stats: per-view grad NORMS summed over views (same
        # semantics as the reference's one-view-per-step accumulation).
        vis = radii > 0
        g_ndc = (ss_grad / R) * jnp.array([[0.5 * cam.width, 0.5 * cam.height]])
        norm = jnp.where(vis, jnp.linalg.norm(g_ndc, axis=-1), 0.0)
        state = state._replace(
            xyz_grad_accum=state.xyz_grad_accum + jax.lax.psum(norm, "data"),
            denom=state.denom + jax.lax.psum(
                jnp.where(vis, 1.0, 0.0), "data"),
            max_radii2D=jnp.maximum(
                state.max_radii2D,
                jax.lax.pmax(jnp.where(vis, radii.astype(jnp.float32), 0.0),
                             "data")),
        )

        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        loss = jax.lax.pmean(loss, "data")
        return ShardedStepOutput(params=params, opt_state=opt_state,
                                 state=state, loss=loss)

    def specs_like(tree):
        return jax.tree.map(row_spec, tree,
                            is_leaf=lambda x: hasattr(x, "ndim"))

    def step(params, opt_state, state, cam_batch, targets, bg):
        in_specs = (
            jax.tree.map(row_spec, params),
            jax.tree.map(row_spec, opt_state),
            jax.tree.map(row_spec, state),
            jax.tree.map(lambda _: P("data"), cam_batch),
            P("data"),
            P(),
        )
        out_specs = ShardedStepOutput(
            params=jax.tree.map(row_spec, params),
            opt_state=jax.tree.map(row_spec, opt_state),
            state=jax.tree.map(row_spec, state),
            loss=P(),
        )
        fn = shard_map(local_step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return fn(params, opt_state, state, cam_batch, targets, bg)

    return jax.jit(step)
