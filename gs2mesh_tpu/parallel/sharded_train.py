"""Multi-chip GS training step: dp over views x tile-sharded compositing.

shard_map design (all collectives ride the mesh's ICI axes):

  * Gaussian parameter rows are sharded over the ``gauss`` axis. Each device
    runs the per-Gaussian preprocessing (projection / EWA / SH) on its shard
    only — the per-Gaussian FLOPs-heavy stage.
  * The compact splat features (~64 B/Gaussian) are `all_gather`-ed along
    ``gauss``; the transpose of that gather is an automatic `psum_scatter`,
    so backward returns shard-local parameter gradients with no atomics.
  * THE HOT PATH IS TILE-SHARDED: the same ``gauss``-axis devices double as
    framebuffer-slice owners. Device i emits, sorts and composites ONLY the
    pairs whose tiles fall in its horizontal slice of the tile grid (rect
    rows clipped to the slice before emission), so binning + sorting +
    compositing all do ~1/G of the single-chip work per device — the
    all_gather of the compact N-row table is the only replicated cost,
    amortized at N (not at pair count K). This replaces round 1's design
    that replicated binning+compositing on every device.
  * The loss is computed on the image slices in place: L1 as a masked
    psum-reduced sum, SSIM with a 5-pixel-row halo exchange between
    neighboring slices (`ppermute`) so every 11x11 window sees true pixels —
    bitwise the same loss as single-chip (image edges keep the same zero
    padding the unsharded conv uses).
  * Each ``data`` row renders a different camera view; gradients are
    psum-averaged across ``data``.
  * Densification statistics are psum/pmax-reduced across ``data`` so the
    host-side densify logic sees the same totals as single-chip training.

``RasterizerConfig.pair_capacity`` is the PER-DEVICE slice capacity (total
emission splits ~evenly across slices for typical scenes).

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
from gs2mesh_tpu.ops.ssim import _filter2d, _gaussian_window
from gs2mesh_tpu.train.trainer import TrainConfig
from gs2mesh_tpu.ops.ssim import gs_loss  # noqa: F401  (re-export for tests)

try:  # jax>=0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _gather_prep(prep_local: Preprocessed) -> Preprocessed:
    """all_gather each preprocessed field along the gauss axis (tiled)."""
    return jax.tree.map(
        lambda x: jax.lax.all_gather(x, "gauss", tiled=True), prep_local)


class ShardedRender(NamedTuple):
    image_slice: jnp.ndarray   # (3, rows_per*tile, W) this device's rows
    row_valid: jnp.ndarray     # (rows_per*tile, 1) 1.0 where global y < H
    radii: jnp.ndarray         # (n_local,) shard-local visibility radii
    num_pairs: jnp.ndarray     # () this slice's emission count
    overflow: jnp.ndarray      # () this slice overflowed its capacity
    tile_overflow: jnp.ndarray  # () a tile exceeded the xla max_per_tile cap


def rasterize_sharded(params: GaussianParams, alive, camera: Camera,
                      sh_degree: int, bg, rcfg: RasterizerConfig,
                      screenspace_offset=None, impl: str = "xla",
                      max_per_tile: int = 4096) -> ShardedRender:
    """Tile-sharded raster: local preprocess -> all_gather -> slice emit +
    composite. Must be called inside shard_map with a ``gauss`` axis.
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

    G = jax.lax.axis_size("gauss")
    ax = jax.lax.axis_index("gauss")
    gx, gy = rcfg.grid_size(camera.width, camera.height)
    rows_per = -(-gy // G)                       # tile rows per device
    h_slice = rows_per * rcfg.tile
    ty0 = ax * rows_per                          # first tile row owned

    # Clip each gaussian's tile rect rows to this device's slice; emission
    # then enumerates ONLY the pairs this device composites. All slice work
    # runs in SLICE-LOCAL pixel coordinates, so shift the gathered means by
    # the slice origin (a pure translation: gradient-transparent, and the
    # emission cull + tile compositors see consistent coords).
    yshift = (ty0 * rcfg.tile).astype(jnp.float32)
    prep = prep._replace(
        means2d=prep.means2d - jnp.array([0.0, 1.0], jnp.float32) * yshift)
    rect = prep.rect
    y0l = jnp.clip(rect[:, 1] - ty0, 0, rows_per)
    y1l = jnp.clip(rect[:, 3] - ty0, 0, rows_per)
    rect_loc = jnp.stack([rect[:, 0], y0l, rect[:, 2], y1l], axis=1)
    tiles_loc = jnp.where(prep.tiles_touched > 0,
                          (rect[:, 2] - rect[:, 0]) * (y1l - y0l), 0)

    from gs2mesh_tpu.ops.rasterizer.emit import build_feat9, emit_sorted_pairs
    pair_feat, aux = emit_sorted_pairs(
        build_feat9(prep), prep.depths, rect_loc, tiles_loc,
        camera.width, h_slice, rcfg)
    pair_feat, starts, counts = jax.lax.optimization_barrier(
        (pair_feat, aux.tile_starts, aux.tile_counts))

    if impl == "pallas":
        from gs2mesh_tpu.ops.rasterizer.pallas_kernels import render_tiles_pallas
        color_t, T_t = render_tiles_pallas(pair_feat, starts, counts,
                                           gx, rows_per, rcfg)
        tile_overflow = jnp.zeros((), bool)
    else:
        color_t, T_t = tile_render.render_tiles_xla(
            pair_feat, starts, counts, gx, rows_per, rcfg, max_per_tile)
        tile_overflow = jnp.any(counts > max_per_tile)
    color, final_T = tile_render.assemble_image(
        color_t, T_t, gx, rows_per, camera.width, h_slice, rcfg.tile)
    image = color + final_T[None] * bg[:, None, None]

    # Zero rows past the true image height (the last slice may be padded):
    # keeps the loss exact and makes slice edges match the unsharded SSIM
    # conv's zero padding.
    yglob = ty0 * rcfg.tile + jnp.arange(h_slice)
    row_valid = (yglob < camera.height).astype(jnp.float32)[:, None]
    image = image * row_valid[None]

    return ShardedRender(image_slice=image, row_valid=row_valid,
                         radii=prep_local.radius,
                         num_pairs=aux.num_pairs, overflow=aux.overflow,
                         tile_overflow=tile_overflow)


HALO = 5  # rows: 11x11 SSIM window half-width


def _exchange_halos(img: jnp.ndarray, G: int, axis_name: str = "gauss"):
    """(3, h, W) slice -> (3, h + 2*HALO, W) with true neighbor rows.

    Boundary devices receive zeros (ppermute drops unlisted destinations) —
    identical to the zero padding the single-chip 'same' convolution uses at
    image edges."""
    if G == 1:
        z = jnp.zeros((img.shape[0], HALO, img.shape[2]), img.dtype)
        return jnp.concatenate([z, img, z], axis=1)
    from_above = jax.lax.ppermute(
        img[:, -HALO:, :], axis_name,
        [(i, i + 1) for i in range(G - 1)])       # my top halo = prev's bottom
    from_below = jax.lax.ppermute(
        img[:, :HALO, :], axis_name,
        [(i + 1, i) for i in range(G - 1)])       # my bottom halo = next's top
    return jnp.concatenate([from_above, img, from_below], axis=1)


def sharded_gs_loss(image_slice, row_valid, target, ty0_rows, height: int,
                    width: int, tile: int, lambda_dssim: float, G: int):
    """Full-image (1-l)*L1 + l*(1-SSIM) from per-device slices.

    target: full (3, H, W) (replicated); image_slice: this device's rows,
    already zeroed past `height`. Exact match with ops.ssim.gs_loss on the
    stitched image (psum over 'gauss' + halo exchange give every SSIM window
    the same pixels the unsharded conv sees).
    """
    h_slice = image_slice.shape[1]
    npix = 3.0 * height * width
    y0px = ty0_rows * tile

    # Target slice with halo rows straight from the replicated target.
    tpad = jnp.pad(target, ((0, 0), (HALO, HALO + G * h_slice - height),
                            (0, 0)))
    tgt_ext = jax.lax.dynamic_slice(
        tpad, (0, y0px, 0), (3, h_slice + 2 * HALO, width))
    tgt = tgt_ext[:, HALO:-HALO, :] * row_valid[None]

    l1_part = jnp.sum(jnp.abs(image_slice - tgt))
    l1 = jax.lax.psum(l1_part, "gauss") / npix

    # SSIM on halo-extended slices; windows centered on valid rows only.
    img_ext = _exchange_halos(image_slice, G)
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    w = _gaussian_window(11, 1.5)
    mu1 = _filter2d(img_ext, w)
    mu2 = _filter2d(tgt_ext, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img_ext * img_ext, w) - mu1_sq
    s2 = _filter2d(tgt_ext * tgt_ext, w) - mu2_sq
    s12 = _filter2d(img_ext * tgt_ext, w) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    ssim_center = ssim_map[:, HALO:-HALO, :] * row_valid[None]
    ssim_val = jax.lax.psum(jnp.sum(ssim_center), "gauss") / npix
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_val)


class ShardedStepOutput(NamedTuple):
    params: GaussianParams
    opt_state: Any
    state: GaussianState
    loss: jnp.ndarray
    pairs_per_device: jnp.ndarray   # (G,) emission count of each tile slice
    overflow: jnp.ndarray           # () any slice overflowed its capacity


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
        G = jax.lax.axis_size("gauss")
        D = jax.lax.axis_size("data")
        gx, gy = rcfg.grid_size(cam.width, cam.height)
        rows_per = -(-gy // G)

        def loss_fn(p, offs):
            r = rasterize_sharded(
                p, state.alive, cam, sh_degree, bg, rcfg,
                screenspace_offset=offs, impl=impl,
                max_per_tile=max_per_tile)
            ty0 = jax.lax.axis_index("gauss") * rows_per
            loss = sharded_gs_loss(r.image_slice, r.row_valid, target, ty0,
                                   cam.height, cam.width, rcfg.tile,
                                   cfg.lambda_dssim, G)
            return loss, (r.radii, r.num_pairs,
                          r.overflow | r.tile_overflow)

        offs0 = jnp.zeros((n_local, 2), jnp.float32)
        (loss, (radii, num_pairs, overflow)), (grads, ss_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, offs0)

        # Tile sharding makes the composite exact (each device owns its
        # slice; psum_scatter through the all_gather transpose already sums
        # slice contributions) — only the data-parallel mean remains.
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, "data") * (1.0 / D), grads)

        # Densification stats: per-view grad NORMS summed over views (same
        # semantics as the reference's one-view-per-step accumulation).
        vis = radii > 0
        g_ndc = ss_grad * jnp.array([[0.5 * cam.width, 0.5 * cam.height]])
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
        pairs = jax.lax.all_gather(num_pairs, "gauss")      # (G,)
        pairs = jax.lax.pmax(pairs, "data")
        any_overflow = jax.lax.pmax(
            jax.lax.pmax(overflow.astype(jnp.int32), "gauss"), "data") > 0
        return ShardedStepOutput(params=params, opt_state=opt_state,
                                 state=state, loss=loss,
                                 pairs_per_device=pairs,
                                 overflow=any_overflow)

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
            pairs_per_device=P(),
            overflow=P(),
        )
        fn = shard_map(local_step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return fn(params, opt_state, state, cam_batch, targets, bg)

    return jax.jit(step)
