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
    pairs whose tiles fall in its STRIDED (round-robin) set of tile rows —
    global tile row r belongs to device r mod G (rect rows clipped before
    emission; the emission kernels map local rows back to global geometry
    via ``RasterizerConfig.row_stride``). Binning + sorting + compositing
    all do ~1/G of the single-chip work per device, and striding keeps the
    shares balanced on center-heavy scenes where contiguous bands gave the
    middle devices several times the edge load. The all_gather of the
    compact N-row table is the only replicated cost, amortized at N (not at
    pair count K).
  * The loss is computed on the interleaved slices in place: L1 as a masked
    psum-reduced sum, SSIM with a per-tile-row 5-pixel halo exchange around
    the device ring (`ppermute`) so every 11x11 window sees true pixels —
    the same loss as single-chip (image edges keep the same zero padding
    the unsharded conv uses).
  * Each ``data`` row renders a different camera view; gradients are
    psum-averaged across ``data``.
  * Densification statistics are psum/pmax-reduced across ``data`` so the
    host-side densify logic sees the same totals as single-chip training.

``RasterizerConfig.pair_capacity`` is the PER-DEVICE slice capacity (total
emission splits ~evenly across slices for typical scenes).

The reference has no equivalent — it is single-GPU only (SURVEY.md §2f).
"""

from __future__ import annotations

import dataclasses
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
from gs2mesh_tpu.ops.ssim import _gaussian_window
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

    # STRIDED (round-robin) tile-row ownership: device ax owns global tile
    # rows {ax + l*G}. Contiguous bands concentrate center-heavy scenes on
    # the middle devices (4.4x edge-device load measured at G=8); striding
    # interleaves every device through the whole image so per-device pair
    # counts track the mean. Clip each gaussian's global rect rows [y0, y1)
    # to the local indices it owns:  l in [ceil((y0-ax)/G), floor((y1-1-ax)/G)].
    # The emission kernel maps local rows back to global via
    # (cfg.row_stride, row_offset=ax) so the alpha cull + tile-local means
    # use true global y geometry while keys stay slice-local.
    assert rcfg.row_stride == 1, \
        "pass a base config; rasterize_sharded applies the stride itself"
    rcfg_s = dataclasses.replace(rcfg, row_stride=G)
    rect = prep.rect
    y0l = jnp.clip(-((ax - rect[:, 1]) // G), 0, rows_per)
    y1l = jnp.clip((rect[:, 3] - 1 - ax) // G + 1, 0, rows_per)
    y1l = jnp.maximum(y0l, y1l)
    rect_loc = jnp.stack([rect[:, 0], y0l, rect[:, 2], y1l], axis=1)
    tiles_loc = jnp.where(prep.tiles_touched > 0,
                          (rect[:, 2] - rect[:, 0]) * (y1l - y0l), 0)

    from gs2mesh_tpu.ops.rasterizer.emit import build_feat9, emit_sorted_pairs
    if impl == "pallas" and rcfg.feat_carry_bf16:
        # Production path: fused emit+composite custom-vjp (compacted
        # backward, see ops.rasterizer.fused) on this device's tile slice.
        from gs2mesh_tpu.ops.rasterizer.fused import emit_render_fused
        color_t, T_t, aux = emit_render_fused(
            build_feat9(prep), prep.depths, rect_loc, tiles_loc,
            camera.width, h_slice, rcfg_s, ax)
        tile_overflow = jnp.zeros((), bool)
    else:
        pair_feat, aux = emit_sorted_pairs(
            build_feat9(prep), prep.depths, rect_loc, tiles_loc,
            camera.width, h_slice, rcfg_s, ax)
        pair_feat, starts, counts = jax.lax.optimization_barrier(
            (pair_feat, aux.tile_starts, aux.tile_counts))

        if impl == "pallas":
            from gs2mesh_tpu.ops.rasterizer.pallas_kernels import \
                render_tiles_pallas
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

    # Zero rows past the true image height (the trailing global tile rows
    # are padding): keeps the loss exact and makes slice edges match the
    # unsharded SSIM conv's zero padding. Local pixel row l*tile + w maps
    # to global pixel row (ax + l*G)*tile + w.
    larr = jnp.arange(h_slice) // rcfg.tile
    warr = jnp.arange(h_slice) % rcfg.tile
    yglob = (ax + larr * G) * rcfg.tile + warr
    row_valid = (yglob < camera.height).astype(jnp.float32)[:, None]
    image = image * row_valid[None]

    return ShardedRender(image_slice=image, row_valid=row_valid,
                         radii=prep_local.radius,
                         num_pairs=aux.num_pairs, overflow=aux.overflow,
                         tile_overflow=tile_overflow)


HALO = 5  # rows: 11x11 SSIM window half-width


def _exchange_halos_strided(img4: jnp.ndarray, ax, G: int,
                            axis_name: str = "gauss"):
    """Per-tile-row halos under strided row ownership.

    img4: (3, rows_per, tile, W) — this device's tile rows (local row l is
    global tile row ax + l*G). Returns (3, rows_per, tile + 2*HALO, W) where
    every tile row is extended by the TRUE neighboring pixel rows:
    the row above global row (ax + l*G) lives on device (ax-1) mod G — at
    the same local index for ax > 0, at l-1 for ax == 0 (the ring wraps one
    local step down). One full-ring ppermute each way; the top/bottom image
    edges get zeros, identical to the unsharded conv's zero padding. Also
    exact at G == 1, where the ring is the identity and the wrap shift
    stitches a device's own adjacent tile rows together."""
    bottom = img4[:, :, -HALO:, :]               # (3, R, HALO, W)
    top = img4[:, :, :HALO, :]
    recv_above = jax.lax.ppermute(
        bottom, axis_name, [(i, (i + 1) % G) for i in range(G)])
    recv_below = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % G) for i in range(G)])
    z = jnp.zeros_like(recv_above[:, :1])
    shift_dn = jnp.concatenate([z, recv_above[:, :-1]], axis=1)
    shift_up = jnp.concatenate([recv_below[:, 1:], z], axis=1)
    above = jnp.where(ax == 0, shift_dn, recv_above)
    below = jnp.where(ax == G - 1, shift_up, recv_below)
    return jnp.concatenate([above, img4, below], axis=2)


def _filter2d_rows(x4: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise filter over (3, R, h, W) per-tile-row stacks: vertical
    VALID (the halo rows supply the support), horizontal same padding."""
    C, R, h, W = x4.shape
    k = window.shape[0]
    kernel = jnp.broadcast_to(window, (C, 1, k, k))
    xb = x4.transpose(1, 0, 2, 3)                # (R, 3, h, W) — R batches
    out = jax.lax.conv_general_dilated(
        xb, kernel, window_strides=(1, 1),
        padding=[(0, 0), (k // 2, k // 2)],
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out.transpose(1, 0, 2, 3)             # (3, R, h - 2*HALO, W)


def sharded_gs_loss(image_slice, row_valid, target, ax, height: int,
                    width: int, tile: int, lambda_dssim: float, G: int):
    """Full-image (1-l)*L1 + l*(1-SSIM) from strided per-device slices.

    target: full (3, H, W) (replicated); image_slice: this device's
    interleaved tile rows (local l = global ax + l*G), already zeroed past
    `height`. Matches ops.ssim.gs_loss on the stitched image: the psum over
    'gauss' plus per-tile-row halo exchange give every SSIM window the same
    pixels the unsharded conv sees.

    Returns (total, partial): ``total`` is the replicated full-image loss
    (for reporting); ``partial`` is this device's UN-psum'd share, summing
    to ``total - lambda_dssim`` across the axis. DIFFERENTIATE ``partial``:
    the all_gather transpose (psum_scatter) already sums each shard's
    cotangent contributions across devices, so grad(partial) IS the full
    gradient — while grad(psum(partial)) would arrive G-fold (the psum
    transpose under check_vma=False re-psums the replicated cotangent).
    That G-fold factor is invisible after Adam's per-coordinate rescaling
    (which is why parameter-trajectory tests never caught it) but inflates
    the raw densification grad-norm stats G-fold.
    """
    h_slice = image_slice.shape[1]
    rows_per = h_slice // tile
    npix = 3.0 * height * width
    img4 = image_slice.reshape(3, rows_per, tile, width)

    # Target tile rows (with halo rows) gathered straight from the
    # replicated target: local row l covers global pixel rows
    # [(ax + l*G)*tile - HALO, (ax + l*G + 1)*tile + HALO).
    tpad = jnp.pad(target, ((0, 0),
                            (HALO, HALO + G * h_slice - height), (0, 0)))
    idx = ((ax + jnp.arange(rows_per) * G) * tile)[:, None] \
        + jnp.arange(tile + 2 * HALO)[None, :]
    tgt_ext = jnp.take(tpad, idx, axis=1)        # (3, R, tile+2H, W)
    rv4 = row_valid.reshape(1, rows_per, tile, 1)
    tgt4 = tgt_ext[:, :, HALO:-HALO, :] * rv4

    l1_part = jnp.sum(jnp.abs(img4 - tgt4))

    # SSIM on halo-extended tile rows; windows centered on valid rows only.
    img_ext = _exchange_halos_strided(img4, ax, G)
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    w = _gaussian_window(11, 1.5)
    mu1 = _filter2d_rows(img_ext, w)
    mu2 = _filter2d_rows(tgt_ext, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d_rows(img_ext * img_ext, w) - mu1_sq
    s2 = _filter2d_rows(tgt_ext * tgt_ext, w) - mu2_sq
    s12 = _filter2d_rows(img_ext * tgt_ext, w) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    ssim_part = jnp.sum(ssim_map * rv4)
    partial = ((1.0 - lambda_dssim) * l1_part
               - lambda_dssim * ssim_part) / npix
    total = jax.lax.psum(partial, "gauss") + lambda_dssim
    return total, partial


class ShardedStepOutput(NamedTuple):
    params: GaussianParams
    opt_state: Any
    state: GaussianState
    loss: jnp.ndarray
    pairs_per_device: jnp.ndarray   # (G,) emission count of each tile slice
    # Mirrors the single-chip StepOutput split (trainer.py StepOutput): the
    # two bits demand different reactions — grow ``pair_capacity`` vs raise
    # ``max_per_tile`` (or switch to the capless Pallas path) — so they are
    # never merged. The reference grows its buffers instead of truncating
    # (rasterizer_impl.cu:155-194); on static-shape TPU the host reacts.
    overflow: jnp.ndarray           # () any slice overflowed pair_capacity
    tile_overflow: jnp.ndarray      # () a tile exceeded the XLA per-tile cap


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

        def loss_fn(p, offs):
            r = rasterize_sharded(
                p, state.alive, cam, sh_degree, bg, rcfg,
                screenspace_offset=offs, impl=impl,
                max_per_tile=max_per_tile)
            ax = jax.lax.axis_index("gauss")
            total, partial = sharded_gs_loss(
                r.image_slice, r.row_valid, target, ax,
                cam.height, cam.width, rcfg.tile, cfg.lambda_dssim, G)
            # Differentiate the LOCAL partial (see sharded_gs_loss: the
            # gather transpose already psums shard cotangents; grad of the
            # replicated total would arrive G-fold).
            return partial, (total, r.radii, r.num_pairs, r.overflow,
                             r.tile_overflow)

        offs0 = jnp.zeros((n_local, 2), jnp.float32)
        (_, (loss, radii, num_pairs, overflow, tile_overflow)), \
            (grads, ss_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, offs0)

        # Tile sharding makes the composite exact (each device owns its
        # slice; psum_scatter through the all_gather transpose already sums
        # slice contributions) — only the data-parallel mean remains.
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, "data") * (1.0 / D), grads)

        # Dead padded rows produce NaN grads (the quat-normalize derivative
        # at q=0 survives the multiplicative alive mask); zero them so dead
        # rows and their Adam moments stay exactly at their fill values —
        # same guard as the single-chip step (trainer.py make_train_step).
        grads = jax.tree.map(
            lambda g: jnp.where(
                state.alive.reshape((n_local,) + (1,) * (g.ndim - 1)),
                g, 0.0),
            grads)

        # Densification stats: per-view grad NORMS summed over views (same
        # semantics as the reference's one-view-per-step accumulation).
        vis = radii > 0
        g_ndc = ss_grad * jnp.array([[0.5 * cam.width, 0.5 * cam.height]])
        norm = jnp.where(vis, jnp.linalg.norm(g_ndc, axis=-1), 0.0)
        state0 = state
        state = state._replace(
            xyz_grad_accum=state.xyz_grad_accum + jax.lax.psum(norm, "data"),
            denom=state.denom + jax.lax.psum(
                jnp.where(vis, 1.0, 0.0), "data"),
            max_radii2D=jnp.maximum(
                state.max_radii2D,
                jax.lax.pmax(jnp.where(vis, radii.astype(jnp.float32), 0.0),
                             "data")),
        )

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        loss = jax.lax.pmean(loss, "data")
        pairs = jax.lax.all_gather(num_pairs, "gauss")      # (G,)
        pairs = jax.lax.pmax(pairs, "data")

        def any_bit(b):
            return jax.lax.pmax(
                jax.lax.pmax(b.astype(jnp.int32), "gauss"), "data") > 0

        any_overflow = any_bit(overflow)
        any_tile_overflow = any_bit(tile_overflow)
        # Same no-op gating as the single-chip step (make_train_step): an
        # overflowed render produced truncated gradients, so freeze params /
        # optimizer / densify stats and let the host grow and redo.
        ok = jnp.logical_not(any_overflow | any_tile_overflow)

        def gate(new, old):
            return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)

        return ShardedStepOutput(params=gate(new_params, params),
                                 opt_state=gate(new_opt_state, opt_state),
                                 state=gate(state, state0), loss=loss,
                                 pairs_per_device=pairs,
                                 overflow=any_overflow,
                                 tile_overflow=any_tile_overflow)

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
            tile_overflow=P(),
        )
        fn = shard_map(local_step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return fn(params, opt_state, state, cam_batch, targets, bg)

    return jax.jit(step)


@dataclasses.dataclass
class ShardedTrainer:
    """Multi-chip host training driver: overflow reaction + density control.

    Applies the same grow-and-redo policy as the single-chip ``Trainer``
    (train.trainer): when a step reports ``overflow`` the per-slice
    ``pair_capacity`` doubles; when it reports ``tile_overflow`` the XLA
    compositor's ``max_per_tile`` doubles; either way the step already gated
    itself to an exact no-op, so the iteration is redone on the same views
    after one retrace — the static-shape analog of the reference's dynamic
    buffer growth (rasterizer_impl.cu resizeFunctional). Each step consumes
    ``data``-axis-many views (data-parallel gradient mean).

    Adaptive density control runs the single-chip host cadence
    (train.py:113-123): the step already psum-accumulates the densify stats
    across the ``data`` axis, so ``densify_and_prune`` over the GLOBAL
    capacity-row arrays sees the same totals as single-chip training; the
    clone/split/prune + optimizer surgery result is re-sharded automatically
    when the next step consumes it. Gaussian capacity growth keeps the row
    count divisible by the ``gauss`` axis (shard_map evenness).
    """

    mesh: Mesh
    model: GaussianModel
    cameras: Any                       # Sequence[Camera]
    images: Any                        # Sequence[(3, H, W) arrays]
    cfg: TrainConfig = TrainConfig()
    rcfg: RasterizerConfig = RasterizerConfig()
    impl: str = "xla"
    max_per_tile: int = 4096
    scene_extent: float = 1.0
    seed: int = 0
    MAX_CACHED_STEPS = 4   # bound live executables (SH warmup x growth)

    def __post_init__(self):
        from gs2mesh_tpu.train.trainer import make_optimizer
        import numpy as np

        self.tx = make_optimizer(self.cfg, self.model.spatial_lr_scale)
        self.opt_state = self.tx.init(self.model.params)
        self.iteration = 0
        self._steps = {}
        self._rng = np.random.default_rng(self.seed)
        self._key = jax.random.PRNGKey(self.seed)
        self._view_stack = []
        self._targets_dev = {}

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def gauss_size(self) -> int:
        return self.mesh.shape["gauss"]

    def _get_step(self, sh_degree: int):
        key = (sh_degree, self.model.capacity, self.rcfg.pair_capacity,
               self.max_per_tile)
        if key not in self._steps:
            if len(self._steps) >= self.MAX_CACHED_STEPS:
                # Evict oldest: SH warmup + growth events would otherwise
                # hold every retraced executable live for a 30k-iter run.
                self._steps.pop(next(iter(self._steps)))
            self._steps[key] = make_sharded_train_step(
                self.mesh, self.tx, self.model.capacity, self.cameras[0],
                self.cfg, self.rcfg, sh_degree, impl=self.impl,
                max_per_tile=self.max_per_tile)
        return self._steps[key]

    def _next_views(self):
        import numpy as np

        out = []
        for _ in range(self.data_size):
            if not self._view_stack:
                self._view_stack = list(range(len(self.cameras)))
                self._rng.shuffle(self._view_stack)
            out.append(self._view_stack.pop())
        return out

    def _targets(self, views):
        for v in views:
            if v not in self._targets_dev:
                self._targets_dev[v] = jnp.asarray(self.images[v])
        return jnp.stack([self._targets_dev[v] for v in views])

    def _bg(self):
        return (jnp.ones(3, jnp.float32) if self.cfg.white_background
                else jnp.zeros(3, jnp.float32))

    def train(self, iterations: int, log_every: int = 0):
        from gs2mesh_tpu.parallel.mesh import batch_cameras

        end = self.iteration + iterations
        while self.iteration < end:
            self.iteration += 1
            it = self.iteration
            sh_deg = min(it // 1000, self.cfg.sh_degree)
            views = self._next_views()
            step = self._get_step(sh_deg)
            out = step(self.model.params, self.opt_state, self.model.state,
                       batch_cameras([self.cameras[v] for v in views]),
                       self._targets(views), self._bg())
            self.model.params = out.params
            self.model.state = out.state
            self.opt_state = out.opt_state
            if bool(out.overflow) or bool(out.tile_overflow):
                if bool(out.overflow):
                    cap = self.rcfg.pair_capacity
                    new = min(cap * 2, (1 << 24) - 2048)
                    if new <= cap:
                        raise RuntimeError(
                            f"per-slice pair_capacity {cap} hit the 2^24 "
                            "bound")
                    self.rcfg = dataclasses.replace(self.rcfg,
                                                    pair_capacity=new)
                    print(f"[sharded] pair_capacity {cap} -> {new}")
                if bool(out.tile_overflow):
                    self.max_per_tile *= 2
                    print(f"[sharded] max_per_tile -> {self.max_per_tile}")
                self._steps.clear()
                self._view_stack.extend(reversed(views))
                self.iteration -= 1
                continue
            # Single-chip host cadence (train.py:113-123): densify/prune in
            # the window, opacity reset on its interval.
            if (self.cfg.densify_from_iter <= it
                    <= self.cfg.densify_until_iter
                    and it % self.cfg.densification_interval == 0):
                self.densify()
            if (it % self.cfg.opacity_reset_interval == 0
                    and it < self.cfg.iterations):
                self.reset_opacity()
            if log_every and it % log_every == 0:
                print(f"[sharded] it={it} loss={float(out.loss):.5f} "
                      f"alive={self.model.num_alive()} "
                      f"pairs={np_asarray_list(out.pairs_per_device)}")
        return self

    # ------------------------------------------------------------------
    # Adaptive density control (host cadence over the global arrays)
    # ------------------------------------------------------------------
    def densify(self):
        from gs2mesh_tpu.models.gaussians import (DensifyConfig,
                                                  densify_and_prune)
        import numpy as np

        big = (20.0 if self.iteration > self.cfg.opacity_reset_interval
               else 0.0)
        dcfg = DensifyConfig(
            grad_threshold=self.cfg.densify_grad_threshold,
            percent_dense=self.cfg.percent_dense,
            opacity_cull=0.005, max_screen_size=big)
        self._key, k = jax.random.split(self._key)
        params, state, opt_state, stats = densify_and_prune(
            self.model.params, self.model.state, self.opt_state,
            self.scene_extent, dcfg, k, self.model.max_sh_degree)
        self.model.params, self.model.state = params, state
        self.opt_state = opt_state
        n_alive = int(np.asarray(state.alive).sum())
        if bool(stats["overflow"]) or n_alive > 0.9 * self.model.capacity:
            self.grow_capacity(self.model.capacity * 2)
        return stats

    def grow_capacity(self, new_capacity: int):
        """Double Gaussian capacity, rounded up to a gauss-axis multiple so
        shard_map row sharding stays even. One retrace per growth event."""
        from gs2mesh_tpu.train.trainer import grow_rows

        G = self.gauss_size
        new_capacity = -(-new_capacity // G) * G
        old = self.model.capacity
        if new_capacity <= old:
            return
        params, state, self.opt_state = grow_rows(
            self.model.params, self.model.state, self.opt_state,
            new_capacity)
        self.model.params, self.model.state = params, state
        self._steps.clear()
        print(f"[sharded] capacity {old} -> {new_capacity} "
              f"(alive {self.model.num_alive()})")

    def reset_opacity(self):
        from gs2mesh_tpu.models.gaussians import reset_opacity
        from gs2mesh_tpu.train.trainer import _zero_opacity_moments

        self.model.params = reset_opacity(self.model.params,
                                          self.model.state.alive)
        self.opt_state = _zero_opacity_moments(self.opt_state,
                                               self.model.capacity)

    # ------------------------------------------------------------------
    # Checkpoint / resume (single-chip format, trainer.py:419-448 parity;
    # np.asarray gathers the sharded rows to host)
    # ------------------------------------------------------------------
    def save_checkpoint(self, path_dir: str):
        import os
        import pickle
        import numpy as np

        from gs2mesh_tpu.train.trainer import (compact_row_order,
                                               permute_rows)

        os.makedirs(path_dir, exist_ok=True)
        self.model.save_ply(os.path.join(
            path_dir, "point_cloud",
            f"iteration_{self.iteration}", "point_cloud.ply"))
        order = compact_row_order(self.model.state.alive)
        cap = self.model.capacity
        with open(os.path.join(path_dir,
                               f"chkpnt{self.iteration}.pkl"), "wb") as f:
            pickle.dump({
                "iteration": self.iteration,
                "opt_state": permute_rows(self.opt_state, order, cap),
                "state": permute_rows(self.model.state, order, cap),
                "active_sh_degree": self.model.active_sh_degree,
                "spatial_lr_scale": self.model.spatial_lr_scale,
                "pair_capacity": self.rcfg.pair_capacity,
                "max_per_tile": self.max_per_tile,
            }, f)

    def restore_checkpoint(self, path_dir: str, iteration: int):
        import os
        import pickle

        with open(os.path.join(path_dir, f"chkpnt{iteration}.pkl"),
                  "rb") as f:
            blob = pickle.load(f)
        cap = blob["state"].alive.shape[0]
        assert cap % self.gauss_size == 0, (cap, self.gauss_size)
        ply = os.path.join(path_dir, "point_cloud",
                           f"iteration_{iteration}", "point_cloud.ply")
        self.model = GaussianModel.load_ply(ply, self.model.max_sh_degree,
                                            capacity=cap)
        self._steps.clear()
        self.opt_state = jax.tree.map(jnp.asarray, blob["opt_state"])
        self.model.state = jax.tree.map(jnp.asarray, blob["state"])
        self.model.active_sh_degree = blob["active_sh_degree"]
        self.model.spatial_lr_scale = blob["spatial_lr_scale"]
        self.iteration = blob["iteration"]
        from gs2mesh_tpu.train.trainer import make_optimizer
        self.tx = make_optimizer(self.cfg, self.model.spatial_lr_scale)
        if "pair_capacity" in blob:
            self.rcfg = dataclasses.replace(
                self.rcfg, pair_capacity=blob["pair_capacity"])
        if "max_per_tile" in blob:
            self.max_per_tile = blob["max_per_tile"]


def np_asarray_list(x):
    import numpy as np

    return np.asarray(x).tolist()
