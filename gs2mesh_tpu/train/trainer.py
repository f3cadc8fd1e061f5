"""GS training: jitted step + host-side densification loop.

Functional re-design of the reference training loop
(third_party/gaussian-splatting/train.py:31-132):

  * jitted train step: render → (1-λ)L1 + λ(1-SSIM) → grads → per-group Adam
    (optax multi_transform; Adam eps 1e-15 and the per-group LRs of
    gaussian_model.py:154-167), exponential xyz LR schedule,
  * densification stats (screen-space grad norms via the zero-offset probe),
  * host cadence: densify/prune every ``densification_interval`` iterations
    in [densify_from, densify_until], opacity reset every
    ``opacity_reset_interval``, SH-degree bump every 1000 (train.py:87-89),
  * checkpointing: GS-format PLY snapshots + orbax-free pickled optimizer
    state (capture/restore parity with gaussian_model.py:61-93).
"""

from __future__ import annotations

import dataclasses
import math
import pickle
import os
import time
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gs2mesh_tpu.core.camera import Camera
from gs2mesh_tpu.models.gaussians import (DEAD_LOGIT, DensifyConfig,
                                          GaussianModel, GaussianParams,
                                          GaussianState,
                                          accumulate_densification_stats,
                                          densify_and_prune, reset_opacity,
                                          zero_opt_rows)
from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from gs2mesh_tpu.ops.ssim import gs_loss, psnr


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """OptimizationParams parity (arguments/__init__.py:71-89)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    white_background: bool = False
    sh_degree: int = 3
    random_background: bool = False


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear LR interpolation with optional delay (Plenoxels-style
    schedule used by the reference for xyz)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


def make_optimizer(cfg: TrainConfig, spatial_lr_scale: float):
    """Per-group Adam with the reference's LRs; xyz gets the expon schedule."""

    def adam(lr):
        return optax.adam(lr, eps=1e-15)

    def xyz_schedule(step):
        return expon_lr(step,
                        cfg.position_lr_init * spatial_lr_scale,
                        cfg.position_lr_final * spatial_lr_scale,
                        lr_delay_steps=0,
                        lr_delay_mult=cfg.position_lr_delay_mult,
                        max_steps=cfg.position_lr_max_steps)

    tx = optax.multi_transform(
        {
            "xyz": optax.chain(optax.scale_by_adam(eps=1e-15),
                               optax.scale_by_schedule(lambda s: -xyz_schedule(s))),
            "f_dc": optax.chain(optax.scale_by_adam(eps=1e-15),
                                optax.scale(-cfg.feature_lr)),
            "f_rest": optax.chain(optax.scale_by_adam(eps=1e-15),
                                  optax.scale(-cfg.feature_lr / 20.0)),
            "opacity": optax.chain(optax.scale_by_adam(eps=1e-15),
                                   optax.scale(-cfg.opacity_lr)),
            "scaling": optax.chain(optax.scale_by_adam(eps=1e-15),
                                   optax.scale(-cfg.scaling_lr)),
            "rotation": optax.chain(optax.scale_by_adam(eps=1e-15),
                                    optax.scale(-cfg.rotation_lr)),
        },
        GaussianParams(xyz="xyz", features_dc="f_dc", features_rest="f_rest",
                       scaling="scaling", rotation="rotation",
                       opacity="opacity"),
    )
    return tx


class StepOutput(NamedTuple):
    params: GaussianParams
    opt_state: Any
    state: GaussianState
    loss: jnp.ndarray
    radii: jnp.ndarray
    num_pairs: jnp.ndarray
    overflow: jnp.ndarray        # pair_capacity exceeded (step was a no-op)
    tile_overflow: jnp.ndarray   # xla per-tile bound exceeded (also no-op)


def render_model(params: GaussianParams, alive: jnp.ndarray, camera: Camera,
                 active_sh_degree: int, bg: jnp.ndarray,
                 rcfg: RasterizerConfig, impl: str = "auto",
                 screenspace_offset=None, max_per_tile: int = 4096,
                 scale_modifier: float = 1.0):
    """Render current model parameters through ``camera``."""
    opacity = jnp.where(alive, GaussianModel.act_opacity(params), 0.0)
    return rasterize(
        params.xyz,
        GaussianModel.act_scaling(params),
        GaussianModel.act_rotation(params),
        opacity,
        GaussianModel.sh_features(params),
        camera, active_sh_degree, bg=bg, cfg=rcfg,
        scale_modifier=scale_modifier,
        screenspace_offset=screenspace_offset, impl=impl,
        max_per_tile=max_per_tile)


def make_train_step(tx, camera_static: Camera, cfg: TrainConfig,
                    rcfg: RasterizerConfig, active_sh_degree: int,
                    impl: str = "auto", max_per_tile: int = 4096):
    """Build a jitted train step closed over static config.

    camera_static supplies static width/height; the camera's array fields are
    passed dynamically so one compiled step serves every view of a scene.
    """

    def step_fn(params: GaussianParams, opt_state, state: GaussianState,
                camera: Camera, target: jnp.ndarray, bg: jnp.ndarray):
        n = params.xyz.shape[0]

        def loss_fn(p, offs):
            out = render_model(p, state.alive, camera, active_sh_degree, bg,
                               rcfg, impl, screenspace_offset=offs,
                               max_per_tile=max_per_tile)
            loss = gs_loss(out.image, target, cfg.lambda_dssim)
            return loss, out

        offs0 = jnp.zeros((n, 2), jnp.float32)
        (loss, out), (grads, ss_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offs0)

        new_state = accumulate_densification_stats(
            state, ss_grad, out.radii, camera.width, camera.height)

        # Dead padded rows produce NaN grads (e.g. d/dq of quat-normalize at
        # q=0 survives the multiplicative alive mask); zero them so dead
        # rows and their Adam moments stay exactly at their fill values.
        grads = jax.tree.map(
            lambda g: jnp.where(
                new_state.alive.reshape((n,) + (1,) * (g.ndim - 1)), g, 0.0),
            grads)

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)

        # A capacity overflow means this render (and so its gradients) was
        # computed from a truncated pair list. Make the step an exact no-op
        # so the host loop can grow capacity and redo the iteration — the
        # TPU static-shape analog of the reference's dynamic buffer growth
        # (rasterizer_impl.cu:155-194 resizeFunctional).
        ok = jnp.logical_not(out.overflow | out.tile_overflow)

        def gate(new, old):
            return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)

        return StepOutput(params=gate(new_params, params),
                          opt_state=gate(new_opt_state, opt_state),
                          state=gate(new_state, state),
                          loss=loss, radii=out.radii,
                          num_pairs=out.num_pairs, overflow=out.overflow,
                          tile_overflow=out.tile_overflow)

    return jax.jit(step_fn, donate_argnums=(0, 1, 2))


train_step = make_train_step  # legacy alias


@dataclasses.dataclass
class Trainer:
    """Host-side GS training driver over a list of (Camera, image) views."""

    model: GaussianModel
    cameras: Sequence[Camera]
    images: Sequence[np.ndarray]          # (3, H, W) float arrays in [0, 1]
    cfg: TrainConfig = TrainConfig()
    rcfg: RasterizerConfig = RasterizerConfig()
    impl: str = "auto"
    max_per_tile: int = 4096
    scene_extent: float = 1.0
    out_dir: Optional[str] = None
    seed: int = 0

    def __post_init__(self):
        self.tx = make_optimizer(self.cfg, self.model.spatial_lr_scale)
        self.opt_state = self.tx.init(self.model.params)
        self.iteration = 0
        self._steps: Dict[int, Any] = {}
        self._rng = np.random.default_rng(self.seed)
        self._key = jax.random.PRNGKey(self.seed)
        self._view_stack: List[int] = []
        self.history: List[Dict[str, float]] = []

    def _get_step(self, sh_degree: int):
        key = (sh_degree,)
        if key not in self._steps:
            self._steps[key] = make_train_step(
                self.tx, self.cameras[0], self.cfg, self.rcfg, sh_degree,
                self.impl, self.max_per_tile)
        return self._steps[key]

    def _bg(self) -> jnp.ndarray:
        if self.cfg.random_background:
            self._key, k = jax.random.split(self._key)
            return jax.random.uniform(k, (3,))
        return (jnp.ones(3, jnp.float32) if self.cfg.white_background
                else jnp.zeros(3, jnp.float32))

    def _next_view(self) -> int:
        if not self._view_stack:
            self._view_stack = list(range(len(self.cameras)))
            self._rng.shuffle(self._view_stack)
        return self._view_stack.pop()

    def train(self, iterations: Optional[int] = None,
              log_every: int = 0, callback=None):
        cfg = self.cfg
        total = iterations if iterations is not None else cfg.iterations
        end = self.iteration + total
        while self.iteration < end:
            self.iteration += 1
            it = self.iteration
            # SH degree warmup: bump every 1000 iterations (train.py:87-89).
            sh_deg = min(it // 1000, self.cfg.sh_degree)
            step = self._get_step(sh_deg)
            vi = self._next_view()
            out = step(self.model.params, self.opt_state, self.model.state,
                       self.cameras[vi], self._image_dev(vi), self._bg())
            self.model.params = out.params
            self.model.state = out.state
            self.model.active_sh_degree = sh_deg
            self.opt_state = out.opt_state

            # React to rasterizer capacity overflow: the step gated itself
            # into an exact no-op (see make_train_step), so grow the
            # overflowed buffer bound (one retrace) and redo this iteration
            # on the same view — never train on a truncated render.
            if bool(out.overflow) or bool(out.tile_overflow):
                if bool(out.overflow):
                    self.grow_pair_capacity()
                if bool(out.tile_overflow):
                    self.max_per_tile *= 2
                    self._steps.clear()
                    print(f"[train] max_per_tile -> {self.max_per_tile}")
                self._view_stack.append(vi)
                self.iteration -= 1
                continue

            if (cfg.densify_from_iter <= it <= cfg.densify_until_iter
                    and it % cfg.densification_interval == 0):
                self.densify()
            if it % cfg.opacity_reset_interval == 0 and it < cfg.iterations:
                self.reset_opacity()
            if log_every and it % log_every == 0:
                rec = dict(iteration=it, loss=float(out.loss),
                           num_alive=self.model.num_alive(),
                           num_pairs=int(out.num_pairs))
                self.history.append(rec)
                print(f"[train] it={it} loss={rec['loss']:.5f} "
                      f"alive={rec['num_alive']} pairs={rec['num_pairs']}")
            if callback is not None:
                callback(self, out)
        return self

    def _image_dev(self, vi: int):
        """Device-resident target cache: re-uploading the target image per
        step costs more than the whole rasterizer fwd+bwd on a remote-
        attached chip (~6.6 MB/iter at DTU half-res)."""
        if not hasattr(self, "_images_dev"):
            self._images_dev = {}
        if vi not in self._images_dev:
            self._images_dev[vi] = jnp.asarray(self.images[vi])
        return self._images_dev[vi]

    def densify(self):
        # Screen-size pruning activates after opacity reset (train.py:120).
        big = 20.0 if self.iteration > self.cfg.opacity_reset_interval else 0.0
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
        # Host-side recapacity: the reference grows tensors freely
        # (cat_tensors_to_optimizer, gaussian_model.py:276-327); with static
        # TPU shapes we instead double the padded capacity when densification
        # ran out of dead slots or the pool is nearly full, paying one
        # retrace per growth step.
        n_alive = int(np.asarray(state.alive).sum())
        if bool(stats["overflow"]) or n_alive > 0.9 * self.model.capacity:
            self.grow_capacity(self.model.capacity * 2)
        return stats

    def grow_pair_capacity(self):
        """Double the rasterizer pair capacity after an emission overflow
        (the reference reallocates its binning buffers on demand,
        rasterizer_impl.cu:155-194; with static TPU shapes we double and
        retrace). Capacity stays < 2^24 (f32-exact index carry bound)."""
        cap = self.rcfg.pair_capacity
        new = min(cap * 2, (1 << 24) - 2048)
        if new <= cap:
            raise RuntimeError(
                f"pair_capacity {cap} hit the 2^24 index bound; "
                "reduce image resolution or gaussian count")
        self.rcfg = dataclasses.replace(self.rcfg, pair_capacity=new)
        self._steps.clear()
        print(f"[train] pair_capacity {cap} -> {new}")

    def grow_capacity(self, new_capacity: int):
        """Pad params/state/optimizer rows to a larger static capacity
        (triggers recompilation of the train step on next use)."""
        old = self.model.capacity
        if new_capacity <= old:
            return
        params, state, self.opt_state = grow_rows(
            self.model.params, self.model.state, self.opt_state,
            new_capacity)
        self.model.params, self.model.state = params, state
        self._steps.clear()          # shapes changed -> retrace
        print(f"[train] capacity {old} -> {new_capacity} "
              f"(alive {self.model.num_alive()})")

    def reset_opacity(self):
        self.model.params = reset_opacity(self.model.params,
                                          self.model.state.alive)
        # Reset Adam state for opacity rows (the reference's
        # replace_tensor_to_optimizer): zero only the opacity-group moments.
        self.opt_state = _zero_opacity_moments(self.opt_state,
                                               self.model.capacity)

    # ------------------------------------------------------------------
    # Evaluation / checkpointing
    # ------------------------------------------------------------------
    def render_view(self, index: int, sh_degree: Optional[int] = None):
        cam = self.cameras[index]
        out = render_model(
            self.model.params, self.model.state.alive, cam,
            self.model.active_sh_degree if sh_degree is None else sh_degree,
            self._bg(), self.rcfg, self.impl, max_per_tile=self.max_per_tile)
        return out

    def report_psnr(self, indices: Optional[Sequence[int]] = None) -> float:
        idxs = list(indices) if indices is not None else range(len(self.cameras))
        vals = []
        for i in idxs:
            out = self.render_view(i)
            vals.append(float(psnr(out.image,
                                   jnp.asarray(self.images[i]))))
        return float(np.mean(vals))

    def save_checkpoint(self, path_dir: str):
        os.makedirs(path_dir, exist_ok=True)
        self.model.save_ply(os.path.join(
            path_dir, "point_cloud",
            f"iteration_{self.iteration}", "point_cloud.ply"))
        # save_ply compacts alive rows to the front; permute the pickled
        # per-row state/optimizer arrays into the SAME order so a restored
        # model's row i and its Adam moments describe the same Gaussian
        # (load_ply lays rows out compacted).
        order = compact_row_order(self.model.state.alive)
        cap = self.model.capacity
        with open(os.path.join(path_dir, f"chkpnt{self.iteration}.pkl"), "wb") as f:
            pickle.dump({
                "iteration": self.iteration,
                "opt_state": permute_rows(self.opt_state, order, cap),
                "state": permute_rows(self.model.state, order, cap),
                "active_sh_degree": self.model.active_sh_degree,
                "spatial_lr_scale": self.model.spatial_lr_scale,
            }, f)

    def restore_checkpoint(self, path_dir: str, iteration: int):
        with open(os.path.join(path_dir, f"chkpnt{iteration}.pkl"), "rb") as f:
            blob = pickle.load(f)
        # Capacity may have grown (or differ) since this checkpoint was
        # taken; the saved state/opt_state fix the padded capacity.
        cap = blob["state"].alive.shape[0]
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
        # The xyz LR schedule closes over spatial_lr_scale; rebuild the
        # optimizer so a restore into a fresh Trainer resumes the schedule.
        self.tx = make_optimizer(self.cfg, self.model.spatial_lr_scale)


def compact_row_order(alive) -> np.ndarray:
    """(C,) permutation putting alive rows first (checkpoint layout of
    save_ply / load_ply)."""
    alive = np.asarray(alive)
    return np.concatenate([np.nonzero(alive)[0], np.nonzero(~alive)[0]])


def permute_rows(tree, order: np.ndarray, capacity: int):
    """Gather every capacity-row leaf to host, permuted by ``order``."""

    def fix(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return leaf[order]
        return leaf

    return jax.tree.map(fix, tree)


def grow_rows(params: GaussianParams, state: GaussianState, opt_state,
              new_capacity: int):
    """Pad params/state/optimizer capacity rows to ``new_capacity`` (the
    static-shape analog of the reference's free tensor growth,
    gaussian_model.py:276-327). Shared by the single-chip Trainer and the
    multi-chip ShardedTrainer."""
    old = params.xyz.shape[0]
    assert new_capacity > old

    def pad_rows(x, fill=0.0):
        pad = jnp.full((new_capacity - old,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    params = GaussianParams(
        xyz=pad_rows(params.xyz),
        features_dc=pad_rows(params.features_dc),
        features_rest=pad_rows(params.features_rest),
        scaling=pad_rows(params.scaling, fill=-10.0),
        rotation=pad_rows(params.rotation).at[old:, 0].set(1.0),
        opacity=pad_rows(params.opacity, fill=DEAD_LOGIT),
    )
    state = GaussianState(
        alive=pad_rows(state.alive, fill=False),
        max_radii2D=pad_rows(state.max_radii2D),
        xyz_grad_accum=pad_rows(state.xyz_grad_accum),
        denom=pad_rows(state.denom),
    )

    def pad_opt(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == old):
            return pad_rows(leaf)
        return leaf

    opt_state = jax.tree.map(pad_opt, opt_state)
    return params, state, opt_state


def _zero_opacity_moments(opt_state, capacity: int):
    """Zero Adam m/v for the opacity group after an opacity reset (matching
    replace_tensor_to_optimizer, gaussian_model.py:258-273)."""

    def walk(tree):
        # optax.multi_transform state: inner_states dict keyed by group name.
        try:
            inner = tree.inner_states
        except AttributeError:
            return tree
        new_inner = dict(inner)
        if "opacity" in new_inner:
            st = new_inner["opacity"]

            def zero(leaf):
                if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1 \
                        and leaf.shape[0] == capacity:
                    return jnp.zeros_like(leaf)
                return leaf

            new_inner["opacity"] = jax.tree.map(zero, st)
        return tree._replace(inner_states=new_inner)

    return walk(opt_state)
