"""GaussianModel: the 3DGS parameter store as a padded-capacity JAX pytree.

Functional re-design of the reference GaussianModel
(third_party/gaussian-splatting/scene/gaussian_model.py:24-407):

  * raw parameters  _xyz / _features_dc / _features_rest / _scaling(log) /
    _rotation(quat) / _opacity(logit) with the same activations
    (gaussian_model.py:26-59),
  * SfM-pointcloud init with scale = log sqrt(mean 3-NN squared distance)
    (gaussian_model.py:124-147) via our XLA knn op,
  * adaptive density control (grad-norm accumulation, clone small / split
    large with N=2 samples and scale/1.6, prune by opacity / screen size /
    world size) re-expressed over a FIXED CAPACITY with an alive-mask so
    shapes stay static under jit; optimizer-state surgery is a pytree map
    (zeros for new rows) matching the reference's semantics (:258-327),
  * PLY save/load byte-compatible with the reference checkpoint format.

Dead rows keep opacity logit at DEAD_LOGIT so they rasterize to nothing.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.core import ply as plyio
from gs2mesh_tpu.core.sh import num_sh_coeffs, rgb_to_sh_dc

DEAD_LOGIT = -15.0  # sigmoid(-15) ~ 3e-7 < 1/255: dead rows never contribute


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class GaussianParams(NamedTuple):
    """Trainable parameters (raw / pre-activation), padded to capacity."""

    xyz: jnp.ndarray            # (C, 3)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    scaling: jnp.ndarray        # (C, 3) log-scale
    rotation: jnp.ndarray       # (C, 4) unnormalized quaternion (w, x, y, z)
    opacity: jnp.ndarray        # (C, 1) logit


class GaussianState(NamedTuple):
    """Non-trainable model state."""

    alive: jnp.ndarray          # (C,) bool
    max_radii2D: jnp.ndarray    # (C,) float32
    xyz_grad_accum: jnp.ndarray  # (C,) accumulated ndc-grad norms
    denom: jnp.ndarray          # (C,) accumulation counts


@dataclasses.dataclass
class GaussianModel:
    """Host-side handle bundling params + state + static metadata."""

    params: GaussianParams
    state: GaussianState
    max_sh_degree: int
    active_sh_degree: int = 0
    spatial_lr_scale: float = 1.0

    # ------------------------------------------------------------------
    # Activations (gaussian_model.py:94-122)
    # ------------------------------------------------------------------
    @staticmethod
    def act_scaling(params: GaussianParams) -> jnp.ndarray:
        return jnp.exp(params.scaling)

    @staticmethod
    def act_rotation(params: GaussianParams) -> jnp.ndarray:
        q = params.rotation
        return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)

    @staticmethod
    def act_opacity(params: GaussianParams) -> jnp.ndarray:
        return jax.nn.sigmoid(params.opacity)[:, 0]

    @staticmethod
    def sh_features(params: GaussianParams) -> jnp.ndarray:
        return jnp.concatenate([params.features_dc, params.features_rest], axis=1)

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def num_alive(self) -> int:
        return int(np.asarray(self.state.alive).sum())

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_point_cloud(points: np.ndarray, colors: np.ndarray,
                         max_sh_degree: int = 3,
                         capacity: Optional[int] = None,
                         spatial_lr_scale: float = 1.0) -> "GaussianModel":
        """Init from an SfM point cloud (gaussian_model.py:124-147)."""
        from gs2mesh_tpu.ops.knn import mean_sq_dist_3nn

        n = points.shape[0]
        capacity = capacity or _round_capacity(n)
        K = num_sh_coeffs(max_sh_degree)

        pts = jnp.asarray(points, jnp.float32)
        dist2 = jnp.maximum(mean_sq_dist_3nn(pts), 1e-7)
        scales_log = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

        fdc = rgb_to_sh_dc(jnp.asarray(colors, jnp.float32))[:, None, :]
        rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
        opa = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))

        def padded(x, fill=0.0):
            pad = jnp.full((capacity - n,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, pad], axis=0)

        params = GaussianParams(
            xyz=padded(pts),
            features_dc=padded(fdc),
            features_rest=padded(jnp.zeros((n, K - 1, 3), jnp.float32)),
            scaling=padded(scales_log, fill=-10.0),
            rotation=padded(rot).at[n:, 0].set(1.0),
            opacity=padded(opa, fill=DEAD_LOGIT),
        )
        alive = jnp.arange(capacity) < n
        state = GaussianState(
            alive=alive,
            max_radii2D=jnp.zeros((capacity,), jnp.float32),
            xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
        )
        return GaussianModel(params=params, state=state,
                             max_sh_degree=max_sh_degree,
                             spatial_lr_scale=spatial_lr_scale)

    # ------------------------------------------------------------------
    # Rasterizer-facing views
    # ------------------------------------------------------------------
    def raster_inputs(self):
        p = self.params
        opacity = jnp.where(self.state.alive, self.act_opacity(p), 0.0)
        return dict(
            means3d=p.xyz,
            scales=self.act_scaling(p),
            rotations=self.act_rotation(p),
            opacities=opacity,
            shs=self.sh_features(p),
        )

    # ------------------------------------------------------------------
    # Checkpoint IO (format parity with gaussian_model.py:191-256)
    # ------------------------------------------------------------------
    def save_ply(self, path: str) -> None:
        alive = np.asarray(self.state.alive)
        p = jax.tree.map(np.asarray, self.params)
        sel = np.nonzero(alive)[0]
        xyz = p.xyz[sel]
        # Reference stores features transposed: (N, 3, K) flattened channel-major.
        f_dc = p.features_dc[sel].transpose(0, 2, 1).reshape(len(sel), -1)
        f_rest = p.features_rest[sel].transpose(0, 2, 1).reshape(len(sel), -1)
        verts = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                 "nx": np.zeros(len(sel), np.float32),
                 "ny": np.zeros(len(sel), np.float32),
                 "nz": np.zeros(len(sel), np.float32)}
        for i in range(f_dc.shape[1]):
            verts[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
        for i in range(f_rest.shape[1]):
            verts[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
        verts["opacity"] = p.opacity[sel, 0].astype(np.float32)
        for i in range(3):
            verts[f"scale_{i}"] = p.scaling[sel, i].astype(np.float32)
        for i in range(4):
            verts[f"rot_{i}"] = p.rotation[sel, i].astype(np.float32)
        verts = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in verts.items()}
        plyio.write_ply(path, verts)

    @staticmethod
    def load_ply(path: str, max_sh_degree: int = 3,
                 capacity: Optional[int] = None) -> "GaussianModel":
        d = plyio.read_ply(path)
        v = d.vertex
        n = len(v["x"])
        capacity = capacity or _round_capacity(n)
        K = num_sh_coeffs(max_sh_degree)

        xyz = np.stack([v["x"], v["y"], v["z"]], axis=1)
        f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)[:, :, None]
        rest_names = sorted((k for k in v if k.startswith("f_rest_")),
                            key=lambda s: int(s.split("_")[-1]))
        assert len(rest_names) == 3 * (K - 1), (len(rest_names), K)
        if rest_names:
            f_rest = np.stack([v[k] for k in rest_names],
                              axis=1).reshape(n, 3, K - 1)
        else:                      # sh_degree 0: no f_rest properties
            f_rest = np.zeros((n, 3, 0), np.float32)
        scaling = np.stack([v[f"scale_{i}"] for i in range(3)], axis=1)
        rotation = np.stack([v[f"rot_{i}"] for i in range(4)], axis=1)
        opacity = v["opacity"][:, None]

        def padded(x, fill=0.0):
            out = np.full((capacity,) + x.shape[1:], fill, np.float32)
            out[:n] = x
            return jnp.asarray(out)

        params = GaussianParams(
            xyz=padded(xyz),
            features_dc=padded(f_dc.transpose(0, 2, 1)),
            features_rest=padded(f_rest.transpose(0, 2, 1)),
            scaling=padded(scaling, fill=-10.0),
            rotation=padded(rotation),
            opacity=padded(opacity, fill=DEAD_LOGIT),
        )
        state = GaussianState(
            alive=jnp.arange(capacity) < n,
            max_radii2D=jnp.zeros((capacity,), jnp.float32),
            xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
        )
        return GaussianModel(params=params, state=state,
                             max_sh_degree=max_sh_degree,
                             active_sh_degree=max_sh_degree)


def _round_capacity(n: int, granularity: int = 4096) -> int:
    return max(granularity, -(-n // granularity) * granularity)


# ---------------------------------------------------------------------------
# Densification (jit-friendly, static capacity)
# ---------------------------------------------------------------------------

class DensifyConfig(NamedTuple):
    grad_threshold: float = 0.0002      # densify_grad_threshold
    percent_dense: float = 0.01         # fraction of scene extent
    opacity_cull: float = 0.005         # min_opacity for pruning
    split_scale_div: float = 1.6        # scale shrink for split children
    max_screen_size: float = 0.0        # 0 disables screen-size prune


def accumulate_densification_stats(state: GaussianState,
                                   screenspace_grad: jnp.ndarray,
                                   radii: jnp.ndarray,
                                   width: int, height: int) -> GaussianState:
    """Update grad-norm accumulators for visible Gaussians
    (gaussian_model.py:405-407 + train.py:116-117).

    screenspace_grad is dL/dmeans2d in PIXEL units; convert to the NDC units
    the reference thresholds were tuned for (backward.cu ddelx_dx = 0.5*W).
    """
    vis = radii > 0
    # Reference accumulates grads in NDC units (backward.cu ddelx_dx=0.5*W);
    # ours are pixel units, so rescale for threshold parity.
    g_ndc = screenspace_grad * jnp.array([[0.5 * width, 0.5 * height]])
    norm = jnp.linalg.norm(g_ndc, axis=-1)
    return state._replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(vis, norm, 0.0),
        denom=state.denom + jnp.where(vis, 1.0, 0.0),
        max_radii2D=jnp.maximum(state.max_radii2D,
                                jnp.where(vis, radii.astype(jnp.float32), 0.0)),
    )


def densify_and_prune(params: GaussianParams, state: GaussianState,
                      opt_state_tree, scene_extent: float,
                      cfg: DensifyConfig, rng: jax.Array,
                      max_sh_degree: int):
    """Clone / split / prune within fixed capacity.

    Mirrors densify_and_clone + densify_and_split + prune
    (gaussian_model.py:349-403):
      clone:  grad >= thr and max(scale) <= percent_dense * extent — copy as-is.
      split:  grad >= thr and max(scale) >  percent_dense * extent — child
              sampled from N(0, scale) rotated to world, scale /= 1.6; the
              parent is also resampled (the reference creates N=2 samples and
              prunes the original).
      prune:  opacity < cull, or screen/world size too large.

    New rows take the lowest-index dead slots; if capacity runs out the
    lowest-priority candidates are dropped (overflow reported). Optimizer
    state rows for new/moved Gaussians are zeroed via ``opt_state_tree``
    (same effect as the reference's optimizer-state surgery, :258-327).

    Returns (params, state, opt_state_tree, stats dict).
    """
    C = params.xyz.shape[0]
    alive = state.alive
    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / state.denom, 0.0)
    scales = jnp.exp(params.scaling)
    max_scale = scales.max(axis=1)
    opacity = jax.nn.sigmoid(params.opacity[:, 0])

    # --- prune mask (gaussian_model.py:389-403)
    prune = alive & (opacity < cfg.opacity_cull)
    if cfg.max_screen_size > 0:
        prune = prune | (alive & (state.max_radii2D > cfg.max_screen_size))
        prune = prune | (alive & (max_scale > 0.1 * scene_extent))
    keep = alive & ~prune

    # --- densify candidates
    wants = keep & (grads >= cfg.grad_threshold)
    small = max_scale <= cfg.percent_dense * scene_extent
    clone = wants & small
    split = wants & ~small

    # A split turns 1 into 2 resampled children: treat as "parent resampled in
    # place + one new row". A clone adds one identical new row.
    new_needed = clone | split

    # Assign new slots: dead slots (including freshly pruned) in index order.
    dead = ~keep
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1         # rank among dead
    dead_slots = jnp.nonzero(dead, size=C, fill_value=C - 1)[0]
    cand_rank = jnp.cumsum(new_needed.astype(jnp.int32)) - 1   # rank among candidates
    n_dead = dead.sum()
    n_new = new_needed.sum()
    granted = new_needed & (cand_rank < n_dead)
    slot_of_cand = dead_slots[jnp.clip(cand_rank, 0, C - 1)]   # (C,) target slot per candidate

    # --- sample split children (both parent-resample and new row)
    from gs2mesh_tpu.ops.rasterizer.preprocess import quat_to_rotmat

    rot = params.rotation / (jnp.linalg.norm(params.rotation, axis=-1, keepdims=True) + 1e-12)
    R = quat_to_rotmat(rot)                                     # (C, 3, 3)
    k1, k2 = jax.random.split(rng)
    samp1 = jax.random.normal(k1, (C, 3)) * scales
    samp2 = jax.random.normal(k2, (C, 3)) * scales
    child1_xyz = params.xyz + jnp.einsum("nij,nj->ni", R, samp1)
    child2_xyz = params.xyz + jnp.einsum("nij,nj->ni", R, samp2)
    child_scaling = jnp.log(scales / cfg.split_scale_div)

    # Parent update for splits (in place): resampled child 1.
    new_xyz = jnp.where(split[:, None], child1_xyz, params.xyz)
    new_scaling = jnp.where(split[:, None], child_scaling, params.scaling)
    params = params._replace(xyz=new_xyz, scaling=new_scaling)

    # Rows to write into granted slots: clones copy, splits use child 2.
    src_xyz = jnp.where(split[:, None], child2_xyz, params.xyz)
    src_scaling = jnp.where(split[:, None], child_scaling, params.scaling)

    def scatter_new(dst, src):
        idx = jnp.where(granted, slot_of_cand, C)
        return dst.at[idx].set(src, mode="drop")

    params = params._replace(
        xyz=scatter_new(params.xyz, src_xyz),
        features_dc=scatter_new(params.features_dc, params.features_dc),
        features_rest=scatter_new(params.features_rest, params.features_rest),
        scaling=scatter_new(params.scaling, src_scaling),
        rotation=scatter_new(params.rotation, params.rotation),
        opacity=scatter_new(params.opacity, params.opacity),
    )

    new_alive = keep.at[jnp.where(granted, slot_of_cand, C)].set(True, mode="drop")

    # Kill pruned rows' influence (opacity logit floor) and zero their params'
    # optimizer state along with newly granted slots and split parents.
    dirty = (~new_alive) | split
    dirty = dirty.at[jnp.where(granted, slot_of_cand, C)].set(True, mode="drop")
    params = params._replace(
        opacity=jnp.where(new_alive[:, None], params.opacity, DEAD_LOGIT))

    if opt_state_tree is not None:
        opt_state_tree = zero_opt_rows(opt_state_tree, dirty, C)

    state = GaussianState(
        alive=new_alive,
        max_radii2D=jnp.where(new_alive, state.max_radii2D, 0.0),
        xyz_grad_accum=jnp.zeros((C,), jnp.float32),
        denom=jnp.zeros((C,), jnp.float32),
    )
    stats = dict(n_clone=clone.sum(), n_split=split.sum(),
                 n_prune=prune.sum(), n_new=n_new, n_granted=granted.sum(),
                 overflow=n_new > n_dead)
    return params, state, opt_state_tree, stats


def reset_opacity(params: GaussianParams, alive: jnp.ndarray) -> GaussianParams:
    """Clamp opacity to <= 0.01 (gaussian_model.py:210-213)."""
    new = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(params.opacity),
                                      jnp.float32(0.01)))
    return params._replace(opacity=jnp.where(alive[:, None], new, DEAD_LOGIT))


def zero_opt_rows(opt_state_tree, dirty: jnp.ndarray, capacity: int):
    """Zero first-axis rows of any optimizer-state leaf with capacity rows
    (Adam m/v reset for replaced Gaussians — the reference rebuilds optimizer
    tensors with zeros for new rows, gaussian_model.py:258-327)."""

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            mask = dirty.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(fix, opt_state_tree)
