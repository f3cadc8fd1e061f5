"""Multi-chip inference parallelism: view-parallel stereo + block-sharded
TSDF fusion.

New capability over the single-GPU reference (SURVEY.md §2f): the stereo
stage's per-view DLNR passes are pure data parallelism over the `data` mesh
axis, and the TSDF volume's block table shards its voxel payload across
devices (keys stay replicated — they're a tiny int32 table — so allocation
is computed identically everywhere and the append-only slots mean sharded
voxel arrays never move).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gs2mesh_tpu.fusion.tsdf import TSDFConfig, TSDFVolume, integrate
from gs2mesh_tpu.stereo import DLNRConfig, dlnr_forward


def make_sharded_dlnr(mesh: Mesh, cfg: DLNRConfig = DLNRConfig(),
                      axis: str = "data"):
    """Returns f(params, images1, images2[, flow_init]) with the batch
    (view) dimension sharded over `axis` and params replicated.

    images*: (B, 3, H, W) with B a multiple of the axis size."""
    batch = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def fwd(params, images1, images2):
        images1 = jax.lax.with_sharding_constraint(images1, batch)
        images2 = jax.lax.with_sharding_constraint(images2, batch)
        return dlnr_forward(params, images1, images2, cfg)

    @jax.jit
    def fwd_warm(params, images1, images2, flow_init):
        images1 = jax.lax.with_sharding_constraint(images1, batch)
        images2 = jax.lax.with_sharding_constraint(images2, batch)
        return dlnr_forward(params, images1, images2, cfg,
                            flow_init=flow_init)

    def run(params, images1, images2, flow_init=None):
        params = jax.device_put(params, repl)
        if flow_init is None:
            return fwd(params, images1, images2)
        return fwd_warm(params, images1, images2, flow_init)

    return run


def volume_shardings(mesh: Mesh, axis: str = "data"):
    """NamedShardings for a TSDFVolume: voxel payloads sharded over blocks,
    the small key/order/scalar fields replicated."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return TSDFVolume(keys=repl, order=repl, tsdf=shard, weight=shard,
                      color=shard, n_blocks=repl, overflow=repl)


def shard_volume(vol: TSDFVolume, mesh: Mesh,
                 axis: str = "data") -> TSDFVolume:
    return jax.device_put(vol, volume_shardings(mesh, axis))


def make_sharded_integrate(mesh: Mesh, cfg: TSDFConfig, axis: str = "data"):
    """Jitted per-view TSDF integrate with the volume's voxel arrays sharded
    over blocks; the image/depth are replicated (every device reads the rows
    its blocks project to). Allocation stays host-driven exactly as in the
    single-chip path."""
    shardings = volume_shardings(mesh, axis)

    @jax.jit
    def step(vol, color, depth, K, extrinsic, depth_trunc):
        vol = jax.tree.map(jax.lax.with_sharding_constraint, vol, shardings)
        out = integrate(vol, color, depth, K, extrinsic, depth_trunc, cfg)
        return jax.tree.map(jax.lax.with_sharding_constraint, out, shardings)

    return step
