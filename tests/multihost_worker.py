"""Worker process for the 2-process multi-host CPU test.

Usage: python -m tests.multihost_worker <coordinator_port> <process_id>
Each process exposes 4 CPU devices -> 8 global; mesh = (2 dcn-data, 4 gauss).
Runs ONE tile-sharded training step on globally-sharded arrays and prints
the (replicated) loss.
"""

import sys


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from gs2mesh_tpu.parallel.multihost import initialize, make_hybrid_mesh
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.parallel import batch_cameras
    from gs2mesh_tpu.parallel.sharded_train import make_sharded_train_step
    from gs2mesh_tpu.train.trainer import TrainConfig, make_optimizer
    from tests.scenes import look_at_camera, sphere_scene

    scene = sphere_scene(n=100, seed=7)
    cams = [look_at_camera((0, 0, -3.0), width=64, height=64),
            look_at_camera((0.4, 0.2, -2.9), width=64, height=64)]
    rcfg = RasterizerConfig(pair_capacity=1 << 12)
    cfg = TrainConfig(sh_degree=0)
    rng = np.random.default_rng(8)
    model = GaussianModel.from_point_cloud(
        scene["means3d"], rng.uniform(0.2, 0.8, (100, 3)),
        max_sh_degree=0, capacity=128)
    tx = make_optimizer(cfg, model.spatial_lr_scale)
    opt_state = tx.init(model.params)

    mesh = make_hybrid_mesh(dcn_data=2, data=1, gauss=4)

    def to_global(tree, spec_fn):
        def put(leaf):
            if not hasattr(leaf, "ndim"):
                return leaf
            spec = spec_fn(leaf)
            sh = NamedSharding(mesh, spec)
            arr = np.asarray(leaf)
            if spec == P("data") and arr.shape[0] == 2:
                local = arr[pid:pid + 1]
            else:
                local = arr          # replicated over data / sharded on gauss
            return jax.make_array_from_process_local_data(sh, local)
        return jax.tree.map(put, tree)

    def row_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == 128:
            return P("gauss")
        return P()

    params = to_global(model.params, row_spec)
    opt_g = to_global(opt_state, row_spec)
    state_g = to_global(model.state, row_spec)
    targets = to_global(
        jnp.zeros((2, 3, 64, 64), jnp.float32), lambda _: P("data"))
    cam_batch = jax.tree.map(
        lambda x: (jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), np.asarray(x)[pid:pid + 1])
            if hasattr(x, "ndim") else x),
        batch_cameras(cams))
    bg = to_global(jnp.zeros(3), lambda _: P())

    step = make_sharded_train_step(mesh, tx, 128, cams[0], cfg, rcfg, 0,
                                   impl="xla", max_per_tile=1024)
    out = step(params, opt_g, state_g, cam_batch, targets, bg)
    loss = float(out.loss)
    pairs = np.asarray(out.pairs_per_device)
    assert np.isfinite(loss)
    assert pairs.sum() > 0
    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f} pairs={pairs.tolist()}",
          flush=True)


if __name__ == "__main__":
    main()
