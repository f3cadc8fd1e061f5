from gs2mesh_tpu.parallel.mesh import make_mesh, batch_cameras
from gs2mesh_tpu.parallel.sharded_train import (ShardedTrainer,
                                                make_sharded_train_step)
from gs2mesh_tpu.parallel.inference import (make_sharded_dlnr,
                                             make_sharded_integrate,
                                             shard_volume)
