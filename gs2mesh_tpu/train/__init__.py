from gs2mesh_tpu.train.trainer import TrainConfig, Trainer, make_optimizer, train_step
