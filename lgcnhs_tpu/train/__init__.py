from lgcnhs_tpu.train.trainer import TrainResult, train_lightgcn  # noqa: F401
