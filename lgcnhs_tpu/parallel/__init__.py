from lgcnhs_tpu.parallel.sharding import (  # noqa: F401
    ShardingPlan,
    make_plan,
    shard_train_inputs,
    distributed_masked_topk,
    make_sharded_train_step,
    make_sharded_train_scan,
    padded_catalog,
    shard_params,
    unpad_params,
)
