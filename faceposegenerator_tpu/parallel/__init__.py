from .tp import shard_unet_params_tp, tp_sharding_plan
