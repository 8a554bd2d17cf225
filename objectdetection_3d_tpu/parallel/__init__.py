from objectdetection_3d_tpu.parallel.data_parallel import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    make_sharded_train_step,
    make_sharded_eval_fn,
    make_sharded_predict_fn,
    make_spatial_predict_fn,
    shard_batch,
    replicate,
)
