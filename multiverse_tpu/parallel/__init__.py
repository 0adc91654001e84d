from multiverse_tpu.parallel.mesh import (  # noqa: F401
    batch_pspec,
    init_sharded_train_state,
    make_mesh,
    make_mesh_for_batch,
    make_sharded_beam_step,
    make_sharded_eval_step,
    make_sharded_train_step,
    param_pspecs,
    replicate,
    shard_batch,
)
