"""Mesh construction and sharded train/sample steps."""

from dimsum_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    host_local_to_global,
    replicate_to_mesh,
    make_mesh,
    make_seq_mesh,
    data_sharding,
    replicated,
    tp_param_specs,
    tp_shardings,
)
from dimsum_tpu.parallel.train import (  # noqa: F401
    TrainState,
    create_optimizer,
    create_train_state,
    ema_update,
    clip_by_global_norm,
    make_train_step,
    make_sample_step,
)
