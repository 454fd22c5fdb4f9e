from nvae_tpu.parallel.pipeline import (  # noqa: F401
    PipelineTrainer,
    stage_names,
)
from nvae_tpu.parallel.multihost import (  # noqa: F401
    global_batch,
    initialize,
    is_primary,
    process_local_rows,
)
from nvae_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    fsdp_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_state,
    shard_state_fsdp,
    shard_state_tp,
    tp_param_sharding,
)
