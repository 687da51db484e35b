from .mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, batch_sharding, constrain_batch, make_mesh,
    replicated, shard_batched_pytree, shard_train_state,
)
from . import distributed  # noqa: F401
