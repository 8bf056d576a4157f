from .sharding import (make_mesh, batch_spec, state_spec,  # noqa: F401
                       shard_train_step, shard_sample_fn)
