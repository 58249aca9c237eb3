from .sharding import (make_mesh, shard_batch, jbb_pipeline_sharded,
                       denoise_step_sharded)  # noqa: F401
