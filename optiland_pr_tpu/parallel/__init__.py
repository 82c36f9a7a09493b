from .mesh import (make_mesh, shard_rays, replicate, sharded_trace,
                   sharded_spot_rms, sharded_irradiance,
                   sharded_value_and_grad, shard_map_spot_rms,
                   shard_map_merit_grad, shard_map_merit_grad_pallas,
                   microbatch, microbatched_trace,
                   init_distributed)

__all__ = ["make_mesh", "shard_rays", "replicate", "sharded_trace",
           "sharded_spot_rms", "sharded_irradiance", "sharded_value_and_grad",
           "shard_map_spot_rms", "shard_map_merit_grad",
           "shard_map_merit_grad_pallas", "microbatch",
           "microbatched_trace", "init_distributed"]
