from .mesh import (make_mesh, shard_rays, replicate, sharded_trace,
                   sharded_spot_rms, sharded_irradiance,
                   sharded_value_and_grad)

__all__ = ["make_mesh", "shard_rays", "replicate", "sharded_trace",
           "sharded_spot_rms", "sharded_irradiance", "sharded_value_and_grad"]
