from .sharding import make_mesh, shard_batch, batched_rollout
