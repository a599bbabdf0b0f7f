"""Device-mesh parallelism (event sharding over TPU meshes)."""

from .mesh import event_mesh, shard_events, distributed_init

__all__ = ["event_mesh", "shard_events", "distributed_init"]
