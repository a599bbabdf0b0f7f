"""Device-mesh parallelism (event sharding over TPU meshes)."""

from .mesh import distributed_init, event_mesh, event_sharding, shard_events

__all__ = ["event_mesh", "event_sharding", "shard_events", "distributed_init"]
