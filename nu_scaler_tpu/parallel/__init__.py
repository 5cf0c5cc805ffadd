"""Device-mesh parallelism (shard_map batch sharding)."""
