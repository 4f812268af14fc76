"""Device-mesh scale-out helpers (shard_map / NamedSharding over the paths axis)."""
