"""Device-mesh sharding of synthesis workloads (ICI data-parallel)."""
