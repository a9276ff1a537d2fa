"""Device-mesh parallelism: sharded rendering, collectives, multi-host."""
