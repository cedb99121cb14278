"""map_batches callables: stateless batch kernels and actor-pool classes."""
