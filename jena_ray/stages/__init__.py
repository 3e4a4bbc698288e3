"""Pipeline stages: stateless map_batches kernels + actor-pool stages."""
