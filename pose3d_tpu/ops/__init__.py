"""Pure-JAX math ops: quaternions, sphere sampling, geometry, patches, kNN."""
