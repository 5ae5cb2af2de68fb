"""Device-mesh utilities: data-parallel sharding over ICI."""

from pose3d_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, batch_sharding)
