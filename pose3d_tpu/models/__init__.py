"""Model zoo: the manifold descriptor CNN family and its losses."""

from pose3d_tpu.models.manifold import (  # noqa: F401
    NETWORKS, NetSpec, init_params, apply, descriptor_fn)
from pose3d_tpu.models import losses  # noqa: F401
