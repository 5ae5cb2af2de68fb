"""TPU-native offscreen rendering: mesh loading + batched MXU rasterizer."""

from pose3d_tpu.render.mesh import Mesh, load_mesh, make_test_mesh  # noqa: F401
from pose3d_tpu.render.rasterizer import render_views, render_view  # noqa: F401
from pose3d_tpu.render.windows import bbox_window, clipped_windows  # noqa: F401
from pose3d_tpu.render.rasterizer_tiled import render_views_clipped  # noqa: F401
from pose3d_tpu.render.rasterizer_pallas import (  # noqa: F401
    render_views_clipped_pallas, render_views_tiled_pallas)
