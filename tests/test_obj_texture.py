import numpy as np
import pytest

from pose3d_tpu.render import load_mesh


def _write_obj(tmp_path, with_uv=True):
    obj = tmp_path / "tex.obj"
    lines = ["v 0 0 0", "v 1 0 0", "v 0 1 0"]
    if with_uv:
        lines += ["vt 0.0 0.0", "vt 1.0 0.0", "vt 0.0 1.0",
                  "f 1/1 2/2 3/3"]
    else:
        lines += ["f 1 2 3"]
    obj.write_text("\n".join(lines) + "\n")
    return obj


def test_obj_without_texture_defaults_grey(tmp_path):
    m = load_mesh(str(_write_obj(tmp_path, with_uv=False)))
    np.testing.assert_allclose(m.colors, 0.5)
    assert m.faces.shape == (1, 3)


def test_obj_with_texture_samples_vertex_colors(tmp_path):
    cv2 = pytest.importorskip("cv2")
    obj = _write_obj(tmp_path, with_uv=True)
    # 2x2 texture: after the vertical flip, uv (0,0) lands on the BOTTOM row
    tex = np.zeros((2, 2, 3), np.uint8)
    tex[1, 0] = (100, 0, 0)      # bottom-left (BGR) -> uv (0, 0)
    tex[1, 1] = (0, 100, 0)      # bottom-right     -> uv (1, 0)
    tex[0, 0] = (0, 0, 100)      # top-left         -> uv (0, 1)
    cv2.imwrite(str(tmp_path / "tex.png"), tex)
    m = load_mesh(str(obj))
    # colors pass through the reference's x1.8 +20 adjustment, /255
    def adj(v):
        return min(v * 1.8 + 20.0, 255.0) / 255.0
    np.testing.assert_allclose(m.colors[0], [adj(100), adj(0), adj(0)],
                               atol=1e-5)
    np.testing.assert_allclose(m.colors[1], [adj(0), adj(100), adj(0)],
                               atol=1e-5)
    np.testing.assert_allclose(m.colors[2], [adj(0), adj(0), adj(100)],
                               atol=1e-5)
