"""Create a LineMOD-format dataset on disk from procedural meshes.

Produces exactly the file layout the reference (and our loader) expects —
``<root>/<model>.ply``, ``<root>/<model>/color<i>.jpg``,
``<root>/<model>/inp/depth<i>.png`` (uint16 mm), ``<root>/<model>/
pose<i>.txt`` — by rendering the mesh with our own rasterizer.  Used by the
CLI integration test and manual drives; no dataset download required.
"""

import os

import numpy as np

import jax.numpy as jnp

from pose3d_tpu.data.benchmarks import LINEMOD_K
from pose3d_tpu.ops.sphere import create_view_poses
from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.mesh import save_ply
from pose3d_tpu.render.rasterizer import render_view


def make_linemod_fixture(root: str, models=("cube", "tetra"),
                         n_frames: int = 6, z: float = 0.45,
                         size: float = 0.12) -> None:
    import cv2
    os.makedirs(root, exist_ok=True)
    K = LINEMOD_K
    fx, ox, oy = float(K[0, 0]), float(K[0, 2]), float(K[1, 2])
    # render only a window around the principal point; paste into 640x480
    sw = sh = int(fx * 0.2 / z) + 20
    x0, y0 = int(ox) - sw // 2, int(oy) - sh // 2

    for name in models:
        mesh = make_test_mesh(name, size)
        save_ply(os.path.join(root, name + ".ply"), mesh)
        d = os.path.join(root, name)
        os.makedirs(os.path.join(d, "inp"), exist_ok=True)

        # 11 inplane rots per sphere vertex (vertex-major enumeration),
        # inside the +-45 deg template range, at a 9-degree step so values
        # PAIR UP on the templates' 15-degree inplane grid (-36 and -27
        # both land nearest -30, etc).  The ceil-half split buckets real
        # frames by nearest template (dataset.py:596) — singleton buckets
        # all go to train, so paired buckets are what gives the fixture a
        # test set; and pose-oracle floors stay <= ~7 deg, so the <20-deg
        # protocol gate measures learning, not fixture geometry (a
        # 53-degree sweep here once floored the oracle itself at 27 deg)
        poses, _ = create_view_poses(1, (z, 1.0, z), (-45.0, 9.0, 45.0),
                                     True)
        poses = poses[:n_frames]
        for i, T in enumerate(poses):
            col, dep = render_view(
                jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                jnp.asarray(mesh.colors), jnp.asarray(T), jnp.asarray(K),
                width=sw, height=sh, x0=x0, y0=y0, face_chunk=16)
            color = np.zeros((480, 640, 3), np.uint8)
            depth = np.zeros((480, 640), np.uint16)
            color[y0:y0 + sh, x0:x0 + sw] = (np.asarray(col) * 255
                                             ).astype(np.uint8)
            depth[y0:y0 + sh, x0:x0 + sw] = (np.asarray(dep) * 1000
                                             ).astype(np.uint16)
            cv2.imwrite(os.path.join(d, f"color{i}.jpg"), color,
                        [cv2.IMWRITE_JPEG_QUALITY, 98])
            cv2.imwrite(os.path.join(d, "inp", f"depth{i}.png"), depth)
            np.savetxt(os.path.join(d, f"pose{i}.txt"), T, fmt="%.8f")


def write_fixture_config(path: str, root: str, hdf5: str, out: str,
                         models=("cube", "tetra")) -> None:
    names = ",".join(models)
    with open(path, "w") as f:
        f.write(f"""[paths]
dataset_path = {root}/
hdf5_path = {hdf5}/
network_path = unused/
background_path =
output_path = {out}/

[input]
dataset_name = LineMOD
models = {names}
rotInv = {",".join("0" for _ in models)}
used_models = {names}
inplane = true
use_real = true
random_background = 1

[train]
net_name = manifold_rgbd_16
gpu = false
num_epochs = 1
num_training_rounds = 1
num_bootstrapping_rounds = 1
learning_rate = 0.001
momentum = 0.9
weight_decay = 0.001
learning_policy = step
step_size = 15000
gamma = 0.9
binarization = false
binarization_epochs = 1
binarization_net_name = manifold_rgbdnor_16_bin

[output]
kNN = 3
log_name = fixture.txt
log_epoch = 1

[rebuild]
batch_size = 20
template_subdiv = 0
training_subdiv = 1
""")


if __name__ == "__main__":
    import sys
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/p3d_disk_fixture"
    make_linemod_fixture(os.path.join(base, "data"))
    write_fixture_config(os.path.join(base, "config.ini"),
                         os.path.join(base, "data"),
                         os.path.join(base, "h5"),
                         os.path.join(base, "out"))
    print(f"fixture at {base}")
