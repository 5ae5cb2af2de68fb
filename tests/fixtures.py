"""Hermetic dataset fixture: a procedural-mesh 'benchmark' rendered with our
own rasterizer stands in for LineMOD frames — the integration-test strategy
from SURVEY.md §4 (no dataset download)."""

import numpy as np
import jax.numpy as jnp

from pose3d_tpu.config import Config
from pose3d_tpu.data.benchmarks import Benchmark, Frame
from pose3d_tpu.ops.sphere import create_view_poses
from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.rasterizer import render_view

# small intrinsics/images keep CPU tests fast
FIX_K = np.array([[120.0, 0.0, 80.0],
                  [0.0, 120.0, 60.0],
                  [0.0, 0.0, 1.0]], np.float32)
FIX_W, FIX_H = 160, 120


def synthetic_benchmark(mesh, n_frames=12, z=0.45, seed=0) -> Benchmark:
    """Render the mesh from n_frames poses and package as 'real' frames.

    Frames come in PAIRS sharing a rotation but at different depths: the
    ceil-half split buckets real samples by nearest-template quaternion
    (reference src/datasetmanager.cpp:646-668), and a singleton bucket goes
    entirely to train — identical-quat pairs guarantee every bucket has two
    members, so the fixture always produces a non-empty test set."""
    half = max(1, -(-n_frames // 2))
    base, _ = create_view_poses(1, (z, 1.1, z), (0.0, 37.0, float(half)
                                                 * 37.0 - 1), True)
    base = base[:half]
    poses = []
    for T in base:
        far = T.copy()
        far[2, 3] += 0.04        # same rotation, different depth
        poses.extend([T, far])
    poses = np.asarray(poses, np.float32)[:n_frames]
    bench = Benchmark(cam=FIX_K.copy())
    for i, T in enumerate(poses):
        col, dep = render_view(jnp.asarray(mesh.vertices),
                               jnp.asarray(mesh.faces),
                               jnp.asarray(mesh.colors),
                               jnp.asarray(T), jnp.asarray(FIX_K),
                               width=FIX_W, height=FIX_H, face_chunk=16)
        color = (np.asarray(col) * 255).astype(np.uint8)
        bench.frames.append(Frame(i, color, np.asarray(dep),
                                  T.astype(np.float32)))
    return bench


def make_fixture_config(tmp_path, models=("cube", "tetra"), **overrides):
    defaults = dict(
        dataset_path=str(tmp_path) + "/",
        hdf5_path=str(tmp_path) + "/h5/",
        output_path=str(tmp_path) + "/out/",
        dataset_name="LineMOD",
        models=list(models),
        used_models=list(models),
        rot_inv=[0] * len(models),
        inplane=True,
        use_real=True,
        random_background=1,
        net_name="manifold_rgbd_16",
        num_epochs=1,
        num_training_rounds=1,
        batch_size=20,
    )
    defaults.update(overrides)
    return Config(**defaults)


_REAL_CREATE = None


def build_fixture_manager(tmp_path, monkeypatch, models=("cube", "tetra"),
                          subdiv_tmpl=0, **overrides):
    """A DatasetManager wired to procedural meshes and synthetic frames,
    with small spheres for speed (subdiv 0 -> 12 verts)."""
    global _REAL_CREATE
    from pose3d_tpu.data import dataset as ds

    cfg = make_fixture_config(tmp_path, models, **overrides)
    meshes = {m: make_test_mesh(m, 0.1) for m in models}

    monkeypatch.setattr(
        ds, "load_benchmark",
        lambda name, root, seq, count=-1: synthetic_benchmark(meshes[seq]))
    monkeypatch.setattr(
        ds.DatasetManager, "_load_model",
        lambda self, name: meshes[name])

    if _REAL_CREATE is None:
        _REAL_CREATE = ds.create_synth_samples
    real_create = _REAL_CREATE

    def small_synth(mesh, cam, idx, subdiv, inplane, scale_z=0.45):
        # subdiv 2/3 -> 0/1 to keep the fixture quick; scale matches frames
        return real_create(mesh, cam, idx, subdiv - 2 + subdiv_tmpl,
                           inplane, scale_z=scale_z)

    monkeypatch.setattr(ds, "create_synth_samples", small_synth)
    return ds.DatasetManager(cfg), cfg


_DB_CACHE = {}


def fixture_db(tmp_path_factory_or_path, monkeypatch):
    """Session-cached generated dataset: generation compiles several XLA
    programs, so build it once per process and keep the HDF5 caches in a
    fixed /tmp dir so later pytest *processes* skip generation entirely
    (the DatasetManager regenerates only missing caches, like the
    reference)."""
    if "db" not in _DB_CACHE:
        from pathlib import Path
        base = Path("/tmp/p3d_fixture_cache")
        base.mkdir(exist_ok=True)
        db, cfg = build_fixture_manager(base, monkeypatch)
        db.generate_datasets()
        _DB_CACHE["db"] = (db, cfg)
    return _DB_CACHE["db"]


def _mixed_soup(seed):
    """Adversarial random soup: small, tile-spanning and >2x2-tile faces
    plus a near-plane-invalid face and zero-area degenerates."""
    rng = np.random.default_rng(seed)
    verts, faces, colors = [], [], []

    def tri(pts):
        base = len(verts)
        verts.extend([list(map(float, p)) for p in pts])
        faces.append([base, base + 1, base + 2])
        colors.extend(rng.uniform(0, 1, size=(3, 3)).tolist())

    for _ in range(40):                        # few-pixel faces
        c = rng.uniform(-0.25, 0.25, size=2)
        z = rng.uniform(-0.05, 0.05)
        d = rng.uniform(-0.02, 0.02, size=(3, 2))
        tri([[c[0] + d[i, 0], c[1] + d[i, 1], z] for i in range(3)])
    for _ in range(10):                        # tile-spanning faces
        c = rng.uniform(-0.2, 0.2, size=2)
        z = rng.uniform(-0.05, 0.05)
        d = rng.uniform(-0.09, 0.09, size=(3, 2))
        tri([[c[0] + d[i, 0], c[1] + d[i, 1], z] for i in range(3)])
    for _ in range(6):                         # global-section faces
        c = rng.uniform(-0.1, 0.1, size=2)
        z = rng.uniform(-0.05, 0.05)
        s = 0.17
        tri([[c[0] - s, c[1] - s, z], [c[0] + s, c[1] - s, z],
             [c[0], c[1] + s, z]])
    # near-plane-invalid face whose clamped projection covers the window
    # center; must not rasterize at all
    tri([[-0.02, -0.02, -0.3495], [0.1, 0.0, -0.05], [0.0, 0.1, -0.05]])
    # zero-area degenerates: repeated vertex and collinear
    tri([[0.05, 0.05, 0.0]] * 3)
    tri([[-0.1, 0.0, 0.01], [0.0, 0.0, 0.01], [0.1, 0.0, 0.01]])
    return (jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
            jnp.asarray(colors, jnp.float32))
