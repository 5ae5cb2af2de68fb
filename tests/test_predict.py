"""Serving-path retrieval (eval/predict.py).

Exercises the packaged inference pipeline the reference only ships inside
its batch evaluation (kNN over templates, reference
src/networkevaluator.cpp:178-246): index build, descriptor retrieval, and
the full frame -> patch -> descriptor -> top-k pose path."""

import numpy as np

import jax.numpy as jnp

from pose3d_tpu.data.benchmarks import LINEMOD_K
from pose3d_tpu.data.dataset import create_synth_samples
from pose3d_tpu.eval.predict import (build_template_index,
                                     predict_from_frame,
                                     predict_from_patches)
from pose3d_tpu.models import NETWORKS, init_params
from pose3d_tpu.models.manifold import descriptor_fn
from pose3d_tpu.ops.quaternion import angular_distance
from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.rasterizer_tiled import render_view_tiled


def _index_and_templates(mesh, class_idx=0, subdiv=1):
    spec = NETWORKS["manifold_rgbd_16"]
    fn = descriptor_fn(spec)
    params = init_params(__import__("jax").random.key(0), spec)
    tmpl = create_synth_samples(mesh, np.asarray(LINEMOD_K), class_idx,
                                subdiv, False)
    index = build_template_index(fn, params, jnp.asarray(tmpl.patches),
                                 jnp.asarray(tmpl.labels))
    return fn, params, index, tmpl


def test_self_retrieval_is_exact():
    mesh = make_test_mesh("cube", 0.1)
    fn, params, index, tmpl = _index_and_templates(mesh)

    q = jnp.asarray(tmpl.patches[5:8])
    classes, quats, trans, dists = predict_from_patches(
        fn, params, index, q, k=3)
    assert classes.shape == (3, 3) and quats.shape == (3, 3, 4)
    # identical patch -> (near-)identical descriptor -> itself on top.
    # XLA CPU's fast-math conv differs ~1e-3 between batch shapes, so the
    # self-distance is near-zero, not exactly zero.
    assert float(jnp.max(dists[:, 0])) < 0.05
    for i, t in enumerate(range(5, 8)):
        assert int(classes[i, 0]) == 0
        np.testing.assert_allclose(np.asarray(quats[i, 0]),
                                   tmpl.labels[t, 1:5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(trans[i, 0]),
                                   tmpl.labels[t, 5:8], atol=1e-6)


def test_frame_prediction_recovers_template_pose():
    """Render a full 640x480 frame at a known template pose; the serving
    path must retrieve (nearly) that pose from the frame."""
    mesh = make_test_mesh("torus", 0.12, detail=2)
    fn, params, index, tmpl = _index_and_templates(mesh)

    t = 7                                   # arbitrary template
    quat_true = tmpl.labels[t, 1:5]
    # reconstruct the view pose from the label contract:
    # label trans = inverse translation -> pose t = -label_trans
    from pose3d_tpu.ops.quaternion import matrix_from_quat
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(matrix_from_quat(jnp.asarray(quat_true)))
    T[:3, 3] = -tmpl.labels[t, 5:8]

    K = jnp.asarray(LINEMOD_K)
    color, depth = render_view_tiled(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
        jnp.asarray(mesh.colors), jnp.asarray(T), K, width=640, height=480)

    z = float(T[2, 3])
    centers = jnp.asarray(
        [[float(LINEMOD_K[0, 2]), float(LINEMOD_K[1, 2]), z]], jnp.float32)
    classes, quats, trans, dists = predict_from_frame(
        fn, params, index, color * 255.0, depth, np.asarray(LINEMOD_K),
        centers, k=3)

    assert int(classes[0, 0]) == 0
    ang = float(angular_distance(quats[0, 0], jnp.asarray(quat_true)))
    assert ang < 10.0, f"retrieved pose {ang:.1f} deg off"
