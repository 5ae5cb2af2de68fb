"""Dataset orchestration: generation, caching, splits, similarity tables.

The TPU-native ``datasetManager`` (reference include/datasetmanager.h:34-89,
src/datasetmanager.cpp:539-800).  Host code orchestrates file I/O and
assembles *device-resident* sample tensors; every O(N*M) pose search the
reference runs as scalar CPU loops is a one-shot XLA top-k program.

Pipeline (generateDatasets, reference :603-685):
  1. per model with missing caches: load mesh -> load benchmark -> extract
     real samples -> render synthetic templates/training views -> write the
     three HDF5 caches (byte-compatible, data/hdf5cache.py);
  2. read caches; assign each real sample to its nearest template by
     quaternion angular distance; split each template bucket ceil-half into
     train (if use_real), rest into test (:631-660);
  3. load LineMOD hard negatives (negs_<m>.h5) when present (:666-667);
  4. crop all per-object sets to the global minimum count and shuffle
     (:670-680);
  5. top-2 most-similar-template table (inplane: quaternion distance; else
     translation dot) (:683-684).

Synthetic views (createSynthSamplesWadim, reference :498-537): icosphere
subdiv 2 for templates / 3 for training, scale 0.4 m, in-plane -45..45
step 15 when ``inplane``; rendering happens in a clipped window of the
metric 0.2 m crop (+ a 4 px border for the normal neighborhood) instead of
the full 640x480 frame — the patch content is identical because the patch
sampler never reads outside that window when the object is at the principal
point.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, replace as dc_replace
from functools import lru_cache, partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pose3d_tpu.config import Config
from pose3d_tpu.data import hdf5cache
from pose3d_tpu.data.benchmarks import Benchmark, load_benchmark
from pose3d_tpu.ops import quaternion as Q
from pose3d_tpu.ops.geometry import depth2normals, depth2normals_at
from pose3d_tpu.ops.patch import sample_patch, sample_patches
from pose3d_tpu.ops.sphere import create_view_poses
from pose3d_tpu.render.mesh import Mesh, front_sign, load_mesh

log = logging.getLogger(__name__)

ELEV_GATE = 0.2   # rad; rotInv pusher elevation constraint
                  # (reference src/networksolver.cpp:84)


@dataclass
class SampleSet:
    patches: np.ndarray    # [N, 64, 64, 7] float32
    labels: np.ndarray     # [N, 8] float32

    def __len__(self):
        return len(self.patches)


@partial(jax.tree_util.register_dataclass,
         data_fields=["train_patches", "train_labels", "tmpl_patches",
                      "tmpl_labels", "test_patches", "test_labels",
                      "max_sim_tmpl", "rot_inv", "elev_ok", "hard_negs",
                      "hard_neg_count"],
         meta_fields=[])
@dataclass
class DeviceData:
    """Everything the jitted train/eval programs need, resident on device."""
    train_patches: jnp.ndarray       # [O, Ntr, 64, 64, 7]
    train_labels: jnp.ndarray        # [O, Ntr, 8]
    tmpl_patches: jnp.ndarray        # [O, T, 64, 64, 7]
    tmpl_labels: jnp.ndarray         # [O, T, 8]
    test_patches: jnp.ndarray        # [O, Nte, 64, 64, 7]
    test_labels: jnp.ndarray         # [O, Nte, 8]
    max_sim_tmpl: jnp.ndarray        # [O, Ntr, 2] int32
    rot_inv: jnp.ndarray             # [O] int32
    elev_ok: jnp.ndarray             # [O, T, T] bool: |elev_i - elev_j| >= 0.2
    hard_negs: jnp.ndarray           # [O, M, 64, 64, 7] (M may be 0)
    hard_neg_count: jnp.ndarray      # [O] int32

    @property
    def nr_objects(self) -> int:
        return self.train_patches.shape[0]

    @property
    def nr_training_poses(self) -> int:
        return self.train_patches.shape[1]

    @property
    def nr_template_poses(self) -> int:
        return self.tmpl_patches.shape[1]


def with_extra_train(data: DeviceData, extra_patches, extra_labels,
                     inplane: bool = True) -> DeviceData:
    """Return ``data`` with extra rendered views appended to the training
    set (pose axis) and the top-2 similar-template table recomputed over
    the union in one program.

    The reference trains every head on the fixed 15-degree in-plane grid
    (createSynthSamplesWadim, reference src/datasetmanager.cpp:498-537) —
    re-rendering a denser grid there means another pass through the serial
    GL pipeline, so it never does.  Here synthetic views are a cheap
    batched device render, which makes pose-densified training sets (e.g.
    the 5-degree in-plane grid of the binarization head's grid-sparsity
    ablation, LEARNING_BIN_r5.json) a one-call transform.  Templates, test set, elevation gates and hard negatives
    are untouched; only ``train_*`` and ``max_sim_tmpl`` change.

    ``extra_patches`` [O, Na, 64, 64, 7] (host or device; cast to the
    resident storage dtype), ``extra_labels`` [O, Na, 8].
    """
    extra_patches = jnp.asarray(extra_patches, data.train_patches.dtype)
    extra_labels = jnp.asarray(extra_labels, data.train_labels.dtype)
    train_p = jnp.concatenate([data.train_patches, extra_patches], axis=1)
    train_l = jnp.concatenate([data.train_labels, extra_labels], axis=1)
    if inplane:
        max_sim = Q.top2_similar_templates_all(
            train_l[:, :, 1:5], data.tmpl_labels[:, :, 1:5])
    else:
        max_sim = Q.top2_similar_templates_trans_all(
            train_l[:, :, 5:8], data.tmpl_labels[:, :, 5:8])
    return dc_replace(data, train_patches=train_p, train_labels=train_l,
                      max_sim_tmpl=max_sim)


def poses_to_labels(class_idx: int, poses: np.ndarray) -> np.ndarray:
    """Batched 8-float label construction [V, 4, 4] -> [V, 8] on host numpy
    (one call, no per-pose device round trips — those cost seconds each
    through a tunneled device)."""
    poses = np.asarray(poses, np.float32).reshape(-1, 4, 4)
    R = poses[:, :3, :3]
    q = _quat_from_matrix_np(R)
    inv_t = -np.einsum("nij,nj->ni", np.transpose(R, (0, 2, 1)),
                       poses[:, :3, 3])
    lab = np.empty((len(poses), 8), np.float32)
    lab[:, 0] = class_idx
    lab[:, 1:5] = q
    lab[:, 5:8] = inv_t
    return lab


def _quat_from_matrix_np(R: np.ndarray) -> np.ndarray:
    """NumPy twin of ops.quaternion.quat_from_matrix (x, y, z, w order)."""
    m00, m01, m02 = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
    m10, m11, m12 = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
    m20, m21, m22 = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]
    tr = m00 + m11 + m22
    qw = np.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=1)
    qx = np.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                  axis=1)
    qy = np.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21],
                  axis=1)
    qz = np.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22],
                  axis=1)
    cand = np.stack([qw, qx, qy, qz], axis=1)          # [N, 4, 4] (w,x,y,z)
    pivots = np.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                       1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=1)
    best = np.argmax(pivots, axis=1)
    chosen = cand[np.arange(len(R)), best]
    wxyz = chosen / np.linalg.norm(chosen, axis=1, keepdims=True)
    return np.concatenate([wxyz[:, 1:], wxyz[:, :1]], axis=1)


def pose_to_label(class_idx: int, pose: np.ndarray) -> np.ndarray:
    return poses_to_labels(class_idx, np.asarray(pose)[None])[0]


def extract_real_samples(bench: Benchmark, class_idx: int,
                         model_centroid: Optional[np.ndarray],
                         dataset_name: str, chunk: int = 16) -> SampleSet:
    """extractRealSamplesPaul (reference src/datasetmanager.cpp:348-379):
    patch center = projected object centroid, z = centroid depth."""
    cam = bench.cam
    fx, fy = float(cam[0, 0]), float(cam[1, 1])

    patches = []
    labels = []
    for start in range(0, len(bench.frames), chunk):
        frames = bench.frames[start:start + chunk]
        cols = np.stack([f.color.astype(np.float32) for f in frames])
        deps = np.stack([f.depth for f in frames])
        cxs, cys, zs = [], [], []
        for f in frames:
            if dataset_name == "BigBIRD" and model_centroid is not None:
                centroid = f.pose[:3, :3] @ model_centroid + f.pose[:3, 3]
            else:
                centroid = f.pose[:3, 3]
            proj = cam @ centroid
            cxs.append(proj[0] / proj[2])
            cys.append(proj[1] / proj[2])
            zs.append(centroid[2])
            labels.append(pose_to_label(class_idx, f.pose))
        nors = jax.vmap(lambda d: depth2normals(d, fx, fy))(jnp.asarray(deps))
        batch = sample_patches(jnp.asarray(cols), jnp.asarray(deps), nors,
                               jnp.asarray(cxs, jnp.float32),
                               jnp.asarray(cys, jnp.float32),
                               jnp.asarray(zs, jnp.float32), fx=fx, fy=fy)
        patches.append(np.asarray(batch))
    return SampleSet(np.concatenate(patches), np.stack(labels))


def extract_real_samples_wadim(bench: Benchmark, class_idx: int,
                               chunk: int = 16) -> SampleSet:
    """extractRealSamplesWadim (reference src/datasetmanager.cpp:381-411):
    like Paul but the patch z is the *surface* depth read at the projected
    translation instead of the centroid depth.  Library function — not on
    the default path, same as the reference."""
    cam = bench.cam
    fx, fy = float(cam[0, 0]), float(cam[1, 1])
    patches, labels = [], []
    for start in range(0, len(bench.frames), chunk):
        frames = bench.frames[start:start + chunk]
        cols = np.stack([f.color.astype(np.float32) for f in frames])
        deps = np.stack([f.depth for f in frames])
        cxs, cys, zs = [], [], []
        for f in frames:
            proj = cam @ f.pose[:3, 3]
            u, v = proj[0] / proj[2], proj[1] / proj[2]
            z = float(f.depth[int(v), int(u)])
            if z <= 0.0:
                raise ValueError(
                    f"frame {f.nr}: no surface depth at projected center")
            cxs.append(u)
            cys.append(v)
            zs.append(z)
            labels.append(pose_to_label(class_idx, f.pose))
        nors = jax.vmap(lambda d: depth2normals(d, fx, fy))(jnp.asarray(deps))
        batch = sample_patches(jnp.asarray(cols), jnp.asarray(deps), nors,
                               jnp.asarray(cxs, jnp.float32),
                               jnp.asarray(cys, jnp.float32),
                               jnp.asarray(zs, jnp.float32), fx=fx, fy=fy)
        patches.append(np.asarray(batch))
    return SampleSet(np.concatenate(patches), np.stack(labels))


def extract_synth_samples_benjamin(path: str, cam: np.ndarray,
                                   sequence: str,
                                   class_idx: int) -> SampleSet:
    """extractSynthSamplesBenjamin (reference src/datasetmanager.cpp:
    220-296): pre-rendered simulated frames -> centroid-projected patches."""
    from pose3d_tpu.data.benchmarks import load_benjamin
    bench = load_benjamin(path, sequence)
    bench.cam = np.asarray(cam, np.float32)
    return extract_real_samples(bench, class_idx, None, "Benjamin")


def _synth_window(cam: np.ndarray, scale_z: float):
    fx, fy = float(cam[0, 0]), float(cam[1, 1])
    ox, oy = float(cam[0, 2]), float(cam[1, 2])
    m = 0.2
    border = 4
    sw = int(fx * m / scale_z) + 2 * border
    sh = int(fy * m / scale_z) + 2 * border
    return sw, sh, int(ox) - sw // 2, int(oy) - sh // 2, ox, oy


def create_synth_samples(mesh: Mesh, cam: np.ndarray, class_idx: int,
                         subdiv: int, inplane: bool,
                         scale_z: float = 0.4,
                         to_host: bool = True,
                         n_shards: int = 1,
                         out_dtype: str = "float32",
                         rots: Optional[tuple] = None) -> SampleSet:
    """createSynthSamplesWadim (reference src/datasetmanager.cpp:498-537),
    rendering each view only inside the metric-crop window.

    ``n_shards > 1`` splits the view chunks over a dp device mesh
    (see _render_program) — generation scales ~linearly with chips.
    ``rots`` overrides the (start, step, stop) in-plane grid — e.g. a
    shifted grid renders held-out query poses for validation fixtures."""
    if rots is None:
        rots = (-45.0, 15.0, 45.0) if inplane else (0.0, 15.0, 10.0)
    poses, _ = create_view_poses(subdiv, (scale_z, 1.1, 1.0), rots, True)

    sw, sh, x0, y0, ox, oy = _synth_window(cam, scale_z)
    patches = _render_patches(mesh, cam, poses, sw, sh, x0, y0,
                              ox, oy, scale_z, to_host=to_host,
                              n_shards=n_shards, out_dtype=out_dtype)
    return SampleSet(patches, poses_to_labels(class_idx, poses))


def create_synth_samples_pair(mesh: Mesh, cam: np.ndarray, class_idx: int,
                              subdiv_tmpl: int, subdiv_train: int,
                              inplane: bool, scale_z: float = 0.4,
                              to_host: bool = True,
                              defer_overflow: bool = False,
                              n_shards: int = 1,
                              views_per_call: int | None = None,
                              out_dtype: str = "float32"):
    """Templates + training views of one mesh in ONE render invocation.

    Behaviorally identical to two ``create_synth_samples`` calls (same
    windows, same per-view programs), but the concatenated pose batch
    shares one capacity probe, one compiled render program (one
    chunk-count shape instead of two) and one overflow check — on a
    tunneled device each extra compiled program costs ~25-30 s of
    per-process executable load, which dominated generation wall time.

    ``defer_overflow=True`` (requires ``to_host=False``) returns
    ``(tmpl_set, train_set, overflow_scalar, retry)`` without any host
    sync — see _render_patches; callers fetch every mesh's flag in one
    round trip and call ``retry()`` (which returns a fresh
    ``(tmpl_set, train_set)``) only for meshes that overflowed.
    """
    rots = (-45.0, 15.0, 45.0) if inplane else (0.0, 15.0, 10.0)
    poses_t, _ = create_view_poses(subdiv_tmpl, (scale_z, 1.1, 1.0), rots,
                                   True)
    poses_s, _ = create_view_poses(subdiv_train, (scale_z, 1.1, 1.0), rots,
                                   True)
    nt = len(poses_t)
    sw, sh, x0, y0, ox, oy = _synth_window(cam, scale_z)
    poses_all = np.concatenate([poses_t, poses_s])

    def split(patches):
        return (SampleSet(patches[:nt], poses_to_labels(class_idx, poses_t)),
                SampleSet(patches[nt:],
                          poses_to_labels(class_idx, poses_s)))

    if defer_overflow:
        patches, overflow, retry_render = _render_patches(
            mesh, cam, poses_all, sw, sh, x0, y0, ox, oy, scale_z,
            to_host=to_host, defer_overflow=True, n_shards=n_shards,
            views_per_call=views_per_call, out_dtype=out_dtype)
        return split(patches) + (overflow, lambda: split(retry_render()))

    patches = _render_patches(mesh, cam, poses_all, sw, sh, x0, y0, ox, oy,
                              scale_z, to_host=to_host, n_shards=n_shards,
                              views_per_call=views_per_call,
                              out_dtype=out_dtype)
    return split(patches)


def _pow2_at_least(n: int, floor: int) -> int:
    return max(floor, 1 << (max(n, 1) - 1).bit_length())


def _speculative_capacity(backend: str, bucket: int, f_floor: int,
                          cap_floor: int) -> tuple[int, int]:
    """(capacity, global_capacity) for a deferred-overflow render.

    On TPU the capacity scales with the FACE BUCKET: per-tile overlap
    grows ~linearly with face density at a fixed screen size, so the flat
    floor (sized for <=2048-face LineMOD-density meshes) would make every
    dense mesh (e.g. a subdiv-4 icosphere, 5120 faces) overflow and pay a
    probe sync + a full re-render + one more program-variant load through
    the tunnel.  Deriving the scale from the bucket (not exact F) keeps
    the program count at one per bucket.  CPU keeps the flat floor: its
    tight buckets would over-allocate ~8x, and with local compiles + no
    executable-load tax the overflow retry it avoids is cheap there.

    The GLOBAL section (faces spanning >2x2 tiles) does NOT scale with
    the bucket: denser meshes have SMALLER faces, so their >2x2-tile
    population shrinks rather than grows — scaling it quadrupled the
    kernel's per-tile global walk (gch grid steps) for exactly the
    meshes that need it least.  A dense mesh that truly has many large
    faces overflows loudly and retries through the probing path.
    """
    scale = max(1, bucket // f_floor) if backend == "tpu" else 1
    return cap_floor * scale, cap_floor if backend == "tpu" else 256


def _patch_from_slots(dep, slot, pair_faces, attrs, texture, textured,
                      oxw, oyw, z, fx, fy):
    """Patch extraction straight from (depth, winner slots) of ONE view.

    Evaluates face colors ONLY at the <=(2*64)^2 resample tap pixels of
    the patch instead of the full window: the full-window color attribute
    epilogue was ~60%% of fused generation-program time
    (PROFILE_GEN_r3.json fused 1.64 vs z-buffer ~0.5 ms/view) while the
    64x64 bilinear resample reads at most 128x128 source pixels.  Color
    needs no halo (unlike normals, whose depth stencil keeps running on
    the full window — it is cheap VPU work).  Identical to rendering the
    full window and calling sample_patch up to one f32 ulp of fma
    contraction, with the depth channel (the background-mask bit) exact
    (tests/test_rasterizer_pallas::test_slot_sparse_patch_bit_identical).
    """
    from pose3d_tpu.ops.patch import combine_patch_taps, patch_tap_grids
    from pose3d_tpu.render.rasterizer_pallas import eval_color_taps
    from pose3d_tpu.render.texture import sample_texture_nearest
    H, W = dep.shape
    gx0, gx1, ax, gy0, gy1, ay, gxn, gyn = patch_tap_grids(
        H, W, oxw, oyw, z, fx, fy)
    ys = jnp.concatenate([gy0, gy1])
    xs = jnp.concatenate([gx0, gx1])
    dep_sub = dep[ys][:, xs]
    slot_sub = slot[ys][:, xs]
    xw = xs.astype(jnp.float32) + 0.5 - W * 0.5   # window-centered coords,
    yw = ys.astype(jnp.float32) + 0.5 - H * 0.5   # as the kernel saw them
    col_sub = eval_color_taps(slot_sub, dep_sub, pair_faces, attrs, xw, yw)
    if textured:
        rgb = sample_texture_nearest(col_sub[..., 0], col_sub[..., 1],
                                     texture)
        col_sub = jnp.where((dep_sub > 0.0)[..., None], rgb, 0.0)
    # normals ONLY at the tap pixels: the 9-tap plane fit gathers its own
    # neighborhoods, so the full-window normal map (the dominant VPU term
    # of this epilogue) never materializes — bit-identical to indexing it
    nor_sub = depth2normals_at(dep, ys, xs, fx, fy)
    six_sub = jnp.concatenate([col_sub * 255.0, nor_sub], axis=-1)
    d_near = dep[gyn[:, None], gxn[None, :]]
    return combine_patch_taps(six_sub, d_near, ax, ay, z)


@lru_cache(maxsize=32)
def _render_program(backend: str, textured: bool, sw: int, sh: int,
                    x0: int, y0: int, tile: int, capacity: int,
                    global_cap: int, fx: float, fy: float,
                    n_shards: int = 1, out_dtype: str = "float32"):
    """Compile-once render -> normals -> patch program.

    Mesh data (vertices / faces / colors / texture) enters as ARGUMENTS
    with pow2-bucketed shapes, so every mesh sharing a bucket reuses one
    compiled program — per-call closures rebuild the jit cache (and pay a
    fresh XLA compile) for every object.  The whole multi-chunk view loop
    runs on device under one dispatch: the tunnel charges ~100 ms latency
    per transfer, so a host loop over 8-view chunks is dispatch-bound.

    ``n_shards > 1`` runs the chunk loop under ``shard_map`` over a
    ``dp`` mesh of the first ``n_shards`` devices: the chunk axis splits
    across devices (mesh geometry replicated — it is tiny next to the
    rendered windows), each device scans its local chunks, and the
    overflow flag is an ICI ``pmax``.  Views are embarrassingly parallel
    (the reference renders them in a serial GL loop,
    src/painter.cpp:87-112), so generation scales ~linearly with chips.

    Returns (patches [C, Vc, 64, 64, 7], overflow bool scalar) where
    overflow reports any dropped geometry (tile-capacity or global-section
    overflow) across all chunks — callers re-render at a bigger capacity.
    ``out_dtype`` is the patches' storage dtype (cast per chunk inside the
    program): resident-training pipelines render straight to bf16.
    """
    # executed only on an lru_cache MISS — this is the compile event; a
    # datasets with per-object cameras/windows would otherwise silently
    # defeat the memoization with no signal
    log.debug("render program compile: backend=%s textured=%s window=%dx%d"
              "+%d+%d tile=%d capacity=%d global=%d fx=%.2f fy=%.2f",
              backend, textured, sw, sh, x0, y0, tile, capacity,
              global_cap, fx, fy)
    from pose3d_tpu.render.rasterizer_tiled import render_view_tiled
    from pose3d_tpu.render.rasterizer_pallas import \
        render_views_slots_pallas
    from pose3d_tpu.render.texture import sample_texture_nearest

    def _post(col, dep, texture, oxw, oyw, z):
        if textured:
            rgb = sample_texture_nearest(col[..., 0], col[..., 1], texture)
            col = jnp.where((dep > 0.0)[..., None], rgb, 0.0)
        nor = depth2normals(dep, fx, fy)
        # window-local center coordinates
        return sample_patch(col * 255.0, dep, nor, oxw, oyw, z,
                            fx=fx, fy=fy)

    # Pallas inner loop with empty-chunk skipping on TPU, batched over the
    # view axis (one vmapped sort/bin/pack + one kernel grid per chunk) and
    # the slot-sparse patch path (colors evaluated only at the patch taps);
    # interpret mode is too slow for CPU runs, which take the XLA path
    if backend == "tpu":
        def chunk_patches(verts, faces, colors, K, pose_chunk, texture,
                          oxw, oyw, z, fs):
            dep, slot, pf, attrs, ovf = render_views_slots_pallas(
                verts, faces, colors, pose_chunk, K, width=sw, height=sh,
                x0=x0, y0=y0, tile=tile, capacity=capacity,
                # fc=128 beats 256 by ~12% at LineMOD density (finer
                # segment granularity outweighs the extra grid steps;
                # measured 0.41 vs 0.47 ms/view over 3 reps)
                face_chunk=128, global_capacity=global_cap,
                front_sign=fs)
            pats = jax.vmap(
                lambda d, s, p, a: _patch_from_slots(
                    d, s, p, a, texture, textured, oxw, oyw, z, fx, fy)
            )(dep, slot, pf, attrs)
            return pats, ovf
    else:
        def chunk_patches(verts, faces, colors, K, pose_chunk, texture,
                          oxw, oyw, z, fs):
            def one(pose):
                return render_view_tiled(verts, faces, colors, pose, K,
                                         width=sw, height=sh, x0=x0, y0=y0,
                                         tile=tile, capacity=capacity,
                                         face_chunk=256,
                                         global_capacity=global_cap,
                                         return_overflow=True,
                                         front_sign=fs)
            col, dep, ovf = jax.lax.map(one, pose_chunk)
            pats = jax.vmap(
                lambda c, d: _post(c, d, texture, oxw, oyw, z))(col, dep)
            return pats, jnp.any(ovf)

    def render_body(verts, faces, colors, K, pose_chunks, texture,
                    oxw, oyw, z, fs):
        def chunk(pc):
            pats, ovf = chunk_patches(verts, faces, colors, K, pc, texture,
                                      oxw, oyw, z, fs)
            # storage-dtype cast INSIDE the per-chunk body: a bf16-resident
            # pipeline (train/solver gathers cast back to f32 per batch)
            # then never materializes the f32 patch set — at 15 objects x
            # subdiv 3 that is ~2.5 GB of HBM growth during generation and
            # a whole conversion pass after it
            return pats.astype(jnp.dtype(out_dtype)), ovf
        patches, ovfs = jax.lax.map(chunk, pose_chunks)
        return patches, jnp.any(ovfs)

    if n_shards > 1:
        from jax.sharding import PartitionSpec as P
        from pose3d_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_shards)

        def sharded(verts, faces, colors, K, pose_chunks, texture,
                    oxw, oyw, z, fs):
            patches, ovf = render_body(verts, faces, colors, K,
                                       pose_chunks, texture, oxw, oyw, z,
                                       fs)
            # per-shard flag vector; reduced OUTSIDE the shard_map (the
            # any() over n_shards scalars costs nothing and avoids
            # collective/replication bookkeeping inside the mapped body)
            return patches, ovf[None]

        # check_vma=False: the shared rasterizer scans seed their carries
        # from replicated pixel grids and accumulate device-varying values
        # (each shard renders its own chunks) — sound SPMD, but the vma
        # analysis would require pcasts threaded through every scan init.
        # Bitwise 1-dev/8-dev parity is asserted in tests/test_parallel.py.
        smapped = jax.shard_map(
            sharded, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("dp"), P(), P(), P(), P(),
                      P()),
            out_specs=(P("dp"), P("dp")), check_vma=False)

        @jax.jit
        def render_all(verts, faces, colors, K, pose_chunks, texture,
                       oxw, oyw, z, fs):
            patches, ovf = smapped(verts, faces, colors, K, pose_chunks,
                                   texture, oxw, oyw, z, fs)
            return patches, jnp.any(ovf)

        return render_all

    return jax.jit(render_body)


def _render_patches(mesh: Mesh, cam: np.ndarray, poses: np.ndarray,
                    sw: int, sh: int, x0: int, y0: int,
                    ox: float, oy: float, z: float,
                    views_per_call: int | None = None,
                    to_host: bool = True,
                    defer_overflow: bool = False,
                    n_shards: int = 1,
                    out_dtype: str = "float32"):
    """Render -> normals -> patch for a pose batch, staying on device under
    one dispatch per mesh (see _render_program).

    Uses the tile-culled rasterizer with the per-tile face capacity sized
    by ONE batched device probe over a spread of 8 poses (x1.5 margin;
    rounded so similar meshes share a compiled program); the render
    program reports capacity overflow, on which the render retries at
    doubled capacity instead of silently dropping geometry.

    ``defer_overflow=True`` (requires ``to_host=False``) removes BOTH
    per-mesh host syncs from the loop: the render is dispatched
    speculatively at the shared floor capacity (no probe) and the
    function returns ``(patches, overflow_scalar, retry)`` WITHOUT
    fetching the flag — callers render every mesh back-to-back, fetch all
    flags in ONE round trip, and call ``retry()`` (the blocking
    probe+resize path) only for offenders.  Through the tunnel each
    avoided sync is ~0.1-2 s; the device pipelines the queued renders."""
    from pose3d_tpu.render.rasterizer_tiled import probe_capacity
    fx, fy = float(cam[0, 0]), float(cam[1, 1])
    backend = jax.default_backend()
    # bucket the face AND vertex counts (pad with degenerate geometry) so
    # meshes of similar size share one compiled render program.  On TPU
    # the floors are COARSE (2048 faces / 1024 verts) and the capacity
    # floor below is 512: every small-to-mid mesh then shares literally
    # one program — each distinct program costs ~25-30 s of per-process
    # executable load through the tunnel, which dominated generation.
    # CPU compiles locally and keeps tight buckets.
    f_floor, v_floor, cap_floor = ((2048, 1024, 512) if backend == "tpu"
                                   else (256, 128, 256))
    F = len(mesh.faces)
    bucket = _pow2_at_least(F, f_floor)
    faces_np = np.concatenate(
        [mesh.faces, np.zeros((bucket - F, 3), np.int32)]) \
        if bucket > F else mesh.faces
    Nv = len(mesh.vertices)
    vbucket = _pow2_at_least(Nv, v_floor)
    verts_np = np.concatenate(
        [mesh.vertices, np.zeros((vbucket - Nv, 3), np.float32)]) \
        if vbucket > Nv else mesh.vertices
    verts = jnp.asarray(verts_np)
    faces = jnp.asarray(faces_np)
    # per-pixel texturing: interpolate (u, v) through the color rows and
    # gather texels in the epilogue (render/texture.py; the GL texturing of
    # reference src/model.cpp:29-71) — else interpolate vertex colors
    textured = mesh.texture is not None and mesh.tcoords is not None
    if textured:
        texture = jnp.asarray(mesh.texture)
        colors_np = np.concatenate(
            [mesh.tcoords,
             np.zeros((len(mesh.tcoords), 1), np.float32)], axis=1)
    else:
        texture = jnp.zeros((1, 1, 3), jnp.float32)
        colors_np = mesh.colors
    if vbucket > Nv:
        colors_np = np.concatenate(
            [colors_np, np.zeros((vbucket - Nv, 3), np.float32)])
    colors = jnp.asarray(colors_np)
    K = jnp.asarray(cam)

    # backface culling when proven safe (closed oriented mesh,
    # render.mesh.front_sign): ~halves the pair-kernel's face-tile
    # incidences — its measured cost driver.  Output-identical up to the
    # rasterizer's silhouette coverage-tolerance slivers (~1e-5 of patch
    # elements; tests/test_cull.py).  Traced scalar (0.0 = off), so
    # culled and unculled meshes share one compiled program.
    fsj = jnp.float32(front_sign(mesh))

    tile = 32
    if defer_overflow:
        if to_host:
            raise ValueError("defer_overflow requires to_host=False")
        # speculative, no per-mesh probe sync: capacity from the face
        # bucket (see _speculative_capacity); an even denser mesh still
        # just flags overflow and retries via the probing path below
        capacity, global_cap = _speculative_capacity(
            backend, bucket, f_floor, cap_floor)
    else:
        # capacity rounds to 512-multiples: coarse enough to bound compiled
        # program variants, fine enough not to inflate the per-tile gather
        # (pow2 rounding would double it for mid-density meshes,
        # e.g 2304->4096).  Size from a SPREAD of poses, not just poses[0]:
        # per-tile overlap varies with in-plane rotation.  The probe is ONE
        # jitted dispatch + one two-scalar fetch — per-pose host loops here
        # cost 16 host-synced round trips per mesh, seconds each through a
        # tunneled device.
        pr = poses[:: max(1, len(poses) // 8)][:8]
        if len(pr) < 8:
            pr = np.concatenate([pr, np.tile(pr[-1:], (8 - len(pr), 1, 1))])
        mo, nl = jax.device_get(probe_capacity(
            verts, faces, jnp.asarray(np.asarray(pr, np.float32)), K,
            width=sw, height=sh, x0=x0, y0=y0, tile=tile, front_sign=fsj))
        capacity = max(cap_floor,
                       -(-int(np.ceil(int(mo) * 1.5)) // 512) * 512)
        # size the binning's shared >2x2-tile face section the same way
        # (coarse meshes near the camera can exceed the 256 default); on TPU
        # the floor matches cap_floor so the global-section size cannot
        # split otherwise-identical programs
        global_cap = max(256 if backend != "tpu" else cap_floor,
                         -(-int(np.ceil(int(nl) * 1.5)) // 512) * 512)

    if views_per_call is None:
        # packed face blocks are ~11 MB/view at LineMOD density (bounds the
        # per-chunk VMEM/HBM working set); CPU prefers bigger host chunks
        views_per_call = 8 if backend == "tpu" else 32

    V = len(poses)
    # pad views so the chunk count also divides the dp shard count: each
    # device scans an equal number of chunks (SPMD requires equal shards)
    n_chunks = -(-V // views_per_call)
    if n_shards > 1:
        n_chunks += (-n_chunks) % n_shards
    pad = n_chunks * views_per_call - V
    padded = np.concatenate([poses, np.tile(poses[-1:], (pad, 1, 1))]) \
        if pad else poses
    chunks = jnp.asarray(padded).reshape(-1, views_per_call, 4, 4)
    if defer_overflow:
        program = _render_program(backend, textured, sw, sh, x0, y0, tile,
                                  capacity, global_cap, fx, fy, n_shards,
                                  out_dtype)
        full, overflow = program(verts, faces, colors, K, chunks, texture,
                                 jnp.float32(ox - x0),
                                 jnp.float32(oy - y0), jnp.float32(z), fsj)

        def retry():
            return _render_patches(mesh, cam, poses, sw, sh, x0, y0, ox,
                                   oy, z, views_per_call=views_per_call,
                                   to_host=False, n_shards=n_shards,
                                   out_dtype=out_dtype)
        return full.reshape(-1, 64, 64, 7)[:V], overflow, retry

    # a pose outside the probe spread can still exceed the sized capacity;
    # the render reports dropped geometry and we re-render bigger instead
    # of silently training on patches with holes
    for attempt in range(3):
        program = _render_program(backend, textured, sw, sh, x0, y0, tile,
                                  capacity, global_cap, fx, fy, n_shards,
                                  out_dtype)
        full, overflow = program(verts, faces, colors, K, chunks, texture,
                                 jnp.float32(ox - x0), jnp.float32(oy - y0),
                                 jnp.float32(z), fsj)
        if not bool(overflow):
            break
        log.warning("render capacity overflow (capacity=%d global=%d); "
                    "re-rendering at 2x", capacity, global_cap)
        capacity *= 2
        global_cap *= 2
    else:
        raise RuntimeError(
            "tile-capacity overflow persists after retries — geometry "
            "would be dropped (capacity %d, global %d)" %
            (capacity, global_cap))
    full = full.reshape(-1, 64, 64, 7)[:V]
    # keep generated patches on device unless the caller needs host arrays
    # (through a slow tunnel the device->host fetch dominates generation)
    return full if not to_host else np.asarray(full)


def create_synth_samples_paul(mesh: Mesh, cam: np.ndarray, class_idx: int,
                              dataset_path: str,
                              dataset_name: str,
                              n_shards: int = 1) -> SampleSet:
    """createSynthSamplesPaul (reference src/datasetmanager.cpp:425-496):
    1542 el/az camera positions from paul/camPositionsElAz.txt."""
    elaz = np.loadtxt(os.path.join(dataset_path, "paul",
                                   "camPositionsElAz.txt"),
                      dtype=np.float64).reshape(-1, 2)
    z = 0.72 if dataset_name == "BigBIRD" else 0.4

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def rot_z(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    cam0 = rot_x(np.pi / 2)
    poses = []
    for el, az in elaz:
        R = cam0 @ (rot_x(el) @ rot_z(-az))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R.astype(np.float32)
        T[:3, 3] = [0.0, 0.0, z]
        if dataset_name == "BigBIRD":
            # shift the orbit center to the model centroid (reference :468-472)
            Ti = np.linalg.inv(T)
            Ti[:3, 3] += mesh.centroid
            T = np.linalg.inv(Ti).astype(np.float32)
        poses.append(T)

    fx, fy = float(cam[0, 0]), float(cam[1, 1])
    ox, oy = float(cam[0, 2]), float(cam[1, 2])
    sw = int(fx * 0.2 / z) + 8
    sh = int(fy * 0.2 / z) + 8
    x0, y0 = int(ox) - sw // 2, int(oy) - sh // 2

    patches = _render_patches(mesh, cam, np.stack(poses), sw, sh, x0, y0,
                              ox, oy, z, n_shards=n_shards)
    return SampleSet(patches, poses_to_labels(class_idx, np.stack(poses)))


class DatasetManager:
    """Orchestrates dataset preparation and owns the device-resident sets."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.training_set: List[SampleSet] = []
        self.template_set: List[SampleSet] = []
        self.test_set: List[SampleSet] = []
        self.hard_negatives: Dict[str, SampleSet] = {}

    # ---------------------------------------------------------- generation
    def _gen_shards(self) -> int:
        """Device count for sharded generation: views are embarrassingly
        parallel, so the render chunks split over the dp mesh (bitwise
        parity with single-chip — tests/test_parallel.py).  Virtual CPU
        meshes share one physical core, so CPU keeps the single-device
        program (the sharded path is still covered in-suite)."""
        import jax
        if jax.default_backend() != "tpu":
            return 1
        from pose3d_tpu.parallel.mesh import make_mesh
        return make_mesh(self.cfg.data_parallel).size

    def _load_model(self, name: str) -> Mesh:
        for ext in (".ply", ".obj"):
            p = os.path.join(self.cfg.dataset_path, name + ext)
            if os.path.exists(p):
                return load_mesh(p)
        raise FileNotFoundError(f"No model found for {name}")

    def generate_and_store_samples(self, pipeline_depth: int = 4) -> None:
        """Per-model cache generation (generateAndStoreSamples, reference
        src/datasetmanager.cpp:539-600), PIPELINED across meshes.

        The inplane path dispatches each mesh's render with NO host sync
        (deferred-overflow mode) and keeps up to ``pipeline_depth`` meshes
        in flight: while mesh k's patches fetch to host and write HDF5,
        meshes k+1..k+depth are already rendering on device — the
        reference's per-view GL loop (src/painter.cpp:87-112) is replaced
        at pipeline depth, not just kernel speed (round-3 verdict item 5).
        ``self.last_gen_stats`` records per-mesh dispatch/fetch counts.
        """
        cfg = self.cfg
        from collections import deque
        stats = {"dispatches": 0, "flag_fetches": 0, "patch_fetches": 0,
                 "retries": 0, "meshes": 0}
        self.last_gen_stats = stats
        inflight: deque = deque()

        def drain_one():
            (model_name, real, tmpl, synth, overflow, retry) = \
                inflight.popleft()
            stats["flag_fetches"] += 1
            if bool(jax.device_get(overflow)):
                log.warning("%s: render capacity overflow, re-rendering "
                            "probed", model_name)
                stats["retries"] += 1
                tmpl, synth = retry()
            real_p, synth_p, tmpl_p = hdf5cache.cache_paths(
                cfg.hdf5_path, model_name)
            hdf5cache.write_samples(real_p, real.patches, real.labels)
            stats["patch_fetches"] += 1
            hdf5cache.write_samples(tmpl_p, np.asarray(tmpl.patches),
                                    np.asarray(tmpl.labels))
            hdf5cache.write_samples(synth_p, np.asarray(synth.patches),
                                    np.asarray(synth.labels))

        for model_name in cfg.used_models:
            if hdf5cache.caches_exist(cfg.hdf5_path, model_name):
                continue
            log.info("creating samples and patches for %s", model_name)
            mesh = self._load_model(model_name)
            bench = load_benchmark(cfg.dataset_name, cfg.dataset_path,
                                   model_name)
            idx = cfg.model_index[model_name]
            stats["meshes"] += 1

            real = extract_real_samples(bench, idx, mesh.centroid,
                                        cfg.dataset_name)

            if cfg.use_simulated:
                # sampling_type 2 (reference src/datasetmanager.cpp:696-700)
                templates = extract_synth_samples_benjamin(
                    cfg.simulated_templates_path, bench.cam, model_name, idx)
                synth = extract_synth_samples_benjamin(
                    cfg.simulated_training_path, bench.cam, model_name, idx)
            elif cfg.inplane:
                # async dispatch; fetch/write happens pipeline_depth meshes
                # later while this mesh renders
                templates, synth, overflow, retry = \
                    create_synth_samples_pair(
                        mesh, bench.cam, idx, cfg.template_subdiv,
                        cfg.training_subdiv, True, to_host=False,
                        defer_overflow=True, n_shards=self._gen_shards())
                stats["dispatches"] += 1
                inflight.append((model_name, real, templates, synth,
                                 overflow, retry))
                if len(inflight) >= pipeline_depth:
                    drain_one()
                continue
            else:
                allp = create_synth_samples_paul(mesh, bench.cam, idx,
                                                 cfg.dataset_path,
                                                 cfg.dataset_name,
                                                 n_shards=self._gen_shards())
                templates = SampleSet(allp.patches[:301], allp.labels[:301])
                synth = SampleSet(allp.patches[302:], allp.labels[302:])
            real_p, synth_p, tmpl_p = hdf5cache.cache_paths(cfg.hdf5_path,
                                                            model_name)
            hdf5cache.write_samples(real_p, real.patches, real.labels)
            hdf5cache.write_samples(tmpl_p, templates.patches,
                                    templates.labels)
            hdf5cache.write_samples(synth_p, synth.patches, synth.labels)
        while inflight:
            drain_one()

    # ------------------------------------------------------------- loading
    def generate_datasets(self, rng: Optional[np.random.Generator] = None
                          ) -> None:
        cfg = self.cfg
        rng = rng or np.random.default_rng(cfg.seed)
        self.generate_and_store_samples()

        self.training_set, self.template_set, self.test_set = [], [], []
        for seq in cfg.used_models:
            real_p, synth_p, tmpl_p = hdf5cache.cache_paths(cfg.hdf5_path,
                                                            seq)
            real = SampleSet(*hdf5cache.read_samples(real_p))
            synth = SampleSet(*hdf5cache.read_samples(synth_p))
            tmpl = SampleSet(*hdf5cache.read_samples(tmpl_p))
            self.template_set.append(tmpl)

            # nearest template per real sample (quat argmin, one matmul)
            if len(real):
                nearest = np.asarray(Q.nearest_template(
                    jnp.asarray(real.labels[:, 1:5]),
                    jnp.asarray(tmpl.labels[:, 1:5])))
            else:
                nearest = np.zeros((0,), np.int32)

            train_p = [synth.patches]
            train_l = [synth.labels]
            test_p, test_l = [], []
            for t in range(len(tmpl)):
                bucket = np.nonzero(nearest == t)[0]
                if len(bucket) == 0:
                    continue
                half = int(np.ceil(len(bucket) / 2.0))
                if cfg.use_real:
                    train_p.append(real.patches[bucket[:half]])
                    train_l.append(real.labels[bucket[:half]])
                test_p.append(real.patches[bucket[half:]])
                test_l.append(real.labels[bucket[half:]])
            self.training_set.append(SampleSet(
                np.concatenate(train_p), np.concatenate(train_l)))
            if test_p:
                self.test_set.append(SampleSet(
                    np.concatenate(test_p), np.concatenate(test_l)))
            else:
                self.test_set.append(SampleSet(
                    np.zeros((0, 64, 64, 7), np.float32),
                    np.zeros((0, 8), np.float32)))

        if cfg.dataset_name == "LineMOD":
            self._load_hard_negatives()

        # crop to common minimum and shuffle (reference :670-680)
        min_tr = min(len(s) for s in self.training_set)
        min_te = min(len(s) for s in self.test_set)
        for i in range(len(self.training_set)):
            perm = rng.permutation(len(self.training_set[i]))[:min_tr]
            s = self.training_set[i]
            self.training_set[i] = SampleSet(s.patches[perm], s.labels[perm])
            s = self.test_set[i]
            perm = rng.permutation(len(s))[:min_te]
            self.test_set[i] = SampleSet(s.patches[perm], s.labels[perm])

    def _load_hard_negatives(self) -> None:
        for seq in self.cfg.used_models:
            p = os.path.join(self.cfg.hdf5_path, f"negs_{seq}.h5")
            if os.path.exists(p):
                self.hard_negatives[seq] = SampleSet(
                    *hdf5cache.read_samples(p))
            else:
                log.warning("%s not found!", p)

    # ----------------------------------------------------- device assembly
    def to_device(self, storage_dtype=None) -> DeviceData:
        """Assemble the device-resident tensors.  ``storage_dtype=
        jnp.bfloat16`` halves the resident sample memory (the batcher
        promotes gathered batches back to f32).  ``None`` takes the
        config's ``storage_dtype`` knob (the CLI path)."""
        cfg = self.cfg
        if storage_dtype is None:
            storage_dtype = jnp.dtype(cfg.storage_dtype)
        sd = storage_dtype
        train_p = jnp.asarray(
            np.stack([s.patches for s in self.training_set]), sd)
        train_l = jnp.asarray(np.stack([s.labels for s in self.training_set]))
        tmpl_p = jnp.asarray(
            np.stack([s.patches for s in self.template_set]), sd)
        tmpl_l = jnp.asarray(np.stack([s.labels for s in self.template_set]))
        test_p = jnp.asarray(
            np.stack([s.patches for s in self.test_set]), sd)
        test_l = jnp.asarray(np.stack([s.labels for s in self.test_set]))

        # top-2 similar templates, all objects in ONE program (a per-object
        # Python loop costs O async dispatches, ~100 ms each through a
        # tunneled device)
        if cfg.inplane:
            max_sim = Q.top2_similar_templates_all(
                train_l[:, :, 1:5], tmpl_l[:, :, 1:5])
        else:
            max_sim = Q.top2_similar_templates_trans_all(
                train_l[:, :, 5:8], tmpl_l[:, :, 5:8])

        elev = Q.elevation(tmpl_l[..., 1:5])          # [O, T]
        elev_ok = jnp.abs(elev[:, :, None] - elev[:, None, :]) >= ELEV_GATE

        rot_inv = jnp.asarray(
            [cfg.rot_inv[cfg.model_index[m]] for m in cfg.used_models],
            jnp.int32)

        O = train_p.shape[0]
        counts = [len(self.hard_negatives.get(m, []))
                  for m in cfg.used_models]
        M = max(counts) if counts else 0
        if M > 0:
            negs = np.zeros((O, M, 64, 64, 7), np.float32)
            for o, m in enumerate(cfg.used_models):
                if m in self.hard_negatives:
                    hn = self.hard_negatives[m].patches
                    negs[o, :len(hn)] = hn
            hard = jnp.asarray(negs)
        else:
            hard = jnp.zeros((O, 1, 64, 64, 7), jnp.float32)
        return DeviceData(
            train_patches=train_p, train_labels=train_l,
            tmpl_patches=tmpl_p, tmpl_labels=tmpl_l,
            test_patches=test_p, test_labels=test_l,
            max_sim_tmpl=max_sim, rot_inv=rot_inv, elev_ok=elev_ok,
            hard_negs=hard,
            hard_neg_count=jnp.asarray(counts, jnp.int32))
