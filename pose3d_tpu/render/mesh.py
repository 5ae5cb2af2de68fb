"""Host-side mesh loading into padded device arrays.

Replaces the reference ``Model`` class (reference include/model.h:17-77,
src/model.cpp) — which loads PLY/OBJ via cv::viz, computes normals/bbox and
uploads GL VBOs — with a NumPy loader producing flat arrays ready for the
XLA rasterizer: float32 vertices [N,3], int32 faces [F,3], per-vertex colors
[N,3] (0..1, BGR to match the OpenCV-ordered patch channels).

Supported formats: binary/ascii PLY and OBJ, parsed directly — no external
mesh dependency is baked into the image.  Textured OBJs carry per-vertex
texture coordinates + the preprocessed texture image for the rasterizer's
per-pixel sampling path (render/texture.py, the GL texturing equivalent of
reference src/model.cpp:29-71,337-351); per-vertex sampled colors are kept
as the fallback, and untextured models default to grey 0.5 (reference
src/model.cpp:320-324).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Mesh:
    vertices: np.ndarray        # [N, 3] float32
    faces: np.ndarray           # [F, 3] int32
    colors: np.ndarray          # [N, 3] float32 in [0, 1], BGR
    normals: np.ndarray         # [N, 3] float32 (area-weighted vertex normals)
    # per-pixel texturing (OBJ with vt + <stem>.png): per-vertex GL texture
    # coordinates and the preprocessed texture (flip + /6 resize + x1.8 +20,
    # reference src/model.cpp:343-351), BGR float32 in [0, 1]
    tcoords: Optional[np.ndarray] = None   # [N, 2] float32
    texture: Optional[np.ndarray] = None   # [th, tw, 3] float32 in [0, 1]

    @property
    def centroid(self) -> np.ndarray:
        """Mean vertex (reference src/model.cpp:355-357)."""
        return self.vertices.mean(axis=0)

    @property
    def bounding_box(self) -> np.ndarray:
        """AABB corners [8, 3] (reference computeBoundingBox,
        src/model.cpp:171-189)."""
        lo = self.vertices.min(axis=0)
        hi = self.vertices.max(axis=0)
        corners = []
        for x in (lo[0], hi[0]):
            for y in (lo[1], hi[1]):
                for z in (lo[2], hi[2]):
                    corners.append((x, y, z))
        return np.asarray(corners, np.float32)

    @property
    def diameter(self) -> float:
        bb = self.bounding_box
        return float(np.linalg.norm(bb.max(0) - bb.min(0)))


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (reference computeVertexNormals,
    src/model.cpp:140-167): accumulate unnormalized face cross products."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    out = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(out, faces[:, k], fn)
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return (out / norm).astype(np.float32)


# --------------------------------------------------------------- PLY parsing

_PLY_TYPES = {
    "char": ("b", 1), "int8": ("b", 1), "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2), "ushort": ("H", 2),
    "uint16": ("H", 2), "int": ("i", 4), "int32": ("i", 4), "uint": ("I", 4),
    "uint32": ("I", 4), "float": ("f", 4), "float32": ("f", 4),
    "double": ("d", 8), "float64": ("d", 8),
}


def _load_ply(path: str) -> Mesh:
    with open(path, "rb") as f:
        data = f.read()

    header_end = data.find(b"end_header")
    if header_end < 0:
        raise ValueError(f"{path}: not a PLY file")
    header_end = data.find(b"\n", header_end) + 1
    header = data[:header_end].decode("ascii", errors="replace")

    fmt = "ascii"
    elements = []  # (name, count, [(prop_name, type) or ('list', ct, t, name)])
    for line in header.splitlines():
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property":
            if tok[1] == "list":
                elements[-1][2].append(("list", tok[2], tok[3], tok[4]))
            else:
                elements[-1][2].append((tok[2], tok[1]))  # (name, type)

    verts = None
    cols = None
    faces = []

    if fmt == "ascii":
        body = data[header_end:].decode("ascii", errors="replace").split()
        pos = 0
        for name, count, props in elements:
            if name == "vertex":
                ncols = len(props)
                arr = np.array(body[pos:pos + count * ncols],
                               dtype=np.float64).reshape(count, ncols)
                pos += count * ncols
                names = [p[0] for p in props]
                verts = arr[:, [names.index(a) for a in "xyz"]]
                if all(c in names for c in ("red", "green", "blue")):
                    cols = arr[:, [names.index(c)
                                   for c in ("blue", "green", "red")]] / 255.0
            elif name == "face":
                for _ in range(count):
                    n = int(body[pos]); pos += 1
                    idx = [int(x) for x in body[pos:pos + n]]; pos += n
                    for k in range(1, n - 1):
                        faces.append((idx[0], idx[k], idx[k + 1]))
            else:
                # skip unknown fixed-size elements conservatively
                pos += count * len(props)
    else:
        little = "little" in fmt
        order = "<" if little else ">"
        off = header_end
        for name, count, props in elements:
            if name == "vertex":
                fmts = [_PLY_TYPES[p[1]] for p in props]
                names = [p[0] for p in props]
                stride = sum(sz for _, sz in fmts)
                st = struct.Struct(order + "".join(ch for ch, _ in fmts))
                raw = np.frombuffer(data, dtype=np.uint8, count=count * stride,
                                    offset=off).reshape(count, stride)
                off += count * stride
                rows = [st.unpack(r.tobytes()) for r in raw]
                arr = np.asarray(rows, np.float64)
                verts = arr[:, [names.index(a) for a in "xyz"]]
                if all(c in names for c in ("red", "green", "blue")):
                    cols = arr[:, [names.index(c)
                                   for c in ("blue", "green", "red")]] / 255.0
            elif name == "face":
                for _ in range(count):
                    (ct, it, _nm) = (props[0][1], props[0][2], props[0][3])
                    cch, csz = _PLY_TYPES[ct]
                    ich, isz = _PLY_TYPES[it]
                    n = struct.unpack_from(order + cch, data, off)[0]
                    off += csz
                    idx = struct.unpack_from(order + str(n) + ich, data, off)
                    off += isz * n
                    for k in range(1, n - 1):
                        faces.append((idx[0], idx[k], idx[k + 1]))
            else:
                raise ValueError(f"{path}: unsupported binary element {name}")

    if verts is None:
        raise ValueError(f"{path}: no vertex element")
    vertices = verts.astype(np.float32)
    faces_a = np.asarray(faces, np.int32).reshape(-1, 3)
    if cols is None:
        cols = np.full((len(vertices), 3), 0.5)
    return Mesh(vertices, faces_a, cols.astype(np.float32),
                vertex_normals(vertices, faces_a))


# --------------------------------------------------------------- OBJ parsing

def _load_texture(path: str, resize: bool = False):
    """Texture preprocessing matching the reference (src/model.cpp:343-351):
    vertical flip, optional /6 downscale (the reference's GL-bind size),
    brightness/contrast (x1.8 +20)."""
    try:
        import cv2
    except Exception:
        return None
    tex = cv2.imread(path)
    if tex is None:
        return None
    tex = tex[::-1]
    if resize and min(tex.shape[:2]) >= 12:
        tex = cv2.resize(tex, (tex.shape[1] // 6, tex.shape[0] // 6))
    tex = tex.astype(np.float32) * 1.8 + 20.0
    return np.clip(tex, 0, 255)


def _load_obj(path: str) -> Mesh:
    verts = []
    tcoords = []
    faces = []
    vert_uv = {}         # vertex -> first-seen texcoord index
    with open(path, "r", errors="replace") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append([float(x) for x in tok[1:4]])
            elif tok[0] == "vt":
                tcoords.append([float(tok[1]), float(tok[2])])
            elif tok[0] == "f":
                idx = []
                for t in tok[1:]:
                    parts = t.split("/")
                    vi = int(parts[0]) - 1
                    idx.append(vi)
                    if len(parts) > 1 and parts[1]:
                        vert_uv.setdefault(vi, int(parts[1]) - 1)
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
    vertices = np.asarray(verts, np.float32)
    faces_a = np.asarray(faces, np.int32).reshape(-1, 3)

    # per-vertex color from the texture when UVs + <stem>.png exist — the
    # fallback for untextured render paths; the per-pixel path carries
    # (tcoords, texture) into the rasterizer epilogue (render/texture.py)
    colors = np.full((len(vertices), 3), 0.5, np.float32)
    mesh_uv = None
    mesh_tex = None
    if tcoords and vert_uv:
        tex = _load_texture(os.path.splitext(path)[0] + ".png", resize=True)
        if tex is not None:
            th, tw = tex.shape[:2]
            uv = np.asarray(tcoords, np.float32)
            mesh_uv = np.zeros((len(vertices), 2), np.float32)
            for vi, ti in vert_uv.items():
                if ti >= len(uv):
                    continue
                u, v = uv[ti]
                mesh_uv[vi] = (u, v)
                x = min(max(int(u * (tw - 1)), 0), tw - 1)
                y = min(max(int(v * (th - 1)), 0), th - 1)
                colors[vi] = tex[y, x] / 255.0
            mesh_tex = (tex / 255.0).astype(np.float32)
    return Mesh(vertices, faces_a, colors,
                vertex_normals(vertices, faces_a),
                tcoords=mesh_uv, texture=mesh_tex)


def subsample_cloud(points: np.ndarray, leaf: float) -> np.ndarray:
    """Voxel-grid subsampling: one representative point per occupied voxel
    (equivalent of the reference's subsampleCloud, src/model.cpp:192-242).
    Keeps the first point seen per voxel, in input order."""
    if len(points) == 0:
        return points
    keys = np.floor(points / leaf).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(first)]


def mesh_resolution(mesh: Mesh) -> float:
    """Median edge length — the reference's notion of mesh resolution
    (src/model.cpp:74-85)."""
    v = mesh.vertices
    f = mesh.faces
    e = np.concatenate([
        np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1),
        np.linalg.norm(v[f[:, 1]] - v[f[:, 2]], axis=1),
        np.linalg.norm(v[f[:, 2]] - v[f[:, 0]], axis=1)])
    return float(np.median(e))


def edge_points(mesh: Mesh, angle_deg: float = 30.0) -> np.ndarray:
    """Vertices on sharp geometric edges: a vertex is an edge point when two
    faces sharing it disagree in normal by more than ``angle_deg``
    (equivalent of computeEdgePoints, src/model.cpp:103-138)."""
    v, f = mesh.vertices, mesh.faces
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    n = np.linalg.norm(fn, axis=1, keepdims=True)
    n[n == 0] = 1.0
    fn = fn / n
    cos_thresh = np.cos(np.deg2rad(angle_deg))

    # min/max face-normal agreement per vertex against the vertex normal
    worst = np.ones(len(v))
    for k in range(3):
        dots = np.sum(fn * mesh.normals[f[:, k]], axis=1)
        np.minimum.at(worst, f[:, k], dots)
    return v[worst < cos_thresh]


def front_sign(mesh: Mesh) -> int:
    """Backface-cull sign for a closed, consistently oriented mesh; 0 if
    culling is unsafe.

    For a closed orientable 2-manifold viewed from outside, every camera
    ray's nearest intersection is a front-facing triangle, so dropping
    backfaces cannot change the z-buffer winner — the rasterizer then
    skips ~half the face-tile incidences (its measured cost driver).
    Exact caveat: the rasterizers' f32 coverage tolerance shades a
    sub-pixel sliver past each edge, so at silhouette edges an UNCULLED
    render can let the adjacent backface win tolerance-ring pixels the
    front face never covers; culling drops those slivers — which a GL
    rasterizer with exact edge rules (the reference) does not shade
    either.  Measured impact: ~1e-5 of patch elements, color/normal
    channels only (tests/test_cull.py pins the regime).  The
    reference renders without GL face culling (src/painter.cpp has no
    glEnable(GL_CULL_FACE)), so culling is applied ONLY when this check
    proves it output-equivalent; open shells, soups, and mixed-winding
    meshes return 0 and render both sides exactly as the reference does.

    Qualification: after welding positionally-duplicate vertices, every
    directed edge must appear exactly once and its reverse exactly once
    (closed + consistently oriented).  The sign maps that orientation to
    the rasterizer's screen-space area convention: with image y down and
    the camera looking along +z, an outward-CCW (positive signed volume)
    front face projects with NEGATIVE shoelace area, so front faces
    satisfy ``area * front_sign > 0`` with front_sign = -sign(volume).
    """
    v = np.asarray(mesh.vertices, np.float64)
    f = np.asarray(mesh.faces, np.int64)
    if len(f) == 0:
        return 0
    # weld positional duplicates: PLY/OBJ exporters often emit per-face
    # vertices; geometric closedness is what the cull argument needs
    uv, weld = np.unique(v, axis=0, return_inverse=True)
    fw = weld[f]
    # any degenerate face (repeated welded vertex) disqualifies: removing
    # it could delete edges that should have broken the pairing below
    degen = ((fw[:, 0] == fw[:, 1]) | (fw[:, 1] == fw[:, 2]) |
             (fw[:, 2] == fw[:, 0]))
    if degen.any():
        return 0
    n = int(weld.max()) + 1
    e = np.concatenate([fw[:, [0, 1]], fw[:, [1, 2]], fw[:, [2, 0]]])
    code = e[:, 0] * n + e[:, 1]
    uniq, counts = np.unique(code, return_counts=True)
    if counts.max() > 1:
        return 0                      # duplicated directed edge
    rev = e[:, 1] * n + e[:, 0]
    if not np.isin(rev, uniq, assume_unique=False).all():
        return 0                      # boundary edge: open shell
    # signed volume (divergence theorem): positive for outward-CCW.
    # fw indexes the WELDED array uv, not v — uv[weld] permutes v, so
    # indexing v with fw would evaluate the volume on scrambled geometry
    vol = float(np.einsum("ij,ij->", uv[fw[:, 0]],
                          np.cross(uv[fw[:, 1]], uv[fw[:, 2]])))
    if vol == 0.0:
        return 0
    return -1 if vol > 0.0 else 1


def save_ply(path: str, mesh: Mesh) -> None:
    """Binary little-endian PLY writer with per-vertex colors (equivalent of
    the reference's savePLY, src/model.cpp:246-291)."""
    n, f = len(mesh.vertices), len(mesh.faces)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {f}\n"
        "property list uchar int vertex_indices\nend_header\n")
    # colors stored BGR in-memory -> RGB on disk
    rgb = np.clip(mesh.colors[:, ::-1] * 255.0, 0, 255).astype(np.uint8)
    with open(path, "wb") as out:
        out.write(header.encode("ascii"))
        for i in range(n):
            out.write(struct.pack("<3f", *mesh.vertices[i]))
            out.write(struct.pack("<3B", *rgb[i]))
        for i in range(f):
            out.write(struct.pack("<B3i", 3, *mesh.faces[i]))


def load_mesh(path: str) -> Mesh:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        return _load_ply(path)
    if ext == ".obj":
        return _load_obj(path)
    raise ValueError(f"unsupported mesh format: {path}")


def make_test_mesh(kind: str = "cube", size: float = 0.1,
                   detail: int = 2) -> Mesh:
    """Procedural meshes for hermetic tests and synthetic benchmarks (no
    dataset download).  kinds: cube, tetra, sphere, cylinder, cone, torus.
    Colors vary with geometry so views are visually distinguishable."""
    if kind == "sphere":
        v, f = _icosphere_mesh(detail)
        v = (v * size / 2.0).astype(np.float32)
        cols = (v / size + 0.5).astype(np.float32)
        return Mesh(v, f, cols, vertex_normals(v, f))
    if kind in ("cylinder", "cone"):
        n = 8 * max(detail, 1)
        top_r = 0.0 if kind == "cone" else size / 2.0
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        bot = np.stack([np.cos(ang) * size / 2, np.sin(ang) * size / 2,
                        np.full(n, -size / 2)], axis=1)
        top = np.stack([np.cos(ang) * top_r, np.sin(ang) * top_r,
                        np.full(n, size / 2)], axis=1)
        v = np.concatenate([bot, top,
                            [[0, 0, -size / 2], [0, 0, size / 2]]])
        f = []
        for i in range(n):
            j = (i + 1) % n
            f += [(i, j, n + i), (j, n + j, n + i)]          # side
            f += [(2 * n, j, i), (2 * n + 1, n + i, n + j)]  # caps
        v = v.astype(np.float32)
        f = np.asarray(f, np.int32)
        cols = (v / size + 0.5).astype(np.float32)
        return Mesh(v, f, cols, vertex_normals(v, f))
    if kind == "torus":
        n, m = 8 * max(detail, 1), 6 * max(detail, 1)
        R, r = size / 2.5, size / 6.0
        v = []
        for i in range(n):
            a = 2 * np.pi * i / n
            for j in range(m):
                b = 2 * np.pi * j / m
                v.append([(R + r * np.cos(b)) * np.cos(a),
                          (R + r * np.cos(b)) * np.sin(a),
                          r * np.sin(b)])
        f = []
        for i in range(n):
            for j in range(m):
                a, b = i * m + j, i * m + (j + 1) % m
                c, d = ((i + 1) % n) * m + j, ((i + 1) % n) * m + (j + 1) % m
                f += [(a, b, c), (b, d, c)]
        v = np.asarray(v, np.float32)
        f = np.asarray(f, np.int32)
        cols = (v / size + 0.5).astype(np.float32)
        return Mesh(v, f, np.clip(cols, 0, 1), vertex_normals(v, f))
    s = size / 2.0
    if kind == "cube":
        v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], np.float32)
        fcs = np.array([
            [0, 1, 3], [0, 3, 2],      # x = -s
            [4, 6, 7], [4, 7, 5],      # x = +s
            [0, 4, 5], [0, 5, 1],      # y = -s
            [2, 3, 7], [2, 7, 6],      # y = +s
            [0, 2, 6], [0, 6, 4],      # z = -s
            [1, 5, 7], [1, 7, 3],      # z = +s
        ], np.int32)
        cols = (v / size + 0.5).astype(np.float32)
        return Mesh(v, fcs, cols, vertex_normals(v, fcs))
    if kind == "tetra":
        v = np.array([[s, s, s], [s, -s, -s], [-s, s, -s], [-s, -s, s]],
                     np.float32)
        fcs = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32)
        cols = np.eye(4, 3, dtype=np.float32)[:, :3] * 0.8 + 0.1
        return Mesh(v, fcs, cols, vertex_normals(v, fcs))
    raise ValueError(kind)


def _icosphere_mesh(subdiv: int):
    """Icosphere with shared-vertex topology (verts on the unit sphere)."""
    from pose3d_tpu.ops.sphere import _ICO_FACES, _ICO_VERTS
    verts = [v / np.linalg.norm(v) for v in _ICO_VERTS]
    faces = list(_ICO_FACES)
    for _ in range(subdiv):
        cache = {}
        out = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                mdl = verts[a] + verts[b]
                cache[key] = len(verts)
                verts.append(mdl / np.linalg.norm(mdl))
            return cache[key]

        for (a, b, c) in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            out += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = out
    return (np.stack(verts).astype(np.float32),
            np.asarray(faces, np.int32))
