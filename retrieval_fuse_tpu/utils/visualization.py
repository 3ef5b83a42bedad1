"""Host-side visualization: SDF -> mesh OBJ, voxel boxes, point clouds,
normals, and 3-panel preview renders.

Capability parity with reference util/visualization.py, self-contained:
  * marching cubes comes from our native C++ extractor (native/);
  * voxel-box meshes are generated directly (the reference used
    trimesh.voxel.ops.multibox);
  * preview renders use a small numpy software rasterizer writing JPEGs via
    PIL (the reference needed pyrender + OpenGL/EGL; parity output: one
    480x480 panel per mesh, hstacked input|pred|gt).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from retrieval_fuse_tpu.utils.misc import to_point_list


def visualize_sdf_as_mesh(sdf: np.ndarray, output_path, level: float = 0.75,
                          scale_factor: float = 1, method: str = "mc") -> None:
    """TSDF -> OBJ via native isosurface extraction (ref util/visualization.py:35-38).

    method='mc' (default) is the classic lookup-table triangulation the
    reference extension uses; method='tets' is marching tetrahedra (same
    isosurface, ~2-3x more triangles)."""
    from retrieval_fuse_tpu.native import marching_cubes, export_obj
    vertices, triangles = marching_cubes(np.asarray(sdf, dtype=np.float32),
                                         float(level), method=method)
    vertices = vertices / scale_factor
    export_obj(vertices, triangles, output_path)


_BOX_VERTS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                       [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float32) - 0.5
_BOX_FACES = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                       [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                       [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], dtype=np.int32)


def _multibox_obj(centers: np.ndarray, output_path, pitch: float = 1.0) -> None:
    """One unit cube per center -> OBJ (replacement for trimesh multibox)."""
    with open(output_path, "w") as f:
        for c in centers:
            for v in _BOX_VERTS * pitch + c:
                f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for i in range(len(centers)):
            base = i * 8 + 1
            for face in _BOX_FACES:
                f.write(f"f {base + face[0]} {base + face[1]} {base + face[2]}\n")


def visualize_sdf_as_voxels(sdf: np.ndarray, output_path, level: float = 0.5) -> None:
    point_list = to_point_list(np.asarray(sdf) <= level)
    if point_list.shape[0] > 0:
        _multibox_obj(point_list.astype(np.float32), output_path)


def visualize_grid_as_voxels(grid: np.ndarray, output_path) -> None:
    point_list = to_point_list(np.asarray(grid) > 0)
    if point_list.shape[0] > 0:
        _multibox_obj(point_list.astype(np.float32), output_path)


def visualize_pointcloud(pointcloud: np.ndarray, output_path) -> None:
    with open(output_path, "w") as f:
        for p in pointcloud:
            f.write(f"v {p[0] + 0.5:.6f} {p[1] + 0.5:.6f} {p[2] + 0.5:.6f} 1 1 1\n")


def visualize_float_grid(grid: np.ndarray, ignore_val: float, minval: float, maxval: float, output_path) -> None:
    """Colored point dump of grid cells above ignore_val (jet colormap)."""
    from matplotlib import cm
    jetmap = cm.get_cmap("jet")
    norm_grid = (grid - minval) / (maxval - minval)
    mask = grid > ignore_val
    coords = np.argwhere(mask)
    with open(output_path, "w") as f:
        for x, y, z in coords:
            c = (np.array(jetmap(norm_grid[x, y, z])) * 255).astype(np.uint8)
            f.write(f"v {x + 0.5} {y + 0.5} {z + 0.5} {c[0]} {c[1]} {c[2]}\n")


def visualize_normals(grid: np.ndarray, output_path) -> None:
    """Colored point dump of nonzero normals; grid (3, D, H, W) in [-1, 1]."""
    g = ((grid * 0.5 + 0.5) * 255).astype(np.uint8)
    with open(output_path, "w") as f:
        for x in range(g.shape[1]):
            for y in range(g.shape[2]):
                for z in range(g.shape[3]):
                    c = g[:, x, y, z]
                    if c[0] != 127 or c[1] != 127 or c[2] != 127:
                        f.write(f"v {x + 0.5} {y + 0.5} {z + 0.5} {c[0]} {c[1]} {c[2]}\n")


def trilinear_upsample_2x(vol: np.ndarray) -> np.ndarray:
    """2x trilinear upsampling with align_corners=True semantics, used before
    high-quality marching cubes (ref dataset/scene.py:216-217)."""
    import jax
    import jax.numpy as jnp
    n = vol.shape[0]
    out_n = n * 2
    # align_corners: output i maps to input i * (n-1)/(out_n-1)
    idx = jnp.linspace(0.0, n - 1, out_n)
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = (idx - lo)[:, None]

    def interp_axis(v, axis):
        v_lo = jnp.take(v, lo, axis=axis)
        v_hi = jnp.take(v, hi, axis=axis)
        shape = [1, 1, 1]
        shape[axis] = out_n
        ww = w.reshape(shape)
        return v_lo * (1 - ww) + v_hi * ww

    v = jnp.asarray(vol)
    for ax in range(3):
        v = interp_axis(v, ax)
    return np.asarray(v)


# ------------------------------------------------------------ soft rasterizer

def _load_obj(path):
    verts, faces = [], []
    for line in Path(path).read_text().splitlines():
        if line.startswith("v "):
            parts = line.split()
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif line.startswith("f "):
            idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:4]]
            faces.append(idx)
    return np.array(verts, np.float32), np.array(faces, np.int32)


def _render_mesh_panel(verts: np.ndarray, faces: np.ndarray, res: int = 480) -> np.ndarray:
    """Tiny z-buffer rasterizer with Lambert shading (fixed 3/4 view)."""
    img = np.full((res, res, 3), 255, np.uint8)
    if len(verts) == 0 or len(faces) == 0:
        return img
    # normalize to unit box around origin (like the reference's bbox scaling)
    lo, hi = verts.min(0), verts.max(0)
    center, scale = (lo + hi) / 2, max((hi - lo).max(), 1e-6)
    v = (verts - center) / scale
    # rotate: -55 deg about x then view down z
    ang = np.deg2rad(-55)
    rx = np.array([[1, 0, 0], [0, np.cos(ang), -np.sin(ang)], [0, np.sin(ang), np.cos(ang)]], np.float32)
    v = v @ rx.T
    xy = ((v[:, :2] * 0.85 + 0.5) * (res - 1))
    z = v[:, 2]
    zbuf = np.full((res, res), -np.inf, np.float32)
    tri = v[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n_norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(n_norm, 1e-9)
    light = np.array([0.3, 0.5, 0.81], np.float32)
    shade = (np.abs(n @ light) * 0.75 + 0.25)
    order = np.argsort(tri[..., 2].mean(axis=1))
    for fi in order:
        f = faces[fi]
        p = xy[f]
        zm = z[f].mean()
        mn = np.floor(p.min(0)).astype(int)
        mx = np.ceil(p.max(0)).astype(int)
        mn = np.clip(mn, 0, res - 1)
        mx = np.clip(mx, 0, res - 1)
        if (mx - mn).max() > res // 2:  # degenerate huge triangle guard
            continue
        ys, xs = np.mgrid[mn[1]:mx[1] + 1, mn[0]:mx[0] + 1]
        pts = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
        d = p[1:] - p[0]
        det = d[0, 0] * d[1, 1] - d[0, 1] * d[1, 0]
        if abs(det) < 1e-9:
            continue
        rel = pts - p[0]
        u = (rel[:, 0] * d[1, 1] - rel[:, 1] * d[1, 0]) / det
        w_ = (rel[:, 1] * d[0, 0] - rel[:, 0] * d[0, 1]) / det
        inside = (u >= 0) & (w_ >= 0) & (u + w_ <= 1)
        if not inside.any():
            continue
        px = pts[inside].astype(int)
        gray = np.uint8(np.clip(shade[fi] * 255, 0, 255))
        better = zm > zbuf[px[:, 1], px[:, 0]]
        sel = px[better]
        zbuf[sel[:, 1], sel[:, 0]] = zm
        img[sel[:, 1], sel[:, 0]] = gray
    return img[::-1]


def render_visualizations_to_image(mesh_dir, target_dir) -> None:
    """Per scene: render _input/_pred/_gt OBJs into one hstacked JPEG.

    Output-format parity with reference util/visualization.py:95-134; failed
    panels fall back to white, errors are swallowed with a console note.
    """
    from PIL import Image
    mesh_dir, target_dir = Path(mesh_dir), Path(target_dir)
    target_dir.mkdir(exist_ok=True, parents=True)
    scene_names = sorted(set("_".join(x.name.split("_")[:-1])
                             for x in mesh_dir.iterdir() if x.name.endswith(".obj")))
    for scene_name in scene_names:
        panels = []
        for suffix in ["_input.obj", "_pred.obj", "_gt.obj"]:
            try:
                verts, faces = _load_obj(mesh_dir / (scene_name + suffix))
                panels.append(_render_mesh_panel(verts, faces))
            except Exception as e:
                print("[render_visualizations_to_image]:", e)
                panels.append(255 * np.ones((480, 480, 3), np.uint8))
        Image.fromarray(np.hstack(panels)).save(target_dir / (scene_name + ".jpg"))
