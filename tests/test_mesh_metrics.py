"""Mesh utilities + offline mesh metrics on analytic shapes."""

import numpy as np
import pytest

from retrieval_fuse_tpu.evaluation.mesh import Mesh, slice_faces_plane, slice_mesh_box
from retrieval_fuse_tpu.evaluation import mesh_metrics


def _cube_mesh(lo=0.0, hi=1.0):
    v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)], float)
    # 12 triangles, outward winding not required for these metrics
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return Mesh(v, f)


def test_obj_roundtrip(tmp_path):
    m = _cube_mesh()
    m.export(tmp_path / "c.obj")
    m2 = Mesh.load(tmp_path / "c.obj")
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_off_load(tmp_path):
    (tmp_path / "m.off").write_text("OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    m = Mesh.load(tmp_path / "m.off")
    assert m.vertices.shape == (3, 3)
    assert m.faces.shape == (1, 3)


def test_sampling_on_surface():
    m = _cube_mesh(0, 2)
    pts = m.sample(5000, seed=0)
    # every sample lies on a face of the cube: at least one coord is 0 or 2
    on_face = np.isclose(pts, 0, atol=1e-6) | np.isclose(pts, 2, atol=1e-6)
    assert on_face.any(axis=1).all()


def test_compute_iou_identical_and_disjoint():
    m = _cube_mesh(0, 8)
    assert mesh_metrics.compute_iou(m, m, pitch=1.0) == 1.0
    far = _cube_mesh(100, 108)
    assert mesh_metrics.compute_iou(m, far, pitch=1.0) == 0.0


def test_compute_metrics_identical_mesh(tmp_path):
    m = _cube_mesh(0, 16)
    m.export(tmp_path / "a.obj")
    m.export(tmp_path / "b.obj")
    iou, cl1, nc, f9, f14 = mesh_metrics.compute_metrics(
        tmp_path / "a.obj", tmp_path / "b.obj", n_points=5000)
    assert iou == 1.0
    assert cl1 < 0.5          # sampled point sets nearly coincide
    assert nc > 0.95
    assert f9 > 0.9 and f14 >= f9


def test_slice_plane_halves_cube():
    m = _cube_mesh(0, 2)
    sliced = slice_faces_plane(m, np.array([1.0, 0, 0]), np.array([1.0, 0, 0]))
    assert not sliced.is_empty()
    assert sliced.vertices[:, 0].min() >= 1.0 - 1e-9
    # area halves (4 side faces halved, one face kept, one dropped)
    a_full = _cube_mesh(0, 2).face_areas_normals()[0].sum()
    a_half = sliced.face_areas_normals()[0].sum()
    np.testing.assert_allclose(a_half, a_full * (4 * 0.5 + 1) / 6, rtol=1e-6)


def test_slice_mesh_box():
    m = _cube_mesh(0, 4)
    # keep the x <= 2 half of the surface; a fully-interior box would crop to
    # an empty mesh (surface lives on the cube boundary)
    cropped = slice_mesh_box(m, [0, 0, 0], [2, 4, 4])
    assert not cropped.is_empty()
    assert cropped.vertices[:, 0].max() <= 2 + 1e-9
    assert cropped.vertices.min() >= -1e-9
    # fully-disjoint box -> empty
    assert slice_mesh_box(m, [10, 10, 10], [12, 12, 12]).is_empty()


def test_recompose_scene(tmp_path):
    # two chunks of a Matterport-style scene at positions 0 and 64
    m = _cube_mesh(0, 8)
    m.export(tmp_path / "scene1_room0__0____16__0_0_0_pred.obj")
    m.export(tmp_path / "scene1_room0__0____16__64_0_0_pred.obj")
    d = mesh_metrics.get_scenes_chunk_dict(tmp_path, "_pred.obj")
    assert len(d) == 1
    scene = next(iter(d))
    out = mesh_metrics.recompose_scene(tmp_path, d[scene], "_pred.obj", [0, 0, 0])
    assert len(out.faces) == 24
    assert out.vertices[:, 0].max() == 72.0
