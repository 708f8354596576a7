"""World-transform bake tests (reference semantics: object.py:43-108)."""

import numpy as np

from opengl_raytracer_tpu.models.transforms import (
    bake_world,
    model_and_normal_matrices,
    rotation_matrix_from_euler,
)
from opengl_raytracer_tpu.models.rect import make_cube_vertices


def test_rotation_identity():
    R = rotation_matrix_from_euler(0, 0, 0)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_rotation_x_90():
    R = rotation_matrix_from_euler(np.pi / 2, 0, 0)
    # +Y rotates to +Z under Rx(90)
    np.testing.assert_allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-6)


def test_rotation_order_xyz():
    # The reference's loop (object.py:74-79) composes R = Rx @ Ry @ Rz for
    # order "XYZ" — Z is applied to the vector FIRST (its comment says the
    # opposite; the code wins and we match the code).
    rx, ry, rz = 0.3, -0.7, 1.1
    R = rotation_matrix_from_euler(rx, ry, rz, "XYZ")
    Rx = rotation_matrix_from_euler(rx, 0, 0)
    Ry = rotation_matrix_from_euler(0, ry, 0)
    Rz = rotation_matrix_from_euler(0, 0, rz)
    np.testing.assert_allclose(R, Rx @ Ry @ Rz, atol=1e-6)


def test_model_matrix_scale_then_rotate():
    M, _ = model_and_normal_matrices([1, 2, 3], [0, 90, 0], (2, 2, 2))
    # point (1,0,0): scaled to (2,0,0), rotated by Ry(90) to (0,0,-2), translated
    p = M @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [1, 2, 1], atol=1e-5)


def test_normals_unit_after_bake():
    verts = make_cube_vertices([2, 3, 4])
    pos, normals = bake_world(verts[:, :3], verts[:, 3:6], [5, 6, 7], [30, 40, 50], (3, 3, 3))
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)


def test_bake_matches_manual():
    pts = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    nrm = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    pos, _ = bake_world(pts, nrm, [10, 0, 0], [0, 0, 0], (2, 2, 2))
    np.testing.assert_allclose(pos, pts * 2 + [10, 0, 0], atol=1e-5)


def test_cube_geometry():
    verts = make_cube_vertices([2, 4, 6])
    assert verts.shape == (36, 8)
    # extents are half-sizes
    assert verts[:, 0].min() == -1 and verts[:, 0].max() == 1
    assert verts[:, 1].min() == -2 and verts[:, 1].max() == 2
    assert verts[:, 2].min() == -3 and verts[:, 2].max() == 3
    # outward face normals are unit axis vectors
    np.testing.assert_allclose(np.linalg.norm(verts[:, 3:6], axis=1), 1.0)
