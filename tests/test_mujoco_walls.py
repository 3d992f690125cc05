"""Pure-numpy MuJoCo wall extraction (data/mujoco_walls.py) on synthetic
geom tables — the testable surface of the reference's live-env extraction
(src/data/dataset.py:76-192) in an environment with no MuJoCo stack."""
import numpy as np

from interpolated_diffusion_tpu.data.mujoco_walls import (
    GEOM_BOX,
    quats_to_rotmats,
    walls_from_geom_arrays,
    walls_to_boxes,
)


def _geoms(rows):
    """rows: (type, size3, pos3, quat4, name)"""
    t = np.array([r[0] for r in rows])
    s = np.array([r[1] for r in rows], np.float32)
    p = np.array([r[2] for r in rows], np.float32)
    q = np.array([r[3] for r in rows], np.float32)
    names = [r[4] for r in rows]
    return t, s, p, q, names


IDENT = (1.0, 0.0, 0.0, 0.0)


def test_quat_batch_matches_scalar_formula():
    rng = np.random.RandomState(0)
    q = rng.randn(8, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = quats_to_rotmats(q)
    # rotation matrices: orthonormal, det +1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)
    # known case: 90° about z maps +x to +y
    s = np.sin(np.pi / 4)
    Rz = quats_to_rotmats(np.array([[np.cos(np.pi / 4), 0, 0, s]]))[0]
    np.testing.assert_allclose(Rz @ np.array([1.0, 0, 0]),
                               np.array([0, 1.0, 0]), atol=1e-6)


def test_named_walls_extracted_floor_skipped():
    t, s, p, q, names = _geoms([
        (GEOM_BOX, (5, 5, 0.01), (0, 0, 0), IDENT, "floor"),
        (GEOM_BOX, (1, 0.1, 0.5), (2, 0, 0.5), IDENT, "wall_east"),
        (GEOM_BOX, (0.1, 1, 0.5), (0, 2, 0.5), IDENT, "maze_block_3"),
        (2, (0.2, 0, 0), (1, 1, 0), IDENT, "obstacle_sphere"),  # not a box
    ])
    walls = walls_from_geom_arrays(t, s, p, q, names)
    assert len(walls) == 2
    # wall_east footprint: center (2,0), half-extents (1, 0.1)
    box = walls_to_boxes(walls)
    np.testing.assert_allclose(box[0], [1.0, -0.1, 3.0, 0.1], atol=1e-5)


def test_unnamed_fallback_filters_thin_and_huge():
    t, s, p, q, names = _geoms([
        (GEOM_BOX, (50, 50, 0.6), (0, 0, 0), IDENT, None),     # huge ground
        (GEOM_BOX, (1, 1, 0.02), (0, 0, 0), IDENT, None),      # thin sheet
        (GEOM_BOX, (1, 0.2, 0.6), (1, 0, 0), IDENT, None),
        (GEOM_BOX, (0.2, 1, 0.6), (0, 1, 0), IDENT, None),
        (GEOM_BOX, (1, 0.2, 0.6), (-1, 0, 0), IDENT, None),
    ])
    walls = walls_from_geom_arrays(t, s, p, q, names)
    # thin sheet dropped by height filter; huge plate dropped by area filter
    assert len(walls) == 3


def test_rotated_wall_polygon():
    s2 = np.sqrt(0.5)
    t, s, p, q, names = _geoms([
        (GEOM_BOX, (1, 0.1, 0.5), (0, 0, 0.5), (s2, 0, 0, s2), "wall_rot"),
    ])
    walls = walls_from_geom_arrays(t, s, p, q, names)
    assert len(walls) == 1
    # 90° about z: x-extent 1 becomes y-extent 1
    box = walls_to_boxes(walls)[0]
    np.testing.assert_allclose(box, [-0.1, -1.0, 0.1, 1.0], atol=1e-5)


def test_no_candidates_returns_none():
    t, s, p, q, names = _geoms([
        (2, (1, 0, 0), (0, 0, 0), IDENT, "ball"),
        (GEOM_BOX, (5, 5, 0.1), (0, 0, 0), IDENT, "floor"),
    ])
    assert walls_from_geom_arrays(t, s, p, q, names) is None


def test_empty_geom_table_returns_none():
    assert walls_from_geom_arrays(
        np.zeros(0), np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 4)), []
    ) is None
