"""Geometry/SDF and mesher unit tests for the 12 complex domains."""

import numpy as np
import pytest

from pdebench_tpu.fem import geometry


def test_polygon_sdf_signs_and_distance():
    sq = geometry.d_polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float))
    pts = np.array([[0.5, 0.5], [2.0, 0.5], [0.5, -0.25], [1.0, 0.5]])
    d = sq(pts)
    assert d[0] < 0 and abs(d[0] + 0.5) < 1e-12  # center: -0.5
    assert abs(d[1] - 1.0) < 1e-12  # 1 away from the right edge
    assert abs(d[2] - 0.25) < 1e-12
    assert abs(d[3]) < 1e-12  # on the boundary


def test_rect_circle_combinators():
    fd = geometry.d_diff(
        geometry.d_rect(0, 1, 0, 1), geometry.d_circle([0.5, 0.5], 0.2)
    )
    pts = np.array([[0.5, 0.5], [0.05, 0.05], [0.5, 0.75], [1.5, 0.5]])
    d = fd(pts)
    assert d[0] > 0  # inside the hole = outside the domain
    assert d[1] < 0  # corner region inside
    assert abs(d[2] + 0.05) < 1e-12  # 0.05 outside the hole ring
    assert d[3] > 0


@pytest.mark.parametrize(
    "dtype,spec,area",
    [
        ("circle", {"geometry_params": {"center": [0.5, 0.5], "radius": 0.5}},
         np.pi * 0.25),
        ("annulus", {"geometry_params": {"center": [0.5, 0.5], "inner_r": 0.25,
                                          "outer_r": 0.5}},
         np.pi * (0.25 - 0.0625)),
        ("l_shape", {"geometry_params": {"vertices": [[0, 0], [1, 0], [1, 0.5],
                                                      [0.5, 0.5], [0.5, 1], [0, 1]]}},
         0.75),
        ("t_junction", {"geometry_params": {"horizontal_rect": [0, 1, 0.8, 1.0],
                                             "vertical_rect": [0.4, 0.6, 0, 0.8]}},
         0.2 + 0.16),
    ],
)
def test_mesh_domain_area(dtype, spec, area):
    spec = dict(spec, type=dtype)
    m = geometry.mesh_domain(dtype, spec, 1.0 / 24)
    mesh_area = m.cell_volumes().sum()
    # polygon-approximated curves undershoot the true area slightly
    assert abs(mesh_area - area) / area < 0.02, (mesh_area, area)
    # watertight: every boundary facet belongs to exactly one cell
    _, _, counts = m.facets()
    assert set(np.unique(counts)) <= {1, 2}


def test_mesh_quality_floor():
    m = geometry.mesh_domain(
        "circle",
        {"type": "circle", "geometry_params": {"center": [0.5, 0.5],
                                                "radius": 0.5}},
        1.0 / 32,
    )
    v = m.coords[m.cells]
    a = np.linalg.norm(v[:, 1] - v[:, 0], axis=1)
    b = np.linalg.norm(v[:, 2] - v[:, 1], axis=1)
    c = np.linalg.norm(v[:, 0] - v[:, 2], axis=1)
    s = 0.5 * (a + b + c)
    area = np.sqrt(np.maximum(s * (s - a) * (s - b) * (s - c), 0))
    q = 2 * (area / s) / (a * b * c / (4 * np.maximum(area, 1e-300)))
    assert np.median(q) > 0.9
    assert q.min() > 0.02  # no degenerate cells after cleanup
