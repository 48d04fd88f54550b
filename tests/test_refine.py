"""Tests for the refinement kernels (G10-G13, J11, J12, P18)."""

import numpy as np

from osm_sidewalkreator_spark.geometry import core, voronoi
from osm_sidewalkreator_spark.plans import refine


def square_ring(s=100.0):
    return np.array([[0, 0], [s, 0], [s, s], [0, s]], float)


def test_voronoi_two_seeds_splits_envelope():
    seeds = np.array([[25.0, 50.0], [75.0, 50.0]])
    cells = voronoi.voronoi_cells(seeds, square_ring())
    assert len(cells) == 2
    areas = [abs(core.ring_signed_area(c)) for c in cells]
    assert abs(areas[0] - 5000) < 1e-6 and abs(areas[1] - 5000) < 1e-6


def test_voronoi_cells_partition_area():
    rng = np.random.default_rng(3)
    seeds = rng.uniform(10, 90, size=(7, 2))
    cells = voronoi.voronoi_cells(seeds, square_ring())
    total = sum(abs(core.ring_signed_area(c)) for c in cells)
    assert abs(total - 10000) < 1e-6


def test_polygon_corners_drops_straight_vertices():
    ring = np.array([[0, 0], [50, 0.1], [100, 0], [100, 100], [0, 100]],
                    float)
    corners = refine.polygon_corners(ring)
    # (50, 0.1) is nearly straight -> removed
    assert len(corners) == 4


def test_corner_split_square_ring():
    ring = square_ring()
    spokes = refine.corner_spokes(ring)
    assert len(spokes) == 4
    closed = np.vstack([ring, ring[:1]])
    pieces = refine.split_lines_with_lines([closed], spokes)
    # ring cut at 4 corners -> 4 edges
    assert len(pieces) == 4
    for p in pieces:
        assert abs(core.polyline_length(p) - 100.0) < 1e-6


def test_split_by_max_len():
    line = np.array([[0, 0], [250, 0]], float)
    pieces = refine.split_polyline_by_max_len(line, 100.0)
    assert len(pieces) == 3
    total = sum(core.polyline_length(p) for p in pieces)
    assert abs(total - 250.0) < 1e-9


def test_snap_to_reference():
    lines = [np.array([[0, 0.3], [10, 0.4]], float)]
    ref = np.array([[0, 0, 10, 0]], float)
    out = refine.snap_lines_to_reference(lines, ref, tol=0.5)
    assert np.allclose(out[0][:, 1], 0.0)
    # beyond tolerance: untouched
    out2 = refine.snap_lines_to_reference(lines, ref, tol=0.2)
    assert np.allclose(out2[0], lines[0])


def test_merge_small_stretches():
    a = np.array([[0, 0], [20, 0]], float)
    small = np.array([[20, 0], [23, 0]], float)
    b = np.array([[23, 0], [60, 0]], float)
    merged = refine.merge_small_stretches([a, small, b], min_len=7.0)
    assert len(merged) == 2
    total = sum(core.polyline_length(ln) for ln in merged)
    assert abs(total - 60.0) < 1e-9


def test_voronoi_split_block():
    ring = square_ring()
    closed = np.vstack([ring, ring[:1]])
    pois = np.array([[30, 30], [70, 30], [50, 80]], float)
    pieces = refine.voronoi_split_block([closed], pois, ring)
    assert len(pieces) > 1
    total = sum(core.polyline_length(p) for p in pieces)
    assert abs(total - 400.0) < 1e-6
    # below the POI gate: untouched
    same = refine.voronoi_split_block([closed], pois[:2], ring)
    assert len(same) == 1
