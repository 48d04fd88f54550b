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


def _merge_small_scan_reference(lines, min_len, tol=1e-6, max_iter=50):
    """The original O(n^2) all-lines scan — kept as the parity oracle
    for the endpoint-hash implementation (identical match priority:
    lowest j, end_i 0 before -1, end_j 0 before -1)."""
    lines = [ln.copy() for ln in lines if len(ln) > 1]
    for _ in range(max_iter):
        lens = [core.polyline_length(ln) for ln in lines]
        small = [i for i, l in enumerate(lens) if l < min_len]
        if not small:
            break
        merged_any = False
        for i in small:
            if lines[i] is None:
                continue
            found = None
            for j in range(len(lines)):
                if j == i or lines[j] is None:
                    continue
                for end_i in (0, -1):
                    for end_j in (0, -1):
                        if np.hypot(*(lines[i][end_i]
                                      - lines[j][end_j])) <= tol:
                            found = (j, end_i, end_j)
                            break
                    if found:
                        break
                if found:
                    break
            if not found:
                continue
            j, ei, ej = found
            a = lines[i] if ei == -1 else lines[i][::-1]
            bl = lines[j] if ej == 0 else lines[j][::-1]
            lines[j] = np.vstack([a, bl[1:]])
            lines[i] = None
            merged_any = True
        lines = [ln for ln in lines if ln is not None]
        if not merged_any:
            break
    return lines


def test_merge_small_stretches_matches_scan_reference():
    """Randomized chains-with-noise parity: the hashed implementation
    must produce BIT-IDENTICAL output (order and geometry) to the
    original quadratic scan."""
    rng = np.random.default_rng(42)
    for trial in range(20):
        lines = []
        # a few chains of connected stretches with random short pieces
        for _ in range(rng.integers(2, 5)):
            x0, y0 = rng.uniform(0, 100, 2)
            ang = rng.uniform(0, 2 * np.pi)
            pos = np.array([x0, y0])
            for _ in range(rng.integers(2, 6)):
                ln = rng.choice([1.5, 3.0, 12.0, 25.0])
                d = np.array([np.cos(ang), np.sin(ang)]) * ln
                seg = np.vstack([pos, pos + d])
                # randomly reverse orientation
                if rng.random() < 0.5:
                    seg = seg[::-1]
                lines.append(seg)
                pos = pos + d
                ang += rng.uniform(-0.7, 0.7)
        # plus isolated orphans (short and long)
        for _ in range(rng.integers(0, 4)):
            p = rng.uniform(200, 300, 2)
            q = p + rng.uniform(-4, 4, 2)
            lines.append(np.vstack([p, q]))
        got = refine.merge_small_stretches(
            [ln.copy() for ln in lines], min_len=7.0)
        want = _merge_small_scan_reference(
            [ln.copy() for ln in lines], min_len=7.0)
        assert len(got) == len(want), trial
        for g, w in zip(got, want):
            assert g.shape == w.shape and np.array_equal(g, w), trial


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


def test_snap_behavior_0_prefers_nodes():
    """J11 behavior 0: a reference NODE within tol beats a strictly
    nearer mid-segment point."""
    # vertex at (0.5, 0.3): mid-segment of ref is 0.3 away, ref node
    # (0, 0) is ~0.58 away — both within tol=1.0; node must win
    line = np.array([[0.5, 0.3], [5.0, 5.0]])
    ref = np.array([[0.0, 0.0, 1.0, 0.0]])
    b1 = refine.snap_lines_to_reference([line.copy()], ref, tol=1.0,
                                        behavior=1)[0]
    b0 = refine.snap_lines_to_reference([line.copy()], ref, tol=1.0,
                                        behavior=0)[0]
    assert np.allclose(b1[0], [0.5, 0.0])      # closest point
    assert np.allclose(b0[0], [0.0, 0.0])      # node preferred
    # beyond any node but within segment tol: behavior 0 falls back
    line2 = np.array([[0.5, 0.3], [0.5, 5.0]])
    b0f = refine.snap_lines_to_reference([line2.copy()], ref, tol=0.4,
                                         behavior=0)[0]
    assert np.allclose(b0f[0], [0.5, 0.0])


def test_snap_behavior_5_endpoints_only():
    """J11 behavior 5: only line END points move, and only onto
    reference END points (never mid-segment)."""
    line = np.array([[0.05, 0.1], [0.5, 0.1], [1.2, 0.1]])
    ref = np.array([[0.0, 0.0, 1.0, 0.0]])
    b5 = refine.snap_lines_to_reference([line.copy()], ref, tol=0.3,
                                        behavior=5)[0]
    assert np.allclose(b5[0], [0.0, 0.0])      # endpoint -> ref node
    assert np.allclose(b5[1], [0.5, 0.1])      # interior untouched
    assert np.allclose(b5[2], [1.0, 0.0])      # endpoint -> other node
    # a mid-segment-only proximity does NOT snap in behavior 5
    line2 = np.array([[0.5, 0.1], [0.5, 5.0]])
    b5n = refine.snap_lines_to_reference([line2.copy()], ref, tol=0.3,
                                         behavior=5)[0]
    assert np.allclose(b5n[0], [0.5, 0.1])


def test_snap_self_exclusion():
    """Self-snap (pass 1 of the export sequence) must not snap a line
    onto its own segments."""
    lines = [np.array([[0.0, 0.0], [10.0, 0.0]]),
             np.array([[0.0, 0.3], [10.0, 0.3]])]
    segs = np.concatenate([
        np.array([[0.0, 0.0, 10.0, 0.0]]),
        np.array([[0.0, 0.3, 10.0, 0.3]])])
    owners = np.array([0, 1])
    out = refine.snap_lines_to_reference(
        lines, segs, tol=0.5, behavior=0, ref_owners=owners,
        line_owners=[0, 1])
    # line 0 endpoints snap to line 1's nodes (not to itself at d=0)
    assert np.allclose(out[0][0], [0.0, 0.3])
    assert np.allclose(out[1][0], [0.0, 0.0])


def test_export_snap_sequence_closes_gaps():
    """The 3-pass sequence: disjoint sidewalk stretches within the
    tolerance join at shared nodes, crossing tips land on sidewalk
    endpoints, and sidewalks then meet the crossing."""
    sw = [np.array([[0.0, 0.0], [5.0, 0.0]]),
          np.array([[5.05, 0.02], [10.0, 0.0]])]   # 0.054 m gap
    cross = [np.array([[5.11, 0.05], [5.1, 1.0], [5.1, 2.0],
                       [5.1, 3.0], [5.1, 4.0]])]
    sw2, cr2 = refine.export_snap_sequence(sw, cross, disjoint_tol=0.1)
    # pass 1 (behavior 0, tol 0.11): the two facing endpoints coincide
    assert np.allclose(sw2[0][-1], sw2[1][0])
    # pass 2 (behavior 5): crossing tip sits exactly on a sidewalk node
    tips = [tuple(np.round(p, 9)) for ln in sw2 for p in (ln[0], ln[-1])]
    assert tuple(np.round(cr2[0][0], 9)) in tips

def test_insert_extra_vertices_basic():
    """A reference node within tol of a segment interior is inserted
    AT ITS OWN COORDINATES (the QGIS 'insert extra vertices where
    required' semantics of behaviors 0/1)."""
    ln = [np.array([[0.0, 0.0], [10.0, 0.0]])]
    nodes = np.array([[5.0, 0.05]])
    out = refine.insert_extra_vertices(ln, nodes, tol=0.1)
    assert out[0].shape == (3, 2)
    assert np.allclose(out[0][1], [5.0, 0.05])
    # out of tolerance: untouched
    out2 = refine.insert_extra_vertices(ln, np.array([[5.0, 0.5]]),
                                        tol=0.1)
    assert out2[0].shape == (2, 2)


def test_insert_extra_vertices_skips_coincident_and_orders():
    """Nodes coincident with an existing vertex are not duplicated;
    several nodes on one segment insert in order of projection."""
    ln = [np.array([[0.0, 0.0], [10.0, 0.0]])]
    nodes = np.array([[10.0, 0.0],     # coincident with endpoint
                      [7.0, -0.02],
                      [3.0, 0.02]])
    out = refine.insert_extra_vertices(ln, nodes, tol=0.1)
    assert out[0].shape == (4, 2)
    assert np.allclose(out[0], [[0, 0], [3, 0.02], [7, -0.02], [10, 0]])


def test_insert_extra_vertices_single_anchor_near_corner():
    """A node within tol of two adjacent segments (near a corner) is
    inserted once, into the closest segment only."""
    ln = [np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0]])]
    nodes = np.array([[4.95, 0.04]])   # 0.04 from seg0, 0.05 from seg1
    out = refine.insert_extra_vertices(ln, nodes, tol=0.1)
    assert out[0].shape == (4, 2)
    assert np.allclose(out[0][1], [4.95, 0.04])


def test_insert_extra_vertices_owner_exclusion():
    """Self-snap pass: a line's own vertices are never inserted into
    itself."""
    lines = [np.array([[0.0, 0.0], [10.0, 0.0]]),
             np.array([[5.0, 0.05], [5.0, 3.0]])]
    nodes = np.concatenate(lines)
    owners = np.array([0, 0, 1, 1])
    out = refine.insert_extra_vertices(
        lines, nodes, tol=0.1, node_owners=owners, line_owners=[0, 1])
    assert out[0].shape == (3, 2)           # gains line 1's tip
    assert np.allclose(out[0][1], [5.0, 0.05])
    assert out[1].shape == (2, 2)           # nothing lands on line 1


def test_export_snap_inserts_shared_vertex_mid_segment():
    """VERDICT r4 #5: a crossing tip that lands in a sidewalk
    segment's INTERIOR must leave the sidewalk with the shared vertex
    after the export snap (behavior-1 'insert extra vertices')."""
    sw = [np.array([[0.0, 0.0], [10.0, 0.0]])]
    cross = [np.array([[5.0, 0.05], [5.0, 3.0]])]
    sw2, cr2 = refine.export_snap_sequence(sw, cross, disjoint_tol=0.1)
    tip = cr2[0][0]
    assert any(np.allclose(v, tip) for v in sw2[0]), (sw2, cr2)
    assert sw2[0].shape[0] == 3
