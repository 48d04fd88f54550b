"""Pin ConvexSet.query's affine edge-line depth form against the
direct translate-then-cross formula it replaced.

The affine form  d = px*A + py*B + C  (A=-ey/el, B=ex/el,
C=(ey*vx-ex*vy)/el, precomputed per vertex) trades the direct form's
translate-to-edge-origin cancellation protection for ~40% less DRAM
traffic in the kernel's hottest loop. Its absolute rounding error
grows with |p|; these tests pin (a) agreement with the direct form
to far below the EPS_ON on-boundary band at the coordinate
magnitudes the centered-TM pipeline produces, and (b) identical
candidate/argmin classification on adversarial on-boundary points.
"""

import numpy as np

from osm_sidewalkreator_spark.geometry.morph import (
    ConvexSet, EPS_ON, stadium_vertices)
from osm_sidewalkreator_spark.geometry.noding import SNAP


def _depth_direct(cset, px, py, pi, si):
    """Reference: the pre-affine translate-then-cross formula, derived
    from the public polygon array (the intermediate edge vectors are no
    longer retained on the instance)."""
    polys = cset.polys[si]
    vx, vy = polys[:, :, 0], polys[:, :, 1]
    ex = np.roll(vx, -1, axis=1) - vx
    ey = np.roll(vy, -1, axis=1) - vy
    el = np.hypot(ex, ey)
    degen = el == 0
    iel = 1.0 / np.where(degen, 1.0, el)
    qx = px[pi][:, None] - vx
    qy = py[pi][:, None] - vy
    d = (ex * qy - ey * qx) * iel
    if degen.any():
        d = np.where(degen, np.inf, d)
    return d


def _rand_cset(rng, n_polys=40, span=8000.0, r_lo=2.0, r_hi=40.0):
    """Random convex CCW polygons (discs) across a TM-scale extent."""
    cx = rng.uniform(-span, span, n_polys)
    cy = rng.uniform(-span, span, n_polys)
    ax_ = rng.uniform(r_lo, r_hi, n_polys)
    segs = np.column_stack([cx, cy, cx + ax_ * 0.5, cy + ax_ * 0.25])
    radii = rng.uniform(r_lo, r_hi, n_polys)
    return ConvexSet(stadium_vertices(segs, radii, nseg=6))


def test_affine_matches_direct_form_at_tm_scale():
    rng = np.random.default_rng(7)
    cset = _rand_cset(rng)
    # sample points in annuli around member centroids so the candidate
    # path is actually exercised at TM-scale coordinates
    cent = cset.polys.mean(axis=1)
    base = cent[rng.integers(0, len(cent), 4000)]
    px = base[:, 0] + rng.uniform(-60, 60, 4000)
    py = base[:, 1] + rng.uniform(-60, 60, 4000)
    pi, si, depth, mdir = cset.query(px, py, pad=EPS_ON)
    assert len(pi) > 100  # the fixture actually exercises the path
    d_ref = _depth_direct(cset, px, py, pi, si)
    ref_depth = d_ref[np.arange(len(pi)), np.argmin(d_ref, axis=1)]
    # agreement far below the 5e-5 on-boundary band (and the 1e-5
    # snap grid) at |p| ~ 1e4 m — the documented numerical margin
    assert np.max(np.abs(depth - ref_depth)) < 1e-8
    # mdir is a unit edge direction in both forms
    assert np.allclose(np.hypot(mdir[:, 0], mdir[:, 1]), 1.0, atol=1e-12)


def test_affine_classification_on_boundary_points():
    """Points sitting exactly ON member boundary vertices/edges (the
    worst case for cancellation) classify identically to the direct
    form under every pad the pipeline uses (0 and EPS_ON)."""
    rng = np.random.default_rng(11)
    cset = _rand_cset(rng, n_polys=25, span=5000.0)
    # query points = snapped polygon vertices + edge midpoints
    verts = cset.polys.reshape(-1, 2)
    mids = (cset.polys + np.roll(cset.polys, -1, axis=1)).reshape(-1, 2) / 2
    pts = np.vstack([verts, mids])
    px, py = pts[:, 0], pts[:, 1]
    for pad in (0.0, EPS_ON):
        pi, si, depth, _ = cset.query(px, py, pad=pad)
        d_ref = _depth_direct(cset, px, py, pi, si)
        ref_depth = d_ref[np.arange(len(pi)), np.argmin(d_ref, axis=1)]
        assert np.max(np.abs(depth - ref_depth)) < 1e-8
        # every returned pair satisfies the keep predicate by margin
        # or sits in a numerically-safe band around it
        assert (depth > -pad - 1e-8).all()


def test_affine_depth_sign_semantics():
    """Deep-inside points read large positive depth; far-outside
    points are filtered out entirely (no candidate within pad)."""
    segs = np.array([[0.0, 0.0, 10.0, 0.0]])
    cset = ConvexSet(stadium_vertices(segs, np.array([5.0]), nseg=8))
    px = np.array([5.0, 500.0])
    py = np.array([0.0, 500.0])
    pi, si, depth, _ = cset.query(px, py, pad=0.0)
    assert list(pi) == [0]
    assert depth[0] > 4.0  # ~5 m deep at the capsule center
    # snapped-vertex point exactly on the boundary: |depth| <= snap
    bx = cset.polys[0, 0, 0:1]
    by = cset.polys[0, 0, 1:2]
    pi2, _, depth2, _ = cset.query(bx, by, pad=EPS_ON)
    assert len(pi2) >= 1
    assert np.min(np.abs(depth2)) <= SNAP + 1e-8
