"""Uniform-grid candidate joins (the engine's R-tree-prefilter analog,
cf. ``generic_functions.py:999-1020``). Pure NumPy, used inside per-tile
kernels; the cross-partition analog is the Spark cell equi-join in
``osm_sidewalkreator_spark/operators/joins.py``.
"""

from __future__ import annotations

import numpy as np


def _cell_key(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (ix.astype(np.int64) << 32) ^ (iy.astype(np.int64) & 0xFFFFFFFF)


def explode_bbox_cells(boxes: np.ndarray, bin_size: float
                       ) -> tuple[np.ndarray, np.ndarray]:
    """boxes (n,4) [xmin,ymin,xmax,ymax] -> (owner_ids, cell_keys)."""
    n = len(boxes)
    ix0 = np.floor(boxes[:, 0] / bin_size).astype(np.int64)
    iy0 = np.floor(boxes[:, 1] / bin_size).astype(np.int64)
    ix1 = np.floor(boxes[:, 2] / bin_size).astype(np.int64)
    iy1 = np.floor(boxes[:, 3] / bin_size).astype(np.int64)
    counts = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    owners = np.repeat(np.arange(n), counts)
    cells = np.empty(int(counts.sum()), dtype=np.int64)
    pos = 0
    for i in range(n):
        c = int(counts[i])
        if c == 1:
            cells[pos] = _cell_key(ix0[i:i + 1], iy0[i:i + 1])[0]
        else:
            gx = np.arange(ix0[i], ix1[i] + 1)
            gy = np.arange(iy0[i], iy1[i] + 1)
            cells[pos:pos + c] = ((gx[:, None] << 32)
                                  ^ (gy[None, :] & 0xFFFFFFFF)).ravel()
        pos += c
    return owners, cells


def join_points_to_boxes(px: np.ndarray, py: np.ndarray, boxes: np.ndarray,
                         bin_size: float) -> tuple[np.ndarray, np.ndarray]:
    """Candidate (point_idx, box_idx) pairs where the point's cell is
    covered by the box's cell range. Exact bbox check applied."""
    if len(boxes) == 0 or len(px) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    owners, cells = explode_bbox_cells(boxes, bin_size)
    order = np.argsort(cells, kind="stable")
    cells_s = cells[order]
    owners_s = owners[order]
    pk = _cell_key(np.floor(px / bin_size).astype(np.int64),
                   np.floor(py / bin_size).astype(np.int64))
    lo = np.searchsorted(cells_s, pk, side="left")
    hi = np.searchsorted(cells_s, pk, side="right")
    counts = hi - lo
    pi = np.repeat(np.arange(len(px)), counts)
    # gather matched owners
    idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi) if h > l]) \
        if counts.sum() else np.empty(0, np.int64)
    bi = owners_s[idx] if len(idx) else np.empty(0, np.int64)
    if len(pi):
        keep = ((px[pi] >= boxes[bi, 0]) & (px[pi] <= boxes[bi, 2])
                & (py[pi] >= boxes[bi, 1]) & (py[pi] <= boxes[bi, 3]))
        pi, bi = pi[keep], bi[keep]
    return pi, bi
