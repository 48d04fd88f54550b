"""Minimal WKB codec (little-endian, 2D) in pure NumPy.

Replaces the reference's reliance on QGIS/GEOS geometry objects
(``/root/reference/generic_functions.py:1062-1116``) with a byte-level
codec so geometry columns are plain Spark ``BinaryType``.

Supported: Point(1), LineString(2), Polygon(3), MultiPoint(4),
MultiLineString(5), MultiPolygon(6).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")
_D2 = struct.Struct("<2d")


# ---------- encode ----------

def point_wkb(x: float, y: float) -> bytes:
    return _HDR.pack(1, POINT) + _D2.pack(x, y)


def points_wkb(xs: np.ndarray, ys: np.ndarray) -> list[bytes]:
    """Vectorized point encoding for large page tables."""
    n = len(xs)
    buf = np.empty(n, dtype=[("e", "u1"), ("t", "<u4"), ("x", "<f8"), ("y", "<f8")])
    buf["e"] = 1
    buf["t"] = POINT
    buf["x"] = np.asarray(xs, dtype=np.float64)
    buf["y"] = np.asarray(ys, dtype=np.float64)
    raw = buf.tobytes()
    sz = buf.itemsize
    return [raw[i * sz:(i + 1) * sz] for i in range(n)]


def linestring_wkb(coords: np.ndarray) -> bytes:
    c = np.ascontiguousarray(coords, dtype="<f8")
    return _HDR.pack(1, LINESTRING) + _U32.pack(len(c)) + c.tobytes()


def polygon_wkb(shell: np.ndarray, holes: list[np.ndarray] | None = None) -> bytes:
    rings = [shell] + list(holes or [])
    out = [_HDR.pack(1, POLYGON), _U32.pack(len(rings))]
    for r in rings:
        c = np.ascontiguousarray(r, dtype="<f8")
        out.append(_U32.pack(len(c)))
        out.append(c.tobytes())
    return b"".join(out)


def multilinestring_wkb(lines: list[np.ndarray]) -> bytes:
    out = [_HDR.pack(1, MULTILINESTRING), _U32.pack(len(lines))]
    for ln in lines:
        out.append(linestring_wkb(ln))
    return b"".join(out)


def multipolygon_wkb(polys: list[tuple[np.ndarray, list[np.ndarray]]]) -> bytes:
    out = [_HDR.pack(1, MULTIPOLYGON), _U32.pack(len(polys))]
    for shell, holes in polys:
        out.append(polygon_wkb(shell, holes))
    return b"".join(out)


def multipoint_wkb(coords: np.ndarray) -> bytes:
    c = np.asarray(coords, dtype=np.float64)
    out = [_HDR.pack(1, MULTIPOINT), _U32.pack(len(c))]
    for x, y in c:
        out.append(point_wkb(x, y))
    return b"".join(out)


# ---------- decode ----------

def geom_type(wkb: bytes) -> int:
    _, t = _HDR.unpack_from(wkb, 0)
    return t & 0xFF  # mask Z/M/SRID flag variants


def _read_coords(wkb: bytes, off: int) -> tuple[np.ndarray, int]:
    (n,) = _U32.unpack_from(wkb, off)
    off += 4
    arr = np.frombuffer(wkb, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr, off + 16 * n


def decode(wkb: bytes) -> tuple[int, list[np.ndarray]]:
    """Decode any supported geometry to (type, list of coordinate arrays).

    Points -> one (1,2) array; LineString -> one (n,2); Polygon -> one array
    per ring (shell first); Multi* -> concatenation of each part's arrays.
    For MultiPolygon, ring grouping is recoverable via ``decode_polygons``.
    """
    byte_order, t = _HDR.unpack_from(wkb, 0)
    t &= 0xFF
    off = _HDR.size
    if t == POINT:
        arr = np.frombuffer(wkb, dtype="<f8", count=2, offset=off).reshape(1, 2)
        return t, [arr]
    if t == LINESTRING:
        arr, _ = _read_coords(wkb, off)
        return t, [arr]
    if t == POLYGON:
        (nr,) = _U32.unpack_from(wkb, off)
        off += 4
        rings = []
        for _ in range(nr):
            r, off = _read_coords(wkb, off)
            rings.append(r)
        return t, rings
    if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        (np_, ) = _U32.unpack_from(wkb, off)
        off += 4
        parts: list[np.ndarray] = []
        for _ in range(np_):
            sub_t, sub_parts = decode(wkb[off:])
            parts.extend(sub_parts)
            off += _part_size(wkb, off)
        return t, parts
    raise ValueError(f"unsupported wkb type {t}")


def _part_size(wkb: bytes, off: int) -> int:
    _, t = _HDR.unpack_from(wkb, off)
    t &= 0xFF
    p = off + _HDR.size
    if t == POINT:
        return _HDR.size + 16
    if t == LINESTRING:
        (n,) = _U32.unpack_from(wkb, p)
        return _HDR.size + 4 + 16 * n
    if t == POLYGON:
        (nr,) = _U32.unpack_from(wkb, p)
        p += 4
        for _ in range(nr):
            (n,) = _U32.unpack_from(wkb, p)
            p += 4 + 16 * n
        return p - off
    raise ValueError(f"unsupported nested wkb type {t}")


def decode_lines(wkb: bytes) -> list[np.ndarray]:
    """LineString or MultiLineString -> list of (n,2) arrays."""
    t, parts = decode(wkb)
    if t not in (LINESTRING, MULTILINESTRING):
        raise ValueError(f"expected (multi)linestring, got {t}")
    return parts


def decode_polygons(wkb: bytes) -> list[list[np.ndarray]]:
    """Polygon or MultiPolygon -> list of [shell, hole, ...] ring lists."""
    byte_order, t = _HDR.unpack_from(wkb, 0)
    t &= 0xFF
    if t == POLYGON:
        _, rings = decode(wkb)
        return [rings]
    if t == MULTIPOLYGON:
        (np_,) = _U32.unpack_from(wkb, _HDR.size)
        off = _HDR.size + 4
        out = []
        for _ in range(np_):
            _, rings = decode(wkb[off:])
            out.append(rings)
            off += _part_size(wkb, off)
        return out
    raise ValueError(f"expected (multi)polygon, got {t}")


def decode_point(wkb: bytes) -> tuple[float, float]:
    t, parts = decode(wkb)
    if t != POINT:
        raise ValueError(f"expected point, got {t}")
    return float(parts[0][0, 0]), float(parts[0][0, 1])


def decode_points_vec(wkbs) -> np.ndarray:
    """Vectorized decode of a homogeneous array of 2D point WKBs -> (n,2)."""
    raw = b"".join(wkbs)
    n = len(wkbs)
    if n == 0:
        return np.empty((0, 2))
    rec = np.frombuffer(raw, dtype=[("e", "u1"), ("t", "<u4"), ("x", "<f8"), ("y", "<f8")])
    assert len(rec) == n
    return np.column_stack([rec["x"], rec["y"]])
