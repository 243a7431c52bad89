"""Planar predicates in vectorized numpy (no shapely available).

Used for (a) the exact point-in-polygon refine after the cell-cover
candidate join (SURVEY §4.3 "exact-geometry refine"), and (b) the
circle/polygon cases of the reference's bbox area-selection rules
(area_selector.py:64-74 → ezdxf.select bbox semantics: INSIDE = entity
bbox fully inside the shape, OUTSIDE = fully outside, INTERSECT/overlap =
any intersection; evaluated on bounding boxes, NOT exact geometry — that
bbox behaviour is part of the join-row contract and is reproduced here).
"""

from __future__ import annotations

import numpy as np


def _ring_crossings(px: np.ndarray, py: np.ndarray, ring: np.ndarray):
    """One ring's (horizontal-ray crossing counts, on-boundary mask) for a
    batch of points — the shared kernel of the single-ring and
    multi-ring containment tests below."""
    ring = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(ring) and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)

    pxc = px[:, None]
    pyc = py[:, None]
    # edges straddling the horizontal ray
    cond = (y1[None, :] > pyc) != (y2[None, :] > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (pyc - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    crossings = (cond & (pxc < xint)).sum(axis=1)
    on_edge = _points_on_segments(pxc, pyc, x1, y1, x2, y2)
    return crossings, on_edge


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting; boundary points count as inside
    (matches shapely ``covers`` on non-degenerate inputs).

    px, py: (n,) point coords. ring: (m,2) polygon ring (closed or open).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    crossings, on_edge = _ring_crossings(px, py, ring)
    return (crossings % 2 == 1) | on_edge


def points_in_polygon_rings(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd containment over ALL rings of one polygon (exterior +
    interior holes): a point is inside when its total crossing count over
    every ring is odd; a point ON any ring (including a hole boundary) is
    covered (shapely ``covers``: the boundary of a hole belongs to the
    polygon). rings: iterable of (m,>=2) arrays."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    total = np.zeros(len(px), dtype=np.int64)
    on_edge = np.zeros(len(px), dtype=bool)
    for ring in rings:
        c, e = _ring_crossings(px, py, ring)
        total += c
        on_edge |= e
    return (total % 2 == 1) | on_edge


def points_covered(px: np.ndarray, py: np.ndarray, geom) -> np.ndarray:
    """Containment against a parsed WKB geometry (``wkb.parse_wkb``
    output): POLYGON = list of rings (even-odd incl. holes);
    MULTIPOLYGON = list of polygons (covered by ANY part).

    Semantics contract: shapely ``covers`` (the reference joins PostGIS
    geometries built via shapely — postgis_entity_converter.py polygon
    path; SURVEY §2.10), i.e. boundary points count, including points on
    an interior ring — the hole's boundary belongs to the polygon."""
    rings = geom
    if len(rings) and isinstance(rings[0], (list, tuple)):  # MULTIPOLYGON
        out = np.zeros(len(np.asarray(px)), dtype=bool)
        for poly_rings in rings:
            out |= points_in_polygon_rings(px, py, poly_rings)
        return out
    return points_in_polygon_rings(px, py, rings)


def _points_on_segments(pxc, pyc, x1, y1, x2, y2, eps=1e-12):
    dx, dy = (x2 - x1)[None, :], (y2 - y1)[None, :]
    cross = (pxc - x1[None, :]) * dy - (pyc - y1[None, :]) * dx
    within = (
        (np.minimum(x1, x2)[None, :] - eps <= pxc) & (pxc <= np.maximum(x1, x2)[None, :] + eps)
        & (np.minimum(y1, y2)[None, :] - eps <= pyc) & (pyc <= np.maximum(y1, y2)[None, :] + eps)
    )
    scale = np.maximum(np.abs(dx), np.abs(dy)) + 1.0
    return ((np.abs(cross) <= eps * scale) & within).any(axis=1)


def segments_intersect(a1, a2, b1, b2) -> bool:
    """Proper or touching intersection of segments a1-a2 and b1-b2."""
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        if abs(v) < 1e-12:
            return 0
        return 1 if v > 0 else -1

    def on_seg(p, q, r):
        return (min(p[0], q[0]) - 1e-12 <= r[0] <= max(p[0], q[0]) + 1e-12
                and min(p[1], q[1]) - 1e-12 <= r[1] <= max(p[1], q[1]) + 1e-12)

    o1, o2 = orient(a1, a2, b1), orient(a1, a2, b2)
    o3, o4 = orient(b1, b2, a1), orient(b1, b2, a2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(a1, a2, b1):
        return True
    if o2 == 0 and on_seg(a1, a2, b2):
        return True
    if o3 == 0 and on_seg(b1, b2, a1):
        return True
    if o4 == 0 and on_seg(b1, b2, a2):
        return True
    return False


def _rect_corners(xmin, ymin, xmax, ymax):
    return np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])


def _rect_edges(xmin, ymin, xmax, ymax):
    c = _rect_corners(xmin, ymin, xmax, ymax)
    return [(c[i], c[(i + 1) % 4]) for i in range(4)]


def _ring_edges(ring: np.ndarray):
    ring = np.asarray(ring, dtype=np.float64)[:, :2]
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0:1]])
    return [(ring[i], ring[i + 1]) for i in range(len(ring) - 1)]


# --- circle vs bbox (ezdxf select.Circle semantics) ------------------------

def circle_bbox_inside(cx, cy, r, xmin, ymin, xmax, ymax) -> bool:
    """bbox fully inside circle: all 4 corners within radius."""
    c = _rect_corners(xmin, ymin, xmax, ymax)
    return bool((((c[:, 0] - cx) ** 2 + (c[:, 1] - cy) ** 2) <= r * r).all())


def circle_bbox_overlap(cx, cy, r, xmin, ymin, xmax, ymax) -> bool:
    """circle-rect intersection: clamp center into rect, compare distance."""
    qx = min(max(cx, xmin), xmax)
    qy = min(max(cy, ymin), ymax)
    return (qx - cx) ** 2 + (qy - cy) ** 2 <= r * r


# --- polygon vs bbox (ezdxf select.Polygon semantics) -----------------------

def polygon_bbox_inside(ring, xmin, ymin, xmax, ymax) -> bool:
    """bbox fully inside polygon: all corners inside AND no edge crossing."""
    c = _rect_corners(xmin, ymin, xmax, ymax)
    if not points_in_polygon(c[:, 0], c[:, 1], np.asarray(ring)).all():
        return False
    for re in _rect_edges(xmin, ymin, xmax, ymax):
        for pe in _ring_edges(ring):
            if segments_intersect(re[0], re[1], pe[0], pe[1]):
                return False
    return True


def polygon_bbox_overlap(ring, xmin, ymin, xmax, ymax) -> bool:
    """any contact: corner of bbox in polygon, polygon vertex in bbox, or
    edge intersection."""
    ring = np.asarray(ring, dtype=np.float64)[:, :2]
    c = _rect_corners(xmin, ymin, xmax, ymax)
    if points_in_polygon(c[:, 0], c[:, 1], ring).any():
        return True
    vin = (ring[:, 0] >= xmin) & (ring[:, 0] <= xmax) & (ring[:, 1] >= ymin) & (ring[:, 1] <= ymax)
    if vin.any():
        return True
    for re in _rect_edges(xmin, ymin, xmax, ymax):
        for pe in _ring_edges(ring):
            if segments_intersect(re[0], re[1], pe[0], pe[1]):
                return True
    return False
