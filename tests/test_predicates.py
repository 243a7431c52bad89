import numpy as np
from hypothesis import assume, given, settings, strategies as st

from dxf_postgis_converter_spark.geometry.predicates import (
    circle_bbox_inside, circle_bbox_overlap, points_in_polygon,
    polygon_bbox_inside, polygon_bbox_overlap, segments_intersect,
)

SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
CONCAVE = np.array([[0, 0], [10, 0], [10, 10], [5, 5], [0, 10]], float)


def test_pip_square():
    px = np.array([5.0, -1.0, 10.0, 0.0, 15.0])
    py = np.array([5.0, 5.0, 5.0, 0.0, 5.0])
    got = points_in_polygon(px, py, SQUARE)
    assert got.tolist() == [True, False, True, True, False]  # boundary inclusive


def test_pip_concave():
    # (5,7) is inside the notch → outside the polygon
    got = points_in_polygon(np.array([5.0, 5.0]), np.array([7.0, 2.0]), CONCAVE)
    assert got.tolist() == [False, True]


@settings(max_examples=200, deadline=None)
@given(st.floats(-12, 22), st.floats(-12, 22))
def test_pip_square_hypothesis(x, y):
    # skip the intentional boundary-tolerance band (predicate is
    # boundary-inclusive with ~1e-12 eps)
    assume(min(abs(x - 0), abs(x - 10), abs(y - 0), abs(y - 10)) > 1e-9)
    exp = (0 <= x <= 10) and (0 <= y <= 10)
    got = points_in_polygon(np.array([x]), np.array([y]), SQUARE)[0]
    assert bool(got) == exp


def test_segments_intersect():
    assert segments_intersect((0, 0), (10, 10), (0, 10), (10, 0))
    assert not segments_intersect((0, 0), (1, 1), (2, 2), (3, 3))
    assert segments_intersect((0, 0), (5, 5), (5, 5), (9, 1))  # touching


def test_circle_bbox():
    assert circle_bbox_inside(0, 0, 10, -1, -1, 1, 1)
    assert not circle_bbox_inside(0, 0, 1, -1, -1, 1, 1)  # corners outside r=1
    assert circle_bbox_overlap(0, 0, 1, -1, -1, 1, 1)
    assert not circle_bbox_overlap(0, 0, 1, 5, 5, 6, 6)
    assert circle_bbox_overlap(5.5, 5.5, 1, 5, 5, 6, 6)  # center inside rect


def test_polygon_bbox():
    assert polygon_bbox_inside(SQUARE, 2, 2, 8, 8)
    assert not polygon_bbox_inside(SQUARE, 2, 2, 12, 8)  # sticks out
    assert not polygon_bbox_inside(CONCAVE, 2, 2, 8, 8)  # notch cuts through
    assert polygon_bbox_overlap(SQUARE, 8, 8, 15, 15)
    assert not polygon_bbox_overlap(SQUARE, 11, 11, 15, 15)
    assert polygon_bbox_overlap(SQUARE, -5, -5, 15, 15)  # bbox contains polygon


def test_points_covered_holes_and_multi():
    """Even-odd over interior rings + any-part MultiPolygon semantics."""
    import numpy as np

    from dxf_postgis_converter_spark.geometry.predicates import points_covered
    from dxf_postgis_converter_spark.geometry.wkb import (
        parse_wkb, wkb_multipolygon, wkb_polygon,
    )

    def rect(x0, y0, x1, y1):
        return np.array([[x0, y0, 0], [x1, y0, 0], [x1, y1, 0],
                         [x0, y1, 0], [x0, y0, 0]], dtype=float)

    _, holed = parse_wkb(wkb_polygon(rect(0, 0, 10, 10),
                                     holes=[rect(3, 3, 7, 7)]))
    px = np.array([1.0, 5.0, 3.0, 7.0, 0.0, 11.0])
    py = np.array([1.0, 5.0, 5.0, 7.0, 0.0, 5.0])
    assert points_covered(px, py, holed).tolist() == \
        [True, False, True, True, True, False]

    _, multi = parse_wkb(wkb_multipolygon([rect(0, 0, 2, 2),
                                           rect(5, 5, 7, 7)]))
    assert points_covered(np.array([1.0, 6.0, 3.5]),
                          np.array([1.0, 6.0, 3.5]), multi).tolist() == \
        [True, True, False]


# ---------------------------------------------------------------------------
# Cross-algorithm agreement fuzz (VERDICT r4 "oracle monoculture" note):
# the engine's even-odd ray cast and the replica's winding-number kernel
# share NO crossing bookkeeping — vertex handling, horizontal edges, and
# left/right strictness are derived independently — so fuzzed agreement
# over random simple polygons is evidence neither family hides a
# degenerate-edge blind spot the other shares.
# ---------------------------------------------------------------------------

def _star_ring(draw):
    """Random star-shaped (always simple) polygon: sorted angles around
    (50, 50), radii on a 0.01 grid so no vertex sits within fp-noise of a
    test point unintentionally."""
    n = draw(st.integers(3, 12))
    angles = draw(st.lists(
        st.integers(0, 35999), min_size=n, max_size=n, unique=True))
    radii = draw(st.lists(
        st.integers(100, 4500), min_size=n, max_size=n))
    ang = np.sort(np.array(angles, float)) * (np.pi / 18000.0)
    rad = np.array(radii, float) / 100.0
    return np.stack([50.0 + rad * np.cos(ang),
                     50.0 + rad * np.sin(ang)], axis=1)


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_even_odd_agrees_with_winding_number(data):
    from dxf_postgis_converter_spark.replicas import winding_covers

    ring = _star_ring(data.draw)
    # probe batch: a coarse interior/exterior grid, every vertex (exactly
    # on the boundary), every edge midpoint (on the boundary within the
    # shared eps contract), and rays THROUGH vertices (same y as a vertex
    # but displaced x — the classic crossing-count blind spot)
    gx, gy = np.meshgrid(np.linspace(0.0, 100.0, 21),
                         np.linspace(0.0, 100.0, 21))
    mids = (ring + np.roll(ring, -1, axis=0)) / 2.0
    through = np.stack([ring[:, 0] + 7.3, ring[:, 1]], axis=1)
    through2 = np.stack([ring[:, 0] - 11.9, ring[:, 1]], axis=1)
    pts = np.concatenate([
        np.stack([gx.ravel(), gy.ravel()], axis=1),
        ring, mids, through, through2])
    px, py = pts[:, 0], pts[:, 1]

    eo = points_in_polygon(px, py, ring)
    wn = winding_covers(px, py, ring)
    disagree = np.nonzero(eo != wn)[0]
    assert disagree.size == 0, (
        [(px[i], py[i], bool(eo[i]), bool(wn[i])) for i in disagree[:5]],
        ring.tolist())


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_even_odd_rings_agree_with_winding_number_on_holes(data):
    """Holed-polygon twin: even-odd crossing SUMS over all rings
    (points_in_polygon_rings) vs the winding-number composition
    wn(exterior)!=0 AND wn(hole)==0, boundary-inclusive on every ring —
    independently derived bookkeeping for the ring-complete refine."""
    from dxf_postgis_converter_spark.geometry.predicates import (
        points_in_polygon_rings,
    )
    from dxf_postgis_converter_spark.replicas import winding_covers

    # Exterior star with radii 10..45 whose vertices are jittered around
    # an even angular spread (max gap ≤ 2·360/n ≤ 90° at n ≥ 8), so its
    # inscribed disk around the center has radius ≥ 10·cos(45°) ≈ 7.07 —
    # the hole (radii ≤ 4) is then guaranteed strictly interior, keeping
    # the polygon OGC-valid (the even-odd SUM contract assumes a valid
    # ring set: an earlier unconstrained generator produced a sliver
    # exterior NOT containing the hole and "found" a vacuous mismatch).
    n1 = data.draw(st.integers(8, 14))
    step = 36000 // n1
    jit = np.array(data.draw(st.lists(
        st.integers(0, step - 1), min_size=n1, max_size=n1)), float)
    ang1 = (np.arange(n1) * step + jit) * (np.pi / 18000.0)
    rad1 = np.array(data.draw(st.lists(
        st.integers(1000, 4500), min_size=n1, max_size=n1)), float) / 100.0
    ext = np.stack([50.0 + rad1 * np.cos(ang1),
                    50.0 + rad1 * np.sin(ang1)], axis=1)
    n2 = data.draw(st.integers(3, 8))
    ang2 = np.sort(np.array(data.draw(st.lists(
        st.integers(0, 35999), min_size=n2, max_size=n2, unique=True)),
        float)) * (np.pi / 18000.0)
    rad2 = np.array(data.draw(st.lists(
        st.integers(100, 400), min_size=n2, max_size=n2)), float) / 100.0
    hole = np.stack([50.0 + rad2 * np.cos(ang2),
                     50.0 + rad2 * np.sin(ang2)], axis=1)

    gx, gy = np.meshgrid(np.linspace(0.0, 100.0, 15),
                         np.linspace(0.0, 100.0, 15))
    ring_pts = np.concatenate([ext, hole])
    mids = np.concatenate([(ext + np.roll(ext, -1, axis=0)) / 2.0,
                           (hole + np.roll(hole, -1, axis=0)) / 2.0])
    through = np.stack([ring_pts[:, 0] + 5.1, ring_pts[:, 1]], axis=1)
    pts = np.concatenate([
        np.stack([gx.ravel(), gy.ravel()], axis=1), ring_pts, mids, through])
    px, py = pts[:, 0], pts[:, 1]

    eo = points_in_polygon_rings(px, py, [ext, hole])
    # winding composition: in exterior, not strictly in hole, or ON any
    # ring (hole boundaries belong to the polygon — covers semantics)
    on_any = np.zeros(len(px), dtype=bool)
    strict_hole = winding_covers(px, py, hole)
    # winding_covers is boundary-INCLUSIVE; carve out "strictly inside
    # the hole" = covered by hole minus on-hole-boundary
    from dxf_postgis_converter_spark.geometry.predicates import (
        _points_on_segments,
    )
    def on_ring(ring):
        r = ring
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        return _points_on_segments(px[:, None], py[:, None], x1, y1, x2, y2)
    on_any = on_ring(ext) | on_ring(hole)
    wn = (winding_covers(px, py, ext)
          & ~(strict_hole & ~on_ring(hole))) | on_any
    disagree = np.nonzero(eo != wn)[0]
    assert disagree.size == 0, (
        [(px[i], py[i], bool(eo[i]), bool(wn[i])) for i in disagree[:5]])


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_multipolygon_covered_agrees_with_winding_number(data):
    """MULTIPOLYGON any-part coverage (points_covered) vs the winding
    twin OR-composed over parts — two disjoint star parts (centers 60
    apart, radii ≤ 25, so parts cannot touch)."""
    from dxf_postgis_converter_spark.geometry.predicates import points_covered
    from dxf_postgis_converter_spark.replicas import winding_covers

    parts = []
    for cx in (20.0, 80.0):
        n = data.draw(st.integers(3, 10))
        ang = np.sort(np.array(data.draw(st.lists(
            st.integers(0, 35999), min_size=n, max_size=n, unique=True)),
            float)) * (np.pi / 18000.0)
        rad = np.array(data.draw(st.lists(
            st.integers(100, 2500), min_size=n, max_size=n)), float) / 100.0
        parts.append(np.stack([cx + rad * np.cos(ang),
                               50.0 + rad * np.sin(ang)], axis=1))

    gx, gy = np.meshgrid(np.linspace(-10.0, 110.0, 17),
                         np.linspace(20.0, 80.0, 9))
    verts = np.concatenate(parts)
    mids = np.concatenate([(p + np.roll(p, -1, axis=0)) / 2.0 for p in parts])
    through = np.stack([verts[:, 0] + 3.7, verts[:, 1]], axis=1)
    pts = np.concatenate([
        np.stack([gx.ravel(), gy.ravel()], axis=1), verts, mids, through])
    px, py = pts[:, 0], pts[:, 1]

    eo = points_covered(px, py, [[p] for p in parts])  # MULTIPOLYGON shape
    wn = winding_covers(px, py, parts[0]) | winding_covers(px, py, parts[1])
    disagree = np.nonzero(eo != wn)[0]
    assert disagree.size == 0, (
        [(px[i], py[i], bool(eo[i]), bool(wn[i])) for i in disagree[:5]])
