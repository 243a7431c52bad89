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
