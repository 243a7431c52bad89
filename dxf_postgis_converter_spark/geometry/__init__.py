from .wkb import (  # noqa: F401
    POINT_Z,
    LINESTRING_Z,
    POLYGON_Z,
    MULTIPOLYGON_Z,
    GEOM_TYPE_NAMES,
    wkb_point,
    wkb_linestring,
    wkb_polygon,
    wkb_multipolygon,
    parse_wkb,
    wkb_bbox,
)
