"""Pure-function encoding of the reference's ezdxf extraction rules —
the ingest contract, executable and golden-tested WITHOUT ezdxf.

The reference reads entities with ezdxf and extracts, per entity:
- base attributes (dxf_reader.py:89-146): the merged dxfattribs plus the
  seven guaranteed keys, a JSON-safe dxf_attribs copy (vectors → [x,y,z],
  non-primitives → str), and the source layer's style snapshot
  (layer_dxf_attribs) so ByLayer rendering survives round-trip;
- per-type geometry dicts (dxf_reader.py:148-720): field mappings listed
  in EXTRACTORS below, copied rule-for-rule;
- SPLINE read-time flattening with distance tolerance 0.01
  (dxf_reader.py: _extract_spline_data → dxfentity.flattening(0.01)).

Here each rule operates on a plain dict snapshot of the dxf attribute
namespace (what `dxfentity.dxf.<attr>` / helper methods would yield), so
the rules are unit-testable today and become the single source of truth
for sources/dxf_files._spans_from_dxf the day ezdxf is installed: the
ezdxf adapter's only job is building the snapshot dict.

Vectors may arrive as objects with .x/.y/.z (ezdxf Vec3), tuples, or
lists — vec3_to_list normalizes exactly like the reference.
"""

from __future__ import annotations

import math
from typing import Any

# ezdxf defaults for the seven guaranteed base attributes
# (dxf_reader.py:93-101 reads them unconditionally off dxfentity.dxf)
BASE_ATTRIBUTE_DEFAULTS = {
    "color": 256,            # ACI BYLAYER
    "linetype": "BYLAYER",
    "lineweight": -1,        # LINEWEIGHT_BYLAYER
    "ltscale": 1.0,
    "invisible": 0,
    "true_color": None,
    "transparency": None,
}

LAYER_STYLE_KEYS = ("color", "linetype", "lineweight", "plot",
                    "true_color", "transparency", "ltscale")


def vec3_to_list(v) -> Any:
    """dxf_reader.py:188-192 verbatim: .x/.y/.z objects → [x, y, z]."""
    if hasattr(v, "x") and hasattr(v, "y") and hasattr(v, "z"):
        return [v.x, v.y, v.z]
    return v


def _json_safe(value):
    """dxf_reader.py:110-116: vectors → list, primitives pass, else str."""
    if hasattr(value, "x"):
        return [value.x, getattr(value, "y", 0.0), getattr(value, "z", 0.0)]
    if isinstance(value, (int, float, str, bool, list, tuple)) or value is None:
        return value
    return str(value)


def base_attributes(dxfattribs: dict, dxftype: str,
                    layer_styles: dict[str, dict] | None = None):
    """(attributes, extra_data) per dxf_reader.py:89-146.

    dxfattribs: the entity's raw attribute mapping (ezdxf .dxfattribs()).
    layer_styles: optional {layer_name: {style key: value}} table; when
    the entity's layer has a record, extra_data carries layer_name +
    layer_dxf_attribs (None-valued keys skipped) — the ByLayer snapshot.
    """
    attributes = dict(dxfattribs)
    for k, dflt in BASE_ATTRIBUTE_DEFAULTS.items():
        attributes[k] = dxfattribs.get(k, dflt)
    extra_data = {
        "dxftype": dxftype,
        "dxf_attribs": {k: _json_safe(v) for k, v in attributes.items()},
    }
    layer_name = str(dxfattribs.get("layer", "") or "")
    if layer_styles and layer_name and layer_name in layer_styles:
        snap = {}
        for key in LAYER_STYLE_KEYS:
            value = layer_styles[layer_name].get(key)
            if value is None:
                continue
            snap[key] = _json_safe(value)
        if snap:
            extra_data["layer_name"] = layer_name
            extra_data["layer_dxf_attribs"] = snap
    return attributes, extra_data


# ---------------------------------------------------------------------------
# SPLINE flattening (dxf_reader.py _extract_spline_data: flattening(0.01))
# ---------------------------------------------------------------------------

def _deboor(knots, ctrl, degree, t):
    """De Boor evaluation of a clamped B-spline at parameter t."""
    n = len(ctrl) - 1
    # find the knot span k with knots[k] <= t < knots[k+1]
    hi = n + 1
    if t >= knots[hi]:
        k = hi - 1
    else:
        k = degree
        while not (knots[k] <= t < knots[k + 1]):
            k += 1
    d = [list(ctrl[j]) for j in range(k - degree, k + 1)]
    for r in range(1, degree + 1):
        for j in range(degree, r - 1, -1):
            i = j + k - degree
            denom = knots[i + degree - r + 1] - knots[i]
            alpha = 0.0 if denom == 0.0 else (t - knots[i]) / denom
            d[j] = [(1 - alpha) * a + alpha * b for a, b in zip(d[j - 1], d[j])]
    return tuple(d[degree])


def uniform_clamped_knots(n_ctrl: int, degree: int) -> list[float]:
    """The standard clamped uniform knot vector ezdxf builds when a
    SPLINE carries control points but no explicit knots."""
    inner = n_ctrl - degree - 1
    return ([0.0] * (degree + 1)
            + [float(i + 1) / (inner + 1) for i in range(inner)]
            + [1.0] * (degree + 1))


def flatten_spline(control_points, degree: int = 3, knots=None,
                   distance: float = 0.01, segments: int = 4):
    """Adaptive flattening with max chord-sag `distance` — the contract
    of ezdxf's Curve.flattening(0.01) the reference relies on
    (dxf_reader.py:280): recursively bisect each of `segments` initial
    parameter spans until the midpoint of the curve lies within
    `distance` of the chord. Returns the polyline vertices including
    both endpoints.

    This is the documented seam for real-ingest parity: it implements the
    same approximation guarantee (every curve point within `distance` of
    the emitted polyline); golden tests pin its output so any later
    refactor (or a swap-in of ezdxf itself) is diffable.
    """
    ctrl = []
    for p in control_points:
        q = list(vec3_to_list(p))
        ctrl.append(tuple(float(c) for c in (q + [0.0, 0.0])[:3]))
    if len(ctrl) <= degree:
        return [list(p) for p in ctrl]
    if knots is None:
        knots = uniform_clamped_knots(len(ctrl), degree)
    t0, t1 = knots[degree], knots[len(ctrl)]

    def point(t):
        return _deboor(knots, ctrl, degree, t)

    def chord_dist(p, a, b):
        ax, ay, az = a
        bx, by, bz = b
        vx, vy, vz = bx - ax, by - ay, bz - az
        wx, wy, wz = p[0] - ax, p[1] - ay, p[2] - az
        vv = vx * vx + vy * vy + vz * vz
        if vv == 0.0:
            return math.dist(p, a)
        t = max(0.0, min(1.0, (wx * vx + wy * vy + wz * vz) / vv))
        return math.dist(p, (ax + t * vx, ay + t * vy, az + t * vz))

    out = [point(t0)]

    def refine(ta, pa, tb, pb, depth):
        tm = 0.5 * (ta + tb)
        pm = point(tm)
        if depth >= 24 or chord_dist(pm, pa, pb) <= distance:
            out.append(pb)
            return
        refine(ta, pa, tm, pm, depth + 1)
        refine(tm, pm, tb, pb, depth + 1)

    for i in range(segments):
        ta = t0 + (t1 - t0) * i / segments
        tb = t0 + (t1 - t0) * (i + 1) / segments
        refine(ta, point(ta), tb, point(tb), 0)
    return [list(p) for p in out]


# ---------------------------------------------------------------------------
# per-type geometry extraction rules (dxf_reader.py:148-720)
# e: plain dict snapshot of the entity's dxf attribute namespace + the
# method-derived fields the reference reads (points, vertices, paths, ...)
# ---------------------------------------------------------------------------

def _x_point(e):
    return {"location": vec3_to_list(e["location"])}


def _x_line(e):
    return {"start": vec3_to_list(e["start"]), "end": vec3_to_list(e["end"])}


def _x_polyline(e):
    return {"points": [vec3_to_list(p) for p in e["points"]],
            "is_closed": e["is_closed"]}


def _x_lwpolyline(e):
    # xyseb 5-tuples (dxf_reader.py:221-229); OCS fallback handled by the
    # adapter (vertices_in_ocs) — both arrive here as plain sequences
    return {"points": [list(p) for p in e["points"]],
            "is_closed": e["is_closed"],
            "elevation": e.get("elevation", 0.0),
            "const_width": e.get("const_width", 0.0)}


def _x_circle(e):
    return {"center": vec3_to_list(e["center"]), "radius": e["radius"]}


def _x_arc(e):
    return {"center": vec3_to_list(e["center"]), "radius": e["radius"],
            "start_angle": e["start_angle"], "end_angle": e["end_angle"]}


def _x_ellipse(e):
    return {"center": vec3_to_list(e["center"]),
            "major_axis": vec3_to_list(e["major_axis"]),
            "ratio": e["ratio"], "start_param": e["start_param"],
            "end_param": e["end_param"],
            "extrusion": vec3_to_list(e.get("extrusion", [0.0, 0.0, 1.0]))}


def _x_spline(e):
    # read-time flattening, tol 0.01 (dxf_reader.py:280)
    pts = flatten_spline(e["control_points"], degree=e.get("degree", 3),
                         knots=e.get("knots"), distance=0.01)
    return {"points": pts, "degree": e.get("degree", 3)}


def _x_text(e):
    return {"insert": vec3_to_list(e["insert"]), "text": e.get("text", ""),
            "height": e.get("height", 0.0), "rotation": e.get("rotation", 0.0),
            "oblique": e.get("oblique", 0.0), "style": e.get("style", "Standard"),
            "halign": e.get("halign", 0), "valign": e.get("valign", 0),
            "color": e.get("color"), "true_color": e.get("true_color"),
            "transparency": e.get("transparency")}


def _x_mtext(e):
    return {"insert": vec3_to_list(e["insert"]), "text": e.get("text", ""),
            "height": e.get("char_height", 0.0), "rotation": e.get("rotation", 0.0),
            "color": e.get("color"), "true_color": e.get("true_color"),
            "transparency": e.get("transparency")}


def _x_insert(e):
    attribs = [{
        "tag": a.get("tag", ""), "text": a.get("text", ""),
        "insert": vec3_to_list(a.get("insert", (0.0, 0.0, 0.0))),
        "height": a.get("height"), "rotation": a.get("rotation"),
        "style": a.get("style"), "layer": a.get("layer"),
        "color": a.get("color"), "true_color": a.get("true_color"),
        "transparency": a.get("transparency"),
    } for a in e.get("attribs", [])]
    return {"insert": vec3_to_list(e["insert"]), "name": e["name"],
            "xscale": e.get("xscale", 1.0), "yscale": e.get("yscale", 1.0),
            "zscale": e.get("zscale", 1.0), "rotation": e.get("rotation", 0.0),
            "insert_attribs": attribs}


def _x_face(e):
    return {k: vec3_to_list(e[k]) for k in ("vtx0", "vtx1", "vtx2", "vtx3")}


def _x_acis(e):
    return {"acis_data": e.get("acis_data")}


def _x_mesh(e):
    return {"vertices": [vec3_to_list(v) for v in e.get("vertices", [])],
            "faces": [list(f) for f in e.get("faces", [])]}


def _x_hatch(e):
    boundaries, hatch_paths = [], []
    for boundary in e.get("paths", []):
        if "vertices" in boundary:  # polyline path
            points = []
            for v in boundary["vertices"]:
                if isinstance(v, (list, tuple)):
                    if len(v) >= 3:
                        points.append([float(v[0]), float(v[1]), float(v[2])])
                    elif len(v) >= 2:
                        points.append([float(v[0]), float(v[1])])
                else:
                    points.append(vec3_to_list(v))
            boundaries.append(points)
            hatch_paths.append({"path_type": "polyline",
                                "is_closed": bool(boundary.get("is_closed", True)),
                                "vertices": points})
        elif "edges" in boundary:  # edge path
            edges = []
            for edge in boundary["edges"]:
                if "start" in edge and "end" in edge:
                    edges.append({"edge_type": "line",
                                  "start": vec3_to_list(edge["start"]),
                                  "end": vec3_to_list(edge["end"])})
                elif {"center", "radius", "start_angle", "end_angle"} <= set(edge):
                    edges.append({"edge_type": "arc",
                                  "center": vec3_to_list(edge["center"]),
                                  "radius": float(edge["radius"]),
                                  "start_angle": float(edge["start_angle"]),
                                  "end_angle": float(edge["end_angle"]),
                                  "ccw": bool(edge.get("ccw", True))})
            hatch_paths.append({"path_type": "edge", "edges": edges})
    return {"boundaries": boundaries, "hatch_paths": hatch_paths,
            "pattern_name": e.get("pattern_name", ""),
            "solid_fill": e.get("solid_fill", False)}


def _x_leader(e):
    return {"vertices": [vec3_to_list(v) for v in e.get("vertices", [])],
            "text": e.get("text", "")}


def _x_ray(e):
    return {"start": vec3_to_list(e["start"]),
            "unit_vector": vec3_to_list(e["unit_vector"])}


def _x_attrib(e):
    return {"insert": vec3_to_list(e["insert"]), "tag": e.get("tag", ""),
            "text": e.get("text", ""), "color": e.get("color"),
            "true_color": e.get("true_color"), "transparency": e.get("transparency")}


def _x_shape(e):
    return {"insert": vec3_to_list(e["insert"]), "name": e["name"],
            "size": e.get("size", 1.0)}


def _x_viewport(e):
    return {"center": vec3_to_list(e["center"]),
            "width": e["width"], "height": e["height"]}


def _x_image(e):
    return {"insert": vec3_to_list(e["insert"]),
            "u_pixel": vec3_to_list(e["u_pixel"]),
            "v_pixel": vec3_to_list(e["v_pixel"]),
            "image_def_handle": e.get("image_def_handle")}


def _x_imagedef(e):
    return {"filename": e.get("filename", "")}


def _x_dimension(e):
    return {}  # dxf_reader.py:703-706: stored as-is, no geometry


def _x_helix(e):
    return {"base_point": vec3_to_list(e["base_point"]),
            "axis_vector": vec3_to_list(e["axis_vector"]),
            "radius": e["radius"], "turns": e["turns"], "height": e["height"]}


def _x_multileader(e):
    """Serialized MLEADER context (dxf_reader.py's rendered-context walk,
    re-expressed over the codec's snapshot dict): parallel leader_lines /
    leader_properties lists plus the mtext anchor fields. Only reachable
    through the tag codec (dxf_parser._b_multileader) — the ezdxf
    snapshot path carries no context data, so there it contributes the
    same empty defaults as before."""
    return {"text": e.get("text", "") or "",
            "base_point": vec3_to_list(e.get("base_point") or [0.0, 0.0, 0.0]),
            "leader_lines": [[vec3_to_list(v) for v in line]
                             for line in e.get("leader_lines") or []],
            "leader_properties": list(e.get("leader_properties") or []),
            "char_height": e.get("char_height"),
            "rotation": e.get("rotation")}


EXTRACTORS = {
    "POINT": _x_point, "LINE": _x_line, "POLYLINE": _x_polyline,
    "LWPOLYLINE": _x_lwpolyline, "CIRCLE": _x_circle, "ARC": _x_arc,
    "ELLIPSE": _x_ellipse, "SPLINE": _x_spline, "TEXT": _x_text,
    "MTEXT": _x_mtext, "INSERT": _x_insert, "3DFACE": _x_face,
    "SOLID": _x_face, "TRACE": _x_face, "3DSOLID": _x_acis, "BODY": _x_acis,
    "REGION": _x_acis, "MESH": _x_mesh, "HATCH": _x_hatch,
    "LEADER": _x_leader, "RAY": _x_ray, "XLINE": _x_ray,
    "ATTRIB": _x_attrib, "SHAPE": _x_shape, "VIEWPORT": _x_viewport,
    "IMAGE": _x_image, "IMAGEDEF": _x_imagedef, "DIMENSION": _x_dimension,
    "HELIX": _x_helix, "MULTILEADER": _x_multileader,
}


def extract_geometries(dxftype: str, snapshot: dict) -> dict:
    """Dispatch like dxf_reader._extract_geometry_data; unknown types get
    no geometry (the reference skips them)."""
    fn = EXTRACTORS.get(dxftype)
    return fn(snapshot) if fn else {}
