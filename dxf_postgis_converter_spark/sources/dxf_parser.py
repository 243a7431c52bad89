"""Pure-Python ASCII-DXF tag codec — the ezdxf-free ingest path for S1.

The reference opens drawings with ezdxf (dxf_reader.py:19-87); this
container has no ezdxf, so until round 5 real `.dxf` ingest was an
env-gated NotImplementedError seam. This module closes that gap with a
from-scratch reader/writer for the *public* DXF R12/R2000 ASCII tag
format (pairs of lines: integer group code, then value — the format is
fully documented in Autodesk's published DXF reference): `parse_dxf`
turns drawing text into exactly the `(layer_styles, snapshots)` shape
`sources.dxf_files.spans_from_entity_snapshots` consumes, so parsed
files flow through the golden-tested extraction rules
(sources/extractors.py) and every downstream operator unchanged.
`write_dxf` is the inverse (snapshot tuples → drawing text), used for
fixtures, round-trip tests, and FILE-mode export of selections.

When ezdxf IS installed, `dxf_files._spans_from_dxf` still prefers it
(audit/recovery, binary DXF, every quirk of real-world files); this
codec is the fallback that keeps the pipeline fully functional without
it. Scope: the 29 entity types the engine decodes (SURVEY §2.2) plus
the LAYER table; unknown entity types keep their base attributes and
contribute no geometry, mirroring the reference's skip behavior
(dxf_reader.py:148-186).
"""

from __future__ import annotations

import math

from .extractors import LAYER_STYLE_KEYS

# ---------------------------------------------------------------------------
# tag stream: (group code, typed value) pairs
# ---------------------------------------------------------------------------

# group-code → value type, per the published DXF group-code ranges
_INT_RANGES = ((60, 79), (90, 99), (160, 179), (270, 289), (290, 299),
               (370, 389), (400, 409), (420, 429), (440, 459), (1060, 1071))
_FLOAT_RANGES = ((10, 59), (110, 149), (210, 239), (460, 469), (1010, 1059))


def _coerce(code: int, raw: str):
    for lo, hi in _INT_RANGES:
        if lo <= code <= hi:
            return int(raw.strip())
    for lo, hi in _FLOAT_RANGES:
        if lo <= code <= hi:
            return float(raw.strip())
    # string values keep leading/trailing spaces (a TEXT entity whose
    # content is " " is legal); only the \r of a CRLF file is dropped
    return raw.rstrip("\r")


def iter_tags(text: str):
    """Yield (code, value) pairs; 999 comments skipped; strict pairing
    (a non-integer code line is a structural error, reported with its
    line number)."""
    lines = text.splitlines()
    n = len(lines)
    i = 0
    while i + 1 < n:
        code_line = lines[i].strip()
        if code_line == "" and i + 1 == n - 1 and not lines[i + 1].strip():
            break  # trailing blank pair
        try:
            code = int(code_line)
        except ValueError:
            raise ValueError(f"DXF tag desync at line {i + 1}: "
                             f"expected integer group code, got {code_line!r}")
        if code != 999:
            yield code, _coerce(code, lines[i + 1])
        i += 2
    if i < n and lines[i].strip():
        # dangling unpaired line (e.g. a 1-line non-DXF file): the pair
        # loop above never consumed it — that's a desync, not an empty
        # drawing
        raise ValueError(f"DXF tag desync at line {i + 1}: "
                         f"unpaired trailing line {lines[i]!r}")


# ---------------------------------------------------------------------------
# reading helpers over one entity's tag body
# ---------------------------------------------------------------------------

def _first(body, code, default=None):
    for c, v in body:
        if c == code:
            return v
    return default


def _vectors(body, xcode):
    """All [x,y,z] points anchored at x-code `xcode` (y = xcode+10,
    z = xcode+20 attach to the most recent anchor; z optional → 0.0)."""
    out, cur = [], None
    for c, v in body:
        if c == xcode:
            cur = [float(v), 0.0, 0.0]
            out.append(cur)
        elif cur is not None and c == xcode + 10:
            cur[1] = float(v)
        elif cur is not None and c == xcode + 20:
            cur[2] = float(v)
    return out


def _vector(body, xcode, default=None):
    vs = _vectors(body, xcode)
    return vs[0] if vs else default


def _scalars(body, spec):
    """{field: code} → {field: value} for the codes present."""
    out = {}
    for field, code in spec.items():
        v = _first(body, code)
        if v is not None:
            out[field] = v
    return out


# ---------------------------------------------------------------------------
# per-type geometry-snapshot builders (group codes per the public DXF spec;
# output fields exactly what extractors.EXTRACTORS read)
# ---------------------------------------------------------------------------

def _b_point(body):
    return {"location": _vector(body, 10, [0.0, 0.0, 0.0])}


def _b_line(body):
    return {"start": _vector(body, 10, [0.0, 0.0, 0.0]),
            "end": _vector(body, 11, [0.0, 0.0, 0.0])}


def _b_circle(body):
    return {"center": _vector(body, 10, [0.0, 0.0, 0.0]),
            "radius": float(_first(body, 40, 0.0))}


def _b_arc(body):
    d = _b_circle(body)
    d["start_angle"] = float(_first(body, 50, 0.0))
    d["end_angle"] = float(_first(body, 51, 0.0))
    return d


def _b_ellipse(body):
    return {"center": _vector(body, 10, [0.0, 0.0, 0.0]),
            "major_axis": _vector(body, 11, [1.0, 0.0, 0.0]),
            "extrusion": _vector(body, 210, [0.0, 0.0, 1.0]),
            "ratio": float(_first(body, 40, 1.0)),
            "start_param": float(_first(body, 41, 0.0)),
            "end_param": float(_first(body, 42, 0.0))}


def _b_lwpolyline(body):
    # per-vertex xyseb: 10 x (new vertex), 20 y, 40 start width,
    # 41 end width, 42 bulge — widths/bulge attach to the open vertex
    pts, cur = [], None
    for c, v in body:
        if c == 10:
            cur = [float(v), 0.0, 0.0, 0.0, 0.0]
            pts.append(cur)
        elif cur is not None and c == 20:
            cur[1] = float(v)
        elif cur is not None and c == 40:
            cur[2] = float(v)
        elif cur is not None and c == 41:
            cur[3] = float(v)
        elif cur is not None and c == 42:
            cur[4] = float(v)
    d = {"points": pts, "is_closed": bool(int(_first(body, 70, 0)) & 1)}
    elev = _first(body, 38)
    if elev is not None:
        d["elevation"] = float(elev)
    cw = _first(body, 43)
    if cw is not None:
        d["const_width"] = float(cw)
    return d


def _b_spline(body):
    d = {"degree": int(_first(body, 71, 3)),
         "control_points": _vectors(body, 10)}
    knots = [float(v) for c, v in body if c == 40]
    if knots:
        d["knots"] = knots
    return d


def _b_text(body):
    d = {"insert": _vector(body, 10, [0.0, 0.0, 0.0]),
         "text": str(_first(body, 1, ""))}
    d.update(_scalars(body, {"height": 40, "rotation": 50, "oblique": 51,
                             "style": 7, "halign": 72, "valign": 73}))
    return d


def _b_mtext(body):
    # long text arrives as 3-code chunks followed by a final 1-code chunk
    chunks = [str(v) for c, v in body if c == 3]
    d = {"insert": _vector(body, 10, [0.0, 0.0, 0.0]),
         "text": "".join(chunks) + str(_first(body, 1, ""))}
    d.update(_scalars(body, {"char_height": 40, "rotation": 50}))
    return d


def _b_insert(body):
    d = {"insert": _vector(body, 10, [0.0, 0.0, 0.0]),
         "name": str(_first(body, 2, ""))}
    d.update(_scalars(body, {"xscale": 41, "yscale": 42, "zscale": 43,
                             "rotation": 50}))
    return d


def _b_attrib(body):
    d = {"insert": _vector(body, 10, [0.0, 0.0, 0.0]),
         "tag": str(_first(body, 2, "")), "text": str(_first(body, 1, ""))}
    d.update(_scalars(body, {"height": 40, "rotation": 50, "style": 7}))
    return d


def _b_face(body):
    # 3-vertex faces repeat the 3rd corner as the 4th per the spec
    v = [_vector(body, 10 + k) for k in range(4)]
    for k in range(4):
        if v[k] is None:
            v[k] = v[k - 1] if k else [0.0, 0.0, 0.0]
    return {"vtx0": v[0], "vtx1": v[1], "vtx2": v[2], "vtx3": v[3]}


def _b_acis(body):
    data = [str(v) for c, v in body if c in (1, 3)]
    return {"acis_data": "\n".join(data)} if data else {}


def _b_mesh(body):
    verts = _vectors(body, 10)
    nums = [int(v) for c, v in body if c == 90]
    faces, i = [], 0
    while i < len(nums):
        cnt = nums[i]
        faces.append(nums[i + 1:i + 1 + cnt])
        i += 1 + cnt
    return {"vertices": verts, "faces": faces}


def _b_hatch(body):
    paths = []
    pattern, solid = "", False
    i, n = 0, len(body)
    while i < n:
        c, v = body[i]
        if c == 2:
            pattern = str(v)
        elif c == 70:
            solid = bool(int(v))
        elif c == 98:
            break  # seed points follow — their 10/20 are not boundary data
        elif c == 92:
            flag = int(v)
            i += 1
            if flag & 2:  # polyline boundary
                verts, cur, closed = [], None, True
                while i < n and body[i][0] not in (92, 97, 98):
                    cc, vv = body[i]
                    if cc == 73:
                        closed = bool(int(vv))
                    elif cc == 10:
                        cur = [float(vv), 0.0]
                        verts.append(cur)
                    elif cc == 20 and cur is not None:
                        cur[1] = float(vv)
                    i += 1
                paths.append({"vertices": verts, "is_closed": closed})
            else:  # edge boundary: 72 starts each edge (1=line, 2=arc)
                edges, cur = [], None
                while i < n and body[i][0] not in (92, 97, 98):
                    cc, vv = body[i]
                    if cc == 72:
                        cur = {"etype": int(vv)}
                        edges.append(cur)
                    elif cur is not None:
                        if cc == 10:
                            cur["x1"] = float(vv)
                        elif cc == 20:
                            cur["y1"] = float(vv)
                        elif cc == 11:
                            cur["x2"] = float(vv)
                        elif cc == 21:
                            cur["y2"] = float(vv)
                        elif cc == 40:
                            cur["radius"] = float(vv)
                        elif cc == 50:
                            cur["start_angle"] = float(vv)
                        elif cc == 51:
                            cur["end_angle"] = float(vv)
                        elif cc == 73:
                            cur["ccw"] = bool(int(vv))
                    i += 1
                out_edges = []
                for e in edges:
                    if e["etype"] == 1:
                        out_edges.append(
                            {"start": [e.get("x1", 0.0), e.get("y1", 0.0)],
                             "end": [e.get("x2", 0.0), e.get("y2", 0.0)]})
                    elif e["etype"] == 2:
                        out_edges.append(
                            {"center": [e.get("x1", 0.0), e.get("y1", 0.0)],
                             "radius": e.get("radius", 0.0),
                             "start_angle": e.get("start_angle", 0.0),
                             "end_angle": e.get("end_angle", 360.0),
                             "ccw": e.get("ccw", True)})
                paths.append({"edges": out_edges})
            continue
        i += 1
    return {"paths": paths, "pattern_name": pattern, "solid_fill": solid}


def _b_leader(body):
    return {"vertices": _vectors(body, 10), "text": str(_first(body, 1, ""))}


def _b_ray(body):
    return {"start": _vector(body, 10, [0.0, 0.0, 0.0]),
            "unit_vector": _vector(body, 11, [1.0, 0.0, 0.0])}


def _b_shape(body):
    return {"insert": _vector(body, 10, [0.0, 0.0, 0.0]),
            "name": str(_first(body, 2, "")),
            "size": float(_first(body, 40, 1.0))}


def _b_viewport(body):
    return {"center": _vector(body, 10, [0.0, 0.0, 0.0]),
            "width": float(_first(body, 40, 0.0)),
            "height": float(_first(body, 41, 0.0))}


def _b_image(body):
    return {"insert": _vector(body, 10, [0.0, 0.0, 0.0]),
            "u_pixel": _vector(body, 11, [1.0, 0.0, 0.0]),
            "v_pixel": _vector(body, 12, [0.0, 1.0, 0.0]),
            "image_def_handle": _first(body, 340)}


def _b_imagedef(body):
    return {"filename": str(_first(body, 1, ""))}


def _b_dimension(body):
    return {}  # stored as-is, no geometry (dxf_reader.py:703-706)


def _b_helix(body):
    # AcDbHelix: 10 axis base point, 12 axis vector, 40 radius,
    # 41 number of turns, 42 turn height
    return {"base_point": _vector(body, 10, [0.0, 0.0, 0.0]),
            "axis_vector": _vector(body, 12, [0.0, 0.0, 1.0]),
            "radius": float(_first(body, 40, 1.0)),
            "turns": float(_first(body, 41, 1.0)),
            "height": float(_first(body, 42, 1.0))}


def _b_polyline(body):
    # vertices are consumed from the VERTEX siblings by the entity walker
    return {"points": [], "is_closed": bool(int(_first(body, 70, 0)) & 1)}


def _b_multileader(body):
    # MLEADER context data, modeled on the published ACAD structure
    # (300 CONTEXT_DATA{ … 301 }, 302 LEADER{ … 303 },
    # 304 LEADER_LINE{ … 305 }): text code 1, base point 10/20/30 at
    # context level, char height 41, rotation 50. One codec deviation,
    # documented: leader property groups (302/303) and leader line
    # groups (304/305) are written as SIBLING sequences inside the
    # context rather than nesting lines under leaders — the stored
    # payload keeps leader_lines and leader_properties as parallel
    # top-level lists (dxf_writer.py:508-664 reads them the same way),
    # and flat groups round-trip exactly even when the lists' lengths
    # differ.
    d = {"text": str(_first(body, 1, "")),
         "base_point": [0.0, 0.0, 0.0],
         "leader_lines": [], "leader_properties": []}
    in_ctx = False
    base_seen = False
    cur_prop: dict | None = None
    cur_line: list | None = None
    for c, v in body:
        if c == 300 and v == "CONTEXT_DATA{":
            in_ctx = True
            continue
        if c == 301:
            in_ctx = False
            cur_prop = cur_line = None
            continue
        if not in_ctx:
            continue
        if c == 302:
            cur_prop, cur_line = {}, None
            d["leader_properties"].append(cur_prop)
            continue
        if c == 303:
            cur_prop = None
            continue
        if c == 304:
            if v == "LEADER_LINE{":
                cur_line, cur_prop = [], None
                d["leader_lines"].append(cur_line)
            elif cur_line is None and cur_prop is None and not d["text"]:
                # real AutoCAD files carry the mtext content as context
                # code 304 ("Default text content"); our writer uses the
                # unambiguous code 1, but ingest accepts both
                d["text"] = str(v)
            continue
        if c == 305:
            cur_line = None
            continue
        if cur_line is not None:
            if c == 10:
                cur_line.append([float(v), 0.0, 0.0])
            elif c == 20 and cur_line:
                cur_line[-1][1] = float(v)
            elif c == 30 and cur_line:
                cur_line[-1][2] = float(v)
            continue
        if cur_prop is not None:
            if c == 40:
                cur_prop["dogleg_length"] = float(v)
            elif c == 271:
                cur_prop["attachment_direction"] = int(v)
            elif c == 290:
                cur_prop["has_horizontal_attachment"] = bool(int(v))
            elif c == 291:
                cur_prop["has_dogleg_vector"] = bool(int(v))
            elif c == 11:
                cur_prop["dogleg_vector"] = [float(v), 0.0, 0.0]
            elif c == 21 and "dogleg_vector" in cur_prop:
                cur_prop["dogleg_vector"][1] = float(v)
            elif c == 31 and "dogleg_vector" in cur_prop:
                cur_prop["dogleg_vector"][2] = float(v)
            elif c == 12:
                cur_prop["last_leader_point"] = [float(v), 0.0, 0.0]
            elif c == 22 and "last_leader_point" in cur_prop:
                cur_prop["last_leader_point"][1] = float(v)
            elif c == 32 and "last_leader_point" in cur_prop:
                cur_prop["last_leader_point"][2] = float(v)
            continue
        if c == 10:
            d["base_point"] = [float(v), 0.0, 0.0]
            base_seen = True
        elif c == 20 and base_seen:
            d["base_point"][1] = float(v)
        elif c == 30 and base_seen:
            d["base_point"][2] = float(v)
        elif c == 41:
            d["char_height"] = float(v)
        elif c == 50:
            d["rotation"] = float(v)
    return d


_BUILDERS = {
    "POINT": _b_point, "LINE": _b_line, "POLYLINE": _b_polyline,
    "LWPOLYLINE": _b_lwpolyline, "CIRCLE": _b_circle, "ARC": _b_arc,
    "ELLIPSE": _b_ellipse, "SPLINE": _b_spline, "TEXT": _b_text,
    "MTEXT": _b_mtext, "INSERT": _b_insert, "3DFACE": _b_face,
    "SOLID": _b_face, "TRACE": _b_face, "3DSOLID": _b_acis,
    "BODY": _b_acis, "REGION": _b_acis, "MESH": _b_mesh,
    "HATCH": _b_hatch, "LEADER": _b_leader, "RAY": _b_ray,
    "XLINE": _b_ray, "ATTRIB": _b_attrib, "SHAPE": _b_shape,
    "VIEWPORT": _b_viewport, "IMAGE": _b_image, "IMAGEDEF": _b_imagedef,
    "DIMENSION": _b_dimension, "HELIX": _b_helix,
    "MULTILEADER": _b_multileader, "MLEADER": _b_multileader,
}

# entity-common attribute codes → the base-attribute names
# extractors.base_attributes reads (BASE_ATTRIBUTE_DEFAULTS fill absences)
_BASE_CODES = {8: "layer", 62: "color", 6: "linetype", 370: "lineweight",
               48: "ltscale", 60: "invisible", 420: "true_color",
               440: "transparency"}

# snapshot fields that are collections / derived — everything else also
# lands in dxfattribs, mirroring ezdxf's .dxfattribs() which exposes
# scalar geometry attribs (start, center, radius, …) alongside style
_COLLECTION_KEYS = frozenset(
    {"points", "vertices", "control_points", "knots", "paths", "attribs",
     "faces", "is_closed", "leader_lines", "leader_properties"})

# LAYER table record codes → the style keys dxf_files builds for ezdxf
_LAYER_CODES = {62: "color", 6: "linetype", 370: "lineweight", 290: "plot",
                420: "true_color", 440: "transparency", 48: "ltscale"}


def _collect_body(tags, i):
    """tags[i] is (0, TYPE); return (next_index, body tags up to next 0)."""
    j = i + 1
    n = len(tags)
    while j < n and tags[j][0] != 0:
        j += 1
    return j, tags[i + 1:j]


def _snapshot_tuple(etype, body):
    base = {name: body_v for code, name in _BASE_CODES.items()
            if (body_v := _first(body, code)) is not None}
    builder = _BUILDERS.get(etype)
    geom = builder(body) if builder else {}
    snapshot = dict(base)
    snapshot.update(geom)
    dxfattribs = {k: v for k, v in snapshot.items()
                  if k not in _COLLECTION_KEYS}
    handle = _first(body, 5)
    return [etype, dxfattribs, snapshot,
            str(handle) if handle is not None else None,
            str(base.get("layer", "0"))]


def _parse_one_entity(tags, i):
    """tags[i] is (0, TYPE); parse one entity, absorbing POLYLINE's
    VERTEX…SEQEND and INSERT's ATTRIB…SEQEND siblings. Returns
    (next_index, snapshot tuple or None for structural markers)."""
    n = len(tags)
    etype = str(tags[i][1])
    i, body = _collect_body(tags, i)
    if etype == "SEQEND":
        return i, None
    snap = _snapshot_tuple(etype, body)
    if etype == "POLYLINE":
        pts = []
        while i < n and tags[i][0] == 0 and tags[i][1] == "VERTEX":
            i, vbody = _collect_body(tags, i)
            pts.append(_vector(vbody, 10, [0.0, 0.0, 0.0]))
        if i < n and tags[i][0] == 0 and tags[i][1] == "SEQEND":
            i, _ = _collect_body(tags, i)
        snap[2]["points"] = pts
    elif etype == "INSERT" and int(_first(body, 66, 0)) == 1:
        attribs = []
        while i < n and tags[i][0] == 0 and tags[i][1] == "ATTRIB":
            i, abody = _collect_body(tags, i)
            a = _b_attrib(abody)
            a.update({name: v for code_, name in _BASE_CODES.items()
                      if name in ("layer", "color", "true_color",
                                  "transparency")
                      and (v := _first(abody, code_)) is not None})
            attribs.append(a)
        if i < n and tags[i][0] == 0 and tags[i][1] == "SEQEND":
            i, _ = _collect_body(tags, i)
        snap[2]["attribs"] = attribs
    return i, tuple(snap)


def parse_dxf(text: str):
    """Drawing text → (layer_styles, snapshots, block_defs):
    layer_styles is {name: {style key: value}} over LAYER_STYLE_KEYS
    (absent codes → key omitted, like the ezdxf adapter's getattr(None)
    skip); snapshots are (etype, dxfattribs, snapshot, handle, layer)
    tuples in modelspace iteration order — the exact input of
    dxf_files.spans_from_entity_snapshots; block_defs is
    {block name: [snapshot tuples]} from the BLOCKS section (layout
    blocks '*Model_Space' etc. skipped), feeding the INSERT
    block_entities closure (dxf_reader.py:369-424 parity)."""
    tags = list(iter_tags(text))
    layer_styles: dict[str, dict] = {}
    snapshots: list = []
    block_defs: dict[str, list] = {}
    section = None
    i, n = 0, len(tags)
    while i < n:
        code, val = tags[i]
        if code == 0 and val == "SECTION":
            section = tags[i + 1][1] if i + 1 < n and tags[i + 1][0] == 2 else None
            i += 2
            continue
        if code == 0 and val == "ENDSEC":
            section = None
            i += 1
            continue
        if section == "TABLES" and code == 0 and val == "LAYER":
            i, body = _collect_body(tags, i)
            name = _first(body, 2)
            if name:
                style = {k: _first(body, c)
                         for c, k in _LAYER_CODES.items()
                         if _first(body, c) is not None}
                layer_styles[str(name)] = {k: style.get(k)
                                           for k in LAYER_STYLE_KEYS
                                           if k in style}
            continue
        if section == "BLOCKS" and code == 0 and val == "BLOCK":
            i, bbody = _collect_body(tags, i)
            bname = _first(bbody, 2)
            ents = []
            while i < n and not (tags[i][0] == 0
                                 and tags[i][1] in ("ENDBLK", "ENDSEC")):
                if tags[i][0] == 0:
                    i, snap = _parse_one_entity(tags, i)
                    if snap is not None:
                        ents.append(snap)
                else:
                    i += 1
            if i < n and tags[i][1] == "ENDBLK":
                i, _ = _collect_body(tags, i)
            if bname and not str(bname).startswith("*"):
                block_defs[str(bname)] = ents
            continue
        if section == "ENTITIES" and code == 0:
            i, snap = _parse_one_entity(tags, i)
            if snap is not None:
                snapshots.append(snap)
            continue
        i += 1
    return layer_styles, snapshots, block_defs


# ---------------------------------------------------------------------------
# writer: snapshot tuples → drawing text (fixtures, round-trip tests,
# FILE-mode export of filtered selections)
# ---------------------------------------------------------------------------

def _fmt(v) -> str:
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _tag(out, code, value):
    out.append(str(code))
    out.append(_fmt(value))


def _tag_vec(out, xcode, v, dims=3):
    v = list(v) + [0.0] * 3
    _tag(out, xcode, float(v[0]))
    _tag(out, xcode + 10, float(v[1]))
    if dims >= 3:
        _tag(out, xcode + 20, float(v[2]))


def _write_entity(out, etype, snapshot, handle, layer):
    _tag(out, 0, etype)
    if handle is not None:
        _tag(out, 5, handle)
    _tag(out, 8, layer if layer is not None else snapshot.get("layer", "0"))
    for code, name in _BASE_CODES.items():
        if name == "layer":
            continue
        if snapshot.get(name) is not None:
            _tag(out, code, snapshot[name])
    s = snapshot
    if etype == "POINT":
        _tag_vec(out, 10, s["location"])
    elif etype in ("LINE",):
        _tag_vec(out, 10, s["start"])
        _tag_vec(out, 11, s["end"])
    elif etype in ("RAY", "XLINE"):
        _tag_vec(out, 10, s["start"])
        _tag_vec(out, 11, s["unit_vector"])
    elif etype in ("CIRCLE", "ARC"):
        _tag_vec(out, 10, s["center"])
        _tag(out, 40, float(s["radius"]))
        if etype == "ARC":
            _tag(out, 50, float(s.get("start_angle", 0.0)))
            _tag(out, 51, float(s.get("end_angle", 360.0)))
    elif etype == "ELLIPSE":
        _tag_vec(out, 10, s["center"])
        _tag_vec(out, 11, s["major_axis"])
        _tag_vec(out, 210, s.get("extrusion", [0.0, 0.0, 1.0]))
        _tag(out, 40, float(s.get("ratio", 1.0)))
        _tag(out, 41, float(s.get("start_param", 0.0)))
        _tag(out, 42, float(s.get("end_param", 0.0)))
    elif etype == "LWPOLYLINE":
        pts = s.get("points", [])
        _tag(out, 90, len(pts))
        _tag(out, 70, 1 if s.get("is_closed") else 0)
        if "elevation" in s:
            _tag(out, 38, float(s["elevation"]))
        if "const_width" in s:
            _tag(out, 43, float(s["const_width"]))
        for p in pts:
            p = list(p) + [0.0] * 5
            _tag(out, 10, float(p[0]))
            _tag(out, 20, float(p[1]))
            # write when the bit pattern isn't +0.0 (`if p[2]:` would
            # drop -0.0, which then re-parses as +0.0 — sign lost)
            if p[2] != 0.0 or math.copysign(1.0, p[2]) < 0.0:
                _tag(out, 40, float(p[2]))
            if p[3] != 0.0 or math.copysign(1.0, p[3]) < 0.0:
                _tag(out, 41, float(p[3]))
            if p[4] != 0.0 or math.copysign(1.0, p[4]) < 0.0:
                _tag(out, 42, float(p[4]))
    elif etype == "POLYLINE":
        _tag(out, 70, 1 if s.get("is_closed") else 0)
        for p in s.get("points", []):
            _tag(out, 0, "VERTEX")
            _tag(out, 8, layer if layer is not None else "0")
            _tag_vec(out, 10, p)
        _tag(out, 0, "SEQEND")
    elif etype == "SPLINE":
        _tag(out, 71, int(s.get("degree", 3)))
        knots = s.get("knots") or []
        ctrl = s.get("control_points", [])
        _tag(out, 72, len(knots))
        _tag(out, 73, len(ctrl))
        for k in knots:
            _tag(out, 40, float(k))
        for p in ctrl:
            _tag_vec(out, 10, p)
    elif etype == "TEXT":
        _tag_vec(out, 10, s["insert"])
        _tag(out, 1, s.get("text", ""))
        for name, code in (("height", 40), ("rotation", 50), ("oblique", 51),
                           ("style", 7), ("halign", 72), ("valign", 73)):
            if s.get(name) is not None:
                _tag(out, code, s[name])
    elif etype == "MTEXT":
        _tag_vec(out, 10, s["insert"])
        text = s.get("text", "")
        while len(text) > 250:  # spec: 3-code chunks, final chunk code 1
            _tag(out, 3, text[:250])
            text = text[250:]
        _tag(out, 1, text)
        for name, code in (("char_height", 40), ("rotation", 50)):
            if s.get(name) is not None:
                _tag(out, code, s[name])
    elif etype == "INSERT":
        attribs = s.get("attribs", [])
        if attribs:
            _tag(out, 66, 1)
        _tag(out, 2, s.get("name", ""))
        _tag_vec(out, 10, s["insert"])
        for name, code in (("xscale", 41), ("yscale", 42), ("zscale", 43),
                           ("rotation", 50)):
            if s.get(name) is not None:
                _tag(out, code, s[name])
        for a in attribs:
            _tag(out, 0, "ATTRIB")
            _tag(out, 8, a.get("layer", layer if layer is not None else "0"))
            for name, code in (("color", 62), ("true_color", 420),
                               ("transparency", 440)):
                if a.get(name) is not None:
                    _tag(out, code, a[name])
            _tag_vec(out, 10, a.get("insert", [0.0, 0.0, 0.0]))
            _tag(out, 1, a.get("text", ""))
            _tag(out, 2, a.get("tag", ""))
            for name, code in (("height", 40), ("rotation", 50), ("style", 7)):
                if a.get(name) is not None:
                    _tag(out, code, a[name])
        if attribs:
            _tag(out, 0, "SEQEND")
    elif etype == "ATTRIB":
        _tag_vec(out, 10, s["insert"])
        _tag(out, 1, s.get("text", ""))
        _tag(out, 2, s.get("tag", ""))
        for name, code in (("height", 40), ("rotation", 50), ("style", 7)):
            if s.get(name) is not None:
                _tag(out, code, s[name])
    elif etype in ("3DFACE", "SOLID", "TRACE"):
        for k in range(4):
            _tag_vec(out, 10 + k, s[f"vtx{k}"])
    elif etype in ("3DSOLID", "BODY", "REGION"):
        for line in str(s.get("acis_data", "")).split("\n"):
            _tag(out, 1, line)
    elif etype == "MESH":
        verts = s.get("vertices", [])
        _tag(out, 92, len(verts))
        for p in verts:
            _tag_vec(out, 10, p)
        faces = s.get("faces", [])
        _tag(out, 93, sum(1 + len(f) for f in faces))
        for f in faces:
            _tag(out, 90, len(f))
            for idx in f:
                _tag(out, 90, int(idx))
    elif etype == "HATCH":
        _tag(out, 2, s.get("pattern_name", ""))
        _tag(out, 70, 1 if s.get("solid_fill") else 0)
        paths = s.get("paths", [])
        _tag(out, 91, len(paths))
        for path in paths:
            if "vertices" in path:
                _tag(out, 92, 2)  # polyline boundary
                _tag(out, 73, 1 if path.get("is_closed", True) else 0)
                _tag(out, 93, len(path["vertices"]))
                for p in path["vertices"]:
                    _tag(out, 10, float(p[0]))
                    _tag(out, 20, float(p[1]) if len(p) > 1 else 0.0)
            else:
                edges = path.get("edges", [])
                _tag(out, 92, 1)  # edge boundary
                _tag(out, 93, len(edges))
                for e in edges:
                    if "start" in e:
                        _tag(out, 72, 1)
                        _tag(out, 10, float(e["start"][0]))
                        _tag(out, 20, float(e["start"][1]))
                        _tag(out, 11, float(e["end"][0]))
                        _tag(out, 21, float(e["end"][1]))
                    else:
                        _tag(out, 72, 2)
                        _tag(out, 10, float(e["center"][0]))
                        _tag(out, 20, float(e["center"][1]))
                        _tag(out, 40, float(e["radius"]))
                        _tag(out, 50, float(e["start_angle"]))
                        _tag(out, 51, float(e["end_angle"]))
                        _tag(out, 73, 1 if e.get("ccw", True) else 0)
    elif etype == "LEADER":
        if s.get("text"):
            _tag(out, 1, s["text"])
        _tag(out, 76, len(s.get("vertices", [])))
        for p in s.get("vertices", []):
            _tag_vec(out, 10, p)
    elif etype == "SHAPE":
        _tag_vec(out, 10, s["insert"])
        _tag(out, 2, s.get("name", ""))
        _tag(out, 40, float(s.get("size", 1.0)))
    elif etype == "VIEWPORT":
        _tag_vec(out, 10, s["center"])
        _tag(out, 40, float(s["width"]))
        _tag(out, 41, float(s["height"]))
    elif etype == "IMAGE":
        _tag_vec(out, 10, s["insert"])
        _tag_vec(out, 11, s["u_pixel"])
        _tag_vec(out, 12, s["v_pixel"])
        if s.get("image_def_handle") is not None:
            _tag(out, 340, s["image_def_handle"])
    elif etype == "IMAGEDEF":
        _tag(out, 1, s.get("filename", ""))
    elif etype == "HELIX":
        _tag_vec(out, 10, s["base_point"])
        _tag_vec(out, 12, s["axis_vector"])
        _tag(out, 40, float(s["radius"]))
        _tag(out, 41, float(s["turns"]))
        _tag(out, 42, float(s["height"]))
    elif etype in ("MULTILEADER", "MLEADER"):
        # inverse of _b_multileader (see its structure note): text,
        # CONTEXT_DATA{ base point / char height / rotation, then the
        # leader property groups and leader line groups as siblings }
        _tag(out, 1, s.get("text", "") or "")
        _tag(out, 300, "CONTEXT_DATA{")
        _tag_vec(out, 10, s.get("base_point") or [0.0, 0.0, 0.0])
        if s.get("char_height") is not None:
            _tag(out, 41, float(s["char_height"]))
        if s.get("rotation") is not None:
            _tag(out, 50, float(s["rotation"]))
        for p in s.get("leader_properties") or []:
            _tag(out, 302, "LEADER{")
            if p.get("dogleg_length") is not None:
                _tag(out, 40, float(p["dogleg_length"]))
            if p.get("attachment_direction") is not None:
                _tag(out, 271, int(p["attachment_direction"]))
            if p.get("has_horizontal_attachment") is not None:
                _tag(out, 290, int(bool(p["has_horizontal_attachment"])))
            if p.get("has_dogleg_vector") is not None:
                _tag(out, 291, int(bool(p["has_dogleg_vector"])))
            if p.get("dogleg_vector") is not None:
                _tag_vec(out, 11, p["dogleg_vector"])
            if p.get("last_leader_point") is not None:
                _tag_vec(out, 12, p["last_leader_point"])
            _tag(out, 303, "}")
        for line in s.get("leader_lines") or []:
            _tag(out, 304, "LEADER_LINE{")
            for v in line:
                _tag_vec(out, 10, v)
            _tag(out, 305, "}")
        _tag(out, 301, "}")
    # DIMENSION and unknown types: base attributes only


def write_dxf(snapshots, layer_styles=None, block_defs=None) -> str:
    """(etype, dxfattribs, snapshot, handle, layer) tuples (+ optional
    {layer: style} table and {block name: [snapshot tuples]} block
    definitions) → ASCII DXF drawing text such that
    parse_dxf(write_dxf(x)) reproduces x's geometry snapshots,
    base attributes, handles, layer styles, and block definitions."""
    out: list[str] = []
    if layer_styles:
        _tag(out, 0, "SECTION")
        _tag(out, 2, "TABLES")
        _tag(out, 0, "TABLE")
        _tag(out, 2, "LAYER")
        for name, style in layer_styles.items():
            _tag(out, 0, "LAYER")
            _tag(out, 2, name)
            for code, key in _LAYER_CODES.items():
                if style.get(key) is not None:
                    _tag(out, code, style[key])
        _tag(out, 0, "ENDTAB")
        _tag(out, 0, "ENDSEC")
    if block_defs:
        _tag(out, 0, "SECTION")
        _tag(out, 2, "BLOCKS")
        for name, ents in block_defs.items():
            _tag(out, 0, "BLOCK")
            _tag(out, 8, "0")
            _tag(out, 2, name)
            _tag(out, 70, 0)
            _tag_vec(out, 10, [0.0, 0.0, 0.0])
            for etype, _dxfattribs, snapshot, handle, layer in ents:
                _write_entity(out, etype, snapshot, handle, layer)
            _tag(out, 0, "ENDBLK")
        _tag(out, 0, "ENDSEC")
    _tag(out, 0, "SECTION")
    _tag(out, 2, "ENTITIES")
    for etype, _dxfattribs, snapshot, handle, layer in snapshots:
        _write_entity(out, etype, snapshot, handle, layer)
    _tag(out, 0, "ENDSEC")
    _tag(out, 0, "EOF")
    return "\n".join(out) + "\n"
