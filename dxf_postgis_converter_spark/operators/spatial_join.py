"""Point-in-polygon spatial join (J10) — cell-cover equi-join + exact refine.

Plan shape (SURVEY §2.4 J10, §4.3/§4.4):

  zones  --covers(res)-->  zone_cells(zone_id, cell [, salt])     [JVM]
  probes --cell(res)---->  probe cell [, salt]                    [JVM]
  equi-join on cell (broadcast when the cover table is small,
  shuffled otherwise; optional salting for hot cells)             [JVM]
  exact refine: ONE Arrow-batched mapInPandas pass over all
  candidates — rect zones by a vectorized bbox compare, circle/
  poly zones by ray casting (single consumer of the join: a
  rect/other branch union would scan the probe side twice)        [Arrow]

Scale notes:
- the cover table is tiny relative to probes (zones × cells-per-zone), so
  the default is an explicit ``broadcast()`` — no shuffle of the 10^12-row
  probe side at all; set broadcast_zones=False for a truly huge polygon
  side and AQE handles the shuffled variant.
- salting (n_salt>1) splits each hot cell's probe stream across n_salt
  reducers by replicating the zone-cover rows — use with the shuffled
  path on skewed corpora (dense CAD sheets; see skew.py for detection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geometry.predicates import points_covered
from ..geometry.wkb import parse_wkb
from ..index.grid import cell_col, covers_col

DEFAULT_RES = 6  # cell = 128 world units; zone covers stay small

# non-rect zone geometries ride a broadcast {zone_id: wkb} up to this many
# zones (same memory class as the cover broadcast); beyond it the wkb
# falls back to per-row carriage through the candidate join
MAX_RING_BROADCAST = 100_000


def zone_cover_cells(zones: DataFrame, res: int = DEFAULT_RES, n_salt: int = 1,
                     with_wkb: bool = True) -> DataFrame:
    """zones(zone_id, kind, xmin..ymax, geometry_wkb) → one row per
    (zone, covering cell [, salt]); all column arithmetic. with_wkb=False
    drops the geometry column (the refine gets rings via broadcast —
    see point_in_polygon_join)."""
    cover = zones.select(
        "zone_id", "kind", *(["geometry_wkb"] if with_wkb else []),
        F.col("xmin").alias("z_xmin"), F.col("ymin").alias("z_ymin"),
        F.col("xmax").alias("z_xmax"), F.col("ymax").alias("z_ymax"),
        F.explode(covers_col(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), res)).alias("cell"),
    )
    if n_salt > 1:
        cover = cover.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return cover


def _refine_batches(batches, x_col: str, y_col: str, bc_rings=None):
    """Exact containment refine, ONE pass over all candidate kinds:
    rect zones by a vectorized bbox compare (no WKB parse), circle/poly
    zones by ray casting with the zone ring parsed once per partition.
    Handling rects here (instead of a separate JVM branch) keeps the
    candidate join single-consumer — a two-branch union would recompute
    the probe-side scan + join twice (see git history).

    bc_rings: broadcast {zone_id: wkb bytes} for non-rect zones — the
    geometry crosses the Arrow boundary ONCE PER EXECUTOR instead of once
    per candidate row. Shipping ~KB rings per row both multiplied the
    Python-boundary volume ~100x and could saturate the worker socket in
    BOTH directions at once, deadlocking Spark's single-threaded
    PythonRunner flow control (observed at sf0.4/local[2]). None → the
    wkb travels as a candidate column (huge-zone-set fallback); a zone
    missing from the broadcast also falls back to the per-row column when
    the candidates carry one (defensive: a zone inserted between the
    driver's collect and the refine)."""
    geom_cache: dict[str, object] = {}

    def geom_of(zid, grp):
        geom = geom_cache.get(zid)
        if geom is None:
            wkb = bc_rings.value.get(zid) if bc_rings is not None else None
            if wkb is None:
                if "geometry_wkb" not in grp:
                    raise KeyError(
                        f"zone {zid!r} absent from ring broadcast and no "
                        f"per-row geometry_wkb column on the candidates")
                wkb = bytes(grp["geometry_wkb"].iloc[0])
            _, geom = parse_wkb(bytes(wkb))  # all rings + MultiPolygon parts
            geom_cache[zid] = geom
        return geom

    for pdf in batches:
        if len(pdf) == 0:
            continue
        pdf = pdf.reset_index(drop=True)
        keep = np.zeros(len(pdf), dtype=bool)
        xs = pdf[x_col].to_numpy()
        ys = pdf[y_col].to_numpy()
        is_rect = (pdf["kind"] == "rect").to_numpy()
        if is_rect.any():
            keep[is_rect] = (
                (xs[is_rect] >= pdf["z_xmin"].to_numpy()[is_rect])
                & (xs[is_rect] <= pdf["z_xmax"].to_numpy()[is_rect])
                & (ys[is_rect] >= pdf["z_ymin"].to_numpy()[is_rect])
                & (ys[is_rect] <= pdf["z_ymax"].to_numpy()[is_rect])
            )
        rest = pdf[~is_rect]
        for zid, grp in rest.groupby("zone_id", sort=False):
            keep[grp.index.to_numpy()] = points_covered(
                grp[x_col].to_numpy(), grp[y_col].to_numpy(), geom_of(zid, grp))
        yield pdf[keep]


def point_in_polygon_join(
    probes: DataFrame,
    zones: DataFrame,
    res: int = DEFAULT_RES,
    x_col: str = "x",
    y_col: str = "y",
    broadcast_zones: bool = True,
    n_salt: int = 1,
    probe_id_col: str = "handle",
) -> DataFrame:
    """probes(any cols incl. x_col/y_col) ⋈ zones → probe cols + zone_id.

    Exact containment (boundary-inclusive ray casting ≙ shapely covers).

    Non-rect zone geometries reach the refine via a Spark broadcast
    variable ({zone_id: wkb}, one copy per executor) rather than as a
    join column repeated per candidate row — up to
    ``max_ring_broadcast`` zones (driver-guarded; beyond it the wkb
    falls back to per-row carriage and the cogroup-by-zone design in the
    module doc becomes the right tool)."""
    # NULL-kind zones are non-rect too (a plain != would drop them from the
    # broadcast while the refine still routes them to the polygon branch)
    nonrect_rows = (zones.filter(F.col("kind").isNull() | (F.col("kind") != "rect"))
                    .select("zone_id", "geometry_wkb")
                    .limit(MAX_RING_BROADCAST + 1).collect())
    bc_rings = None
    if len(nonrect_rows) <= MAX_RING_BROADCAST:
        bc_rings = probes.sparkSession.sparkContext.broadcast(
            {r.zone_id: bytes(r.geometry_wkb) for r in nonrect_rows})

    cover = zone_cover_cells(zones, res=res, n_salt=n_salt,
                             with_wkb=bc_rings is None)
    if broadcast_zones:
        cover = F.broadcast(cover)

    probe_cols = probes.columns
    p = probes.withColumn("cell", cell_col(F.col(x_col), F.col(y_col), res))
    join_keys = ["cell"]
    if n_salt > 1:
        p = p.withColumn("salt", F.pmod(F.xxhash64(F.col(probe_id_col)), F.lit(n_salt)).cast("int"))
        join_keys.append("salt")

    cand = p.join(cover, join_keys, "inner")

    # one Arrow-batched refine pass over ALL candidates (rect rows are a
    # vectorized bbox compare inside the same stage — no WKB parse, and no
    # second consumer of the candidate join)
    extra = ["zone_id", "kind", "z_xmin", "z_ymin", "z_xmax", "z_ymax"] \
        + ([] if bc_rings is not None else ["geometry_wkb"])
    refine_in = cand.select(*probe_cols, *extra)
    schema = T.StructType(
        [probes.schema[c] for c in probe_cols]
        + [T.StructField("zone_id", T.StringType()), T.StructField("kind", T.StringType()),
           T.StructField("z_xmin", T.DoubleType()), T.StructField("z_ymin", T.DoubleType()),
           T.StructField("z_xmax", T.DoubleType()), T.StructField("z_ymax", T.DoubleType())]
        + ([] if bc_rings is not None else [T.StructField("geometry_wkb", T.BinaryType())])
    )
    return refine_in.mapInPandas(
        lambda it: _refine_batches(it, x_col, y_col, bc_rings), schema=schema
    ).select(*probe_cols, "zone_id")


def bbox_intersects_join(
    probes: DataFrame,
    zones: DataFrame,
    res: int = DEFAULT_RES,
    broadcast_zones: bool = True,
) -> DataFrame:
    """Generic bbox⋈zone-bbox intersects join for non-point geometries:
    probe bboxes cover cells too (1 geom → K cells), dedup candidate pairs,
    then rect-rect intersect by columns. Matches the reference's
    bbox-based INTERSECT semantics (P1) zone-side."""
    cover = zone_cover_cells(zones, res=res)
    if broadcast_zones:
        cover = F.broadcast(cover)
    probe_cols = probes.columns
    p = probes.withColumn(
        "cell", F.explode(covers_col(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), res)))
    cand = p.join(cover, "cell", "inner").filter(
        (F.col("xmin") <= F.col("z_xmax")) & (F.col("xmax") >= F.col("z_xmin"))
        & (F.col("ymin") <= F.col("z_ymax")) & (F.col("ymax") >= F.col("z_ymin"))
    )
    # a probe bbox and a zone can share several cells → dedup the pair
    return cand.select(*probe_cols, "zone_id").dropDuplicates(list(probe_cols) + ["zone_id"])
