"""Planar quadtree cell grid — the engine's H3/S2 analogue.

The north_star calls for H3 (res 7-12) / S2 cell covers; neither library
exists in this environment and CAD sheets live in a planar coordinate
system anyway (the reference never sets an SRID — SURVEY.md §1.2), so the
engine uses a from-scratch hierarchical square grid with the same algebra
(cell assignment, multi-cell covers, k-ring neighborhoods, parent/child
refinement, z/x/y raster tiles == cells).

Everything here is **pure Spark column arithmetic** — cell assignment,
covers, k-ring and tile math compile into whole-stage-codegen JVM
expressions; no Python crossing, no UDF. That is the key scale decision:
at 10^12 documents the indexing stage is a narrow map over the entities
table with zero serialization overhead.

Encoding (64-bit long):
  cell_id = (res << 58) | (ix << 29) | iy
with world = [0, EXTENT)^2, cell size = EXTENT / 2^res, res in [0, 16].
Out-of-extent coordinates clamp to the border cells (documents are
generated inside the extent; clamping keeps the algebra total).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EXTENT = 8192.0
MAX_RES = 16

_RES_SHIFT = 58
_IX_SHIFT = 29


def cell_size(res: int) -> float:
    return EXTENT / (1 << res)


def _clamp_idx(idx: Column, res: int) -> Column:
    hi = (1 << res) - 1
    return F.greatest(F.lit(0).cast("long"), F.least(idx.cast("long"), F.lit(hi).cast("long")))


def cell_encode(ix: Column, iy: Column, res: int) -> Column:
    return (
        F.lit(res).cast("long") * F.lit(1 << _RES_SHIFT).cast("long")
        + ix.cast("long") * F.lit(1 << _IX_SHIFT).cast("long")
        + iy.cast("long")
    )


def cell_col(x: Column, y: Column, res: int) -> Column:
    """Cell id of a point — two divisions, two floors, pure codegen."""
    s = cell_size(res)
    ix = _clamp_idx(F.floor(x / F.lit(s)), res)
    iy = _clamp_idx(F.floor(y / F.lit(s)), res)
    return cell_encode(ix, iy, res)


def cell_res(cell: Column) -> Column:
    return (cell / F.lit(1 << _RES_SHIFT)).cast("long")


def cell_ix(cell: Column) -> Column:
    return ((cell % F.lit(1 << _RES_SHIFT)) / F.lit(1 << _IX_SHIFT)).cast("long")


def cell_iy(cell: Column) -> Column:
    return (cell % F.lit(1 << _IX_SHIFT)).cast("long")


def covers_col(xmin: Column, ymin: Column, xmax: Column, ymax: Column, res: int) -> Column:
    """array<long> of all res-cells intersecting a bbox.

    sequence + nested transform + flatten — stays in the JVM; callers
    explode() the result (the 1 geom → K cells fan-out of SURVEY §4.3).
    """
    s = cell_size(res)
    ix0 = _clamp_idx(F.floor(xmin / F.lit(s)), res)
    ix1 = _clamp_idx(F.floor(xmax / F.lit(s)), res)
    iy0 = _clamp_idx(F.floor(ymin / F.lit(s)), res)
    iy1 = _clamp_idx(F.floor(ymax / F.lit(s)), res)
    return F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda i: F.transform(F.sequence(iy0, iy1), lambda j: cell_encode(i, j, res)),
        )
    )


def k_ring_col(cell: Column, k: int) -> Column:
    """array<long> of the (2k+1)^2 neighborhood of a cell (clipped to the
    extent, deduplicated at the border)."""
    res_c = cell_res(cell)
    ix, iy = cell_ix(cell), cell_iy(cell)
    # 2^res - 1 without a dynamic shift (shiftleft wants a literal count)
    hi = F.pow(F.lit(2.0), res_c.cast("double")).cast("long") - 1
    lo = F.lit(0).cast("long")

    def clamp(v):
        return F.greatest(lo, F.least(v, hi))

    neigh = F.flatten(
        F.transform(
            F.sequence(F.lit(-k), F.lit(k)),
            lambda dx: F.transform(
                F.sequence(F.lit(-k), F.lit(k)),
                lambda dy: res_c * F.lit(1 << _RES_SHIFT)
                + clamp(ix + dx) * F.lit(1 << _IX_SHIFT)
                + clamp(iy + dy),
            ),
        )
    )
    return F.array_distinct(neigh)


def parent_col(cell: Column) -> Column:
    """Cell at res-1 containing this cell (adaptive-split bookkeeping)."""
    res_c = cell_res(cell)
    return (res_c - 1) * F.lit(1 << _RES_SHIFT) \
        + F.shiftright(cell_ix(cell).cast("long"), 1) * F.lit(1 << _IX_SHIFT) \
        + F.shiftright(cell_iy(cell).cast("long"), 1)


def children_col(cell: Column) -> Column:
    """array<long> of the 4 res+1 children (hot-cell re-index)."""
    res_c = cell_res(cell)
    ix2 = F.shiftleft(cell_ix(cell).cast("long"), 1)
    iy2 = F.shiftleft(cell_iy(cell).cast("long"), 1)
    return F.flatten(F.transform(
        F.sequence(F.lit(0), F.lit(1)),
        lambda dx: F.transform(
            F.sequence(F.lit(0), F.lit(1)),
            lambda dy: (res_c + 1) * F.lit(1 << _RES_SHIFT)
            + (ix2 + dx) * F.lit(1 << _IX_SHIFT) + (iy2 + dy),
        ),
    ))


def tile_col(x: Column, y: Column, z: int) -> Column:
    """Raster tile (z, tx, ty) id — by construction identical to the cell
    id at res z, which is what makes raster↔vector alignment (J12) an
    equi-join with no recomputation."""
    return cell_col(x, y, z)


# ---------------------------------------------------------------------------
# pure-Python mirrors (tests / driver-side zone prep)
# ---------------------------------------------------------------------------

def _clamp_py(i: int, res: int) -> int:
    return max(0, min(i, (1 << res) - 1))


def cell_id_py(x: float, y: float, res: int) -> int:
    s = cell_size(res)
    return (res << _RES_SHIFT) | (_clamp_py(int(x // s), res) << _IX_SHIFT) | _clamp_py(int(y // s), res)


def covers_py(xmin: float, ymin: float, xmax: float, ymax: float, res: int) -> list[int]:
    s = cell_size(res)
    ix0, ix1 = _clamp_py(int(xmin // s), res), _clamp_py(int(xmax // s), res)
    iy0, iy1 = _clamp_py(int(ymin // s), res), _clamp_py(int(ymax // s), res)
    return [(res << _RES_SHIFT) | (i << _IX_SHIFT) | j
            for i in range(ix0, ix1 + 1) for j in range(iy0, iy1 + 1)]
