"""Raster-tile ↔ vector-layer alignment (J12) + tile pyramid rollups.

Tile ids ARE grid cells at res z (index/grid.py tile_col), so alignment is
a plain equi-join and zoom rollups are pure cell bit arithmetic — no
recomputation from coordinates at any level. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.grid import cell_ix, cell_iy, cell_res, covers_col, tile_col


def assign_tiles(entities: DataFrame, z: int, mode: str = "cover") -> DataFrame:
    """entities(+bbox) → one row per (entity, tile).

    mode='cover': every tile the bbox touches (rendering semantics);
    mode='center': single tile of the bbox center (counting semantics).
    """
    if mode == "center":
        return entities.withColumn(
            "tile_id",
            tile_col((F.col("xmin") + F.col("xmax")) / 2, (F.col("ymin") + F.col("ymax")) / 2, z),
        )
    return entities.withColumn(
        "tile_id",
        F.explode(covers_col(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), z)),
    )


def tile_zxy(df: DataFrame, tile_id_col: str = "tile_id") -> DataFrame:
    """Decode tile id → (z, tx, ty) columns for export."""
    c = F.col(tile_id_col)
    return df.withColumn("z", cell_res(c)) \
        .withColumn("tx", cell_ix(c)) \
        .withColumn("ty", cell_iy(c))


def raster_vector_align(raster_tiles: DataFrame, entities: DataFrame, z: int,
                        broadcast_raster: bool = False) -> DataFrame:
    """raster_tiles(tile_id, ...) ⋈ entity tile cover at zoom z.

    The raster side at 10^12 scale is NOT broadcastable — default is the
    shuffled equi-join (AQE handles skew); pass broadcast_raster=True for
    small tile sets."""
    ent_tiles = assign_tiles(entities, z, mode="cover")
    r = F.broadcast(raster_tiles) if broadcast_raster else raster_tiles
    return ent_tiles.join(r, "tile_id", "inner")


def tile_pyramid_counts(entities: DataFrame, z_max: int, z_min: int = 0) -> DataFrame:
    """Per-tile entity counts at every level z_min..z_max, in ONE pass.

    Each entity's center tile expands to its ancestor chain JVM-side
    (sequence + transform on the cell bit arithmetic), then a single
    groupBy(tile_id) counts all levels together — one scan of the base
    table however deep the pyramid: the ONE heavy aggregation collapses
    entities to z_max tile counts, then the (4^z_max-times smaller)
    count table explodes each tile into its ancestor chain and a second,
    tiny aggregation sums every level at once. Two exchanges total — one
    carrying z_max per-tile partials (map-side combined), one carrying
    the ~(levels × tiles) rollup partials. The previous formulation
    (per-level rollup + unionByName) was algebraically the same but its
    lazy plan re-executed everything below per union branch — no
    exchange reuse across branches (measured: 0 ReusedExchange, 30
    Exchanges for a 5-level pyramid), i.e. one full scan AND one full
    Arrow decode per level at 10^12 rows."""
    from ..index.grid import _IX_SHIFT, _RES_SHIFT

    base = (
        assign_tiles(entities, z_max, mode="center")
        .groupBy("tile_id").agg(F.count("*").alias("n"))
    )
    ix, iy = cell_ix(F.col("tile_id")), cell_iy(F.col("tile_id"))
    # ancestor at level L: (ix >> (z_max-L), iy >> (z_max-L)) — shiftright
    # needs a literal count, so divide by 2^(z_max-L) (exact in double for
    # res ≤ 16) and floor; indices are non-negative so floor == shift
    chain = F.transform(
        F.sequence(F.lit(int(z_min)), F.lit(int(z_max))),
        lambda L: (
            L.cast("long") * F.lit(1 << _RES_SHIFT).cast("long")
            + F.floor(ix / F.pow(F.lit(2.0), (F.lit(int(z_max)) - L).cast("double"))).cast("long")
            * F.lit(1 << _IX_SHIFT).cast("long")
            + F.floor(iy / F.pow(F.lit(2.0), (F.lit(int(z_max)) - L).cast("double"))).cast("long")
        ),
    )
    return (
        base.select(F.explode(chain).alias("tile_id"), "n")
        .groupBy("tile_id").agg(F.sum("n").alias("n"))
    )
