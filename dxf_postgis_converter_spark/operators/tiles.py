"""Raster-tile ↔ vector-layer alignment (J12) + tile pyramid rollups.

Tile ids ARE grid cells at res z (index/grid.py tile_col), so alignment is
a plain equi-join and zoom rollups walk parent_col — no recomputation from
coordinates at any level. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.grid import cell_ix, cell_iy, cell_res, covers_col, parent_col, tile_col


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
    """Per-tile entity counts at z_max, rolled up the pyramid to z_min by
    re-aggregating parents (each level is a groupBy of the previous —
    4x smaller each step, never re-reads the base table)."""
    level = (
        assign_tiles(entities, z_max, mode="center")
        .groupBy("tile_id").agg(F.count("*").alias("n"))
    )
    out = level
    for _ in range(z_max - z_min):
        level = level.select(parent_col(F.col("tile_id")).alias("tile_id"), "n") \
            .groupBy("tile_id").agg(F.sum("n").alias("n"))
        out = out.unionByName(level)
    return out
