"""Sinks: geo-clustered parquet writer (S5 mapping from SURVEY.md §2.1).

The reference's output channel is a length-prefixed TCP reply; the
engine's is a partitioned, z-order-clustered parquet layout:

- directory-partitioned by a coarse cell prefix (partition pruning for
  spatial range reads);
- rows within each file sorted by (cell_id, tile_id) — Morton order, so
  spatially-near rows are byte-near (scan locality / min-max row-group
  skipping on the cell_id column).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..engine.job import PREFIX_RES, add_cell_prefix

__all__ = ["write_tiled"]


def write_tiled(df: DataFrame, path: str, mode: str = "overwrite",
                lon_col: str = "lon", lat_col: str = "lat") -> None:
    """Write with geo-clustered layout; expects cell_id/tile_id columns
    (adds them from lon/lat when missing)."""
    out = df
    if "cell_prefix" not in out.columns:
        out = add_cell_prefix(out, lon_col, lat_col)
    if "cell_id" not in out.columns or "tile_id" not in out.columns:
        from ..operators.spatial import assign_cells, assign_tiles
        if "cell_id" not in out.columns:
            out = assign_cells(out, lon_col=lon_col, lat_col=lat_col)
        if "tile_id" not in out.columns:
            out = assign_tiles(out, lon_col=lon_col, lat_col=lat_col)
    # leading cell_prefix satisfies the dynamic-partition writer's
    # required ordering, so it won't re-sort and break the z-order
    (out.repartition(F.col("cell_prefix"))
        .sortWithinPartitions("cell_prefix", "cell_id", "tile_id")
        .write.mode(mode)
        .partitionBy("cell_prefix")
        .parquet(path))
