"""The flagship pipeline: caption localization over an image+caption
table, geo-partitioned — osml10n's per-record dataflow lifted into a
set-oriented Spark plan (SURVEY.md §2.8 C1-C3, §3 EP1).

Plan shape (all declarative; Catalyst handles pruning/codegen):

 1. JVM fast path: rows with no ``name:<target>`` tag whose generic
    ``name`` is pure latin resolve to ``name`` without ever entering
    Python (the reference cascade's early return,
    get_localized_name_from_tags.lua:279-287).  On latin-script corpora
    this keeps the vast majority of rows in whole-stage codegen.
 2. Slow path: one Arrow-batched pandas UDF running the full cascade +
    combined-name heuristic + transliteration; country resolution uses
    the per-executor prepared cover lookup (no shuffle — the polygon
    index is broadcast state, a map-side spatial join).
 3. cell_id / tile_id assignment (numpy bit-math UDFs) and optional
    repartition by cell prefix for write locality (z-order clustering).

The image payload columns (bytes/w/h/fmt/phash) are carried through
untouched — integrity is asserted by tests/test_pipeline.py via PSNR
and caption byte-equality.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernels.scripts import RE_NON_LATIN
from ..udfs import udf_cell_id, udf_placename, udf_streetname, udf_tile_id

__all__ = ["localize"]


def localize(df: DataFrame, target_lang: str = "en", *,
             is_street: bool = False, localized_name_last: bool = False,
             separator: str | None = None, tags_col: str = "tags",
             id_col: str = "image_id", lon_col: str = "lon",
             lat_col: str = "lat", out_col: str = "caption_l10n",
             cell_res: int = 9, tile_z: int = 8, tile_maxz: int = 16,
             add_cells: bool = True, fast_path: bool = True,
             repartition_by_cell: bool = False) -> DataFrame:
    """Append ``caption_l10n`` (+ ``cell_id``/``tile_id``) to ``df``."""
    if separator is None:
        separator = " - " if is_street else "\n"

    tags = F.col(tags_col)
    name = F.element_at(tags, "name")
    target_tag = F.element_at(tags, F.lit("name:" + target_lang))

    udf = udf_streetname if is_street else udf_placename
    slow = udf(F.col(id_col), tags, F.lit(target_lang),
               F.lit(localized_name_last), F.lit(separator),
               F.col(lon_col), F.col(lat_col))

    if fast_path and not is_street:
        # cascade early-return: no target tag + latin generic name → name
        latin_name = name.isNotNull() & ~name.rlike(RE_NON_LATIN)
        result = F.when(target_tag.isNull() & latin_name, name).otherwise(slow)
    else:
        result = slow

    out = df.withColumn(out_col, result)
    if add_cells:
        out = out.withColumn("cell_id",
                             udf_cell_id(F.col(lon_col), F.col(lat_col), cell_res))
        out = out.withColumn("tile_id",
                             udf_tile_id(F.col(lon_col), F.col(lat_col),
                                         tile_z, tile_maxz))
    if repartition_by_cell:
        # co-locate cells for write locality; z-order within partitions
        out = (out.repartition(F.col("cell_id"))
                  .sortWithinPartitions("cell_id", "tile_id"))
    return out
