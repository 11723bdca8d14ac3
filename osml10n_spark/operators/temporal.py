"""Temporal joins: as-of (point-in-time) join.

Spark has no native ASOF JOIN; the classic scalable formulation is a
single shuffle by key over the UNION of both sides with a carry-forward
window — no range explosion, no per-row Python:

  union(left tagged 1, right tagged 0)
  → window partitionBy(key) orderBy(ts, tag) rows unbounded→current
  → last(right payload, ignoreNulls) carried onto each left row

Right rows sort before left rows at equal timestamps, so the semantics
match DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` (the newest right row
at-or-before the left timestamp) — the contract oracle uses DuckDB's
native ASOF JOIN to prove it.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, payload_cols: list[str] | None = None,
              how: str = "inner") -> DataFrame:
    """For every left row: the newest right row with
    ``right.ts <= left.ts`` within the same key.

    Output = all left columns + right's ``payload_cols`` prefixed
    ``asof_`` + ``asof_ts``.  ``how='left'`` keeps unmatched left rows
    (nulls); ``'inner'`` drops them.  One shuffle on ``key_col``.

    Determinism note: among multiple right rows sharing (key, ts) the
    carried payload is arbitrary (matching pandas merge_asof, which the
    differential test uses as reference) — pre-dedup the right side on
    (key, ts) when that matters.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns
                        if c not in (key_col, ts_col)]
    lcols = left.columns

    # The right row travels as ONE struct so last(ignoreNulls) picks the
    # newest right row ATOMICALLY — per-column carry would resurrect an
    # older non-null value when the matched row's payload is NULL, and
    # could stitch fields from different rows.
    r_struct_type = F.struct(
        F.col(ts_col).alias("ts"),
        *[F.col(c).alias(c) for c in payload_cols])
    l_tag = left.withColumn("_src", F.lit(1)) \
        .withColumn("_r", F.lit(None).cast(
            right.select(r_struct_type.alias("_r")).schema["_r"].dataType))
    r_tag = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_src"),
        r_struct_type.alias("_r"))
    for c in lcols:
        if c not in (key_col, ts_col):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(),
                                            F.col("_src").asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = u.select(
        *lcols, "_src",
        F.last("_r", ignorenulls=True).over(w).alias("_rc"))
    out = carried.filter(F.col("_src") == 1).select(
        *lcols, "_src",
        F.col("_rc.ts").alias("asof_ts"),
        *[F.col(f"_rc.{c}").alias(f"asof_{c}") for c in payload_cols]) \
        .drop("_src")
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out
