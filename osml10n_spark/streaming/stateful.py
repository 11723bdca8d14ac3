"""Custom stateful streaming operators via applyInPandasWithState.

The reference daemon is stateless per request; these operators add the
streaming-state machinery a continuous ingest of the image+caption
table needs (SURVEY.md §2.9 extensions):

- ``dedup_stream``: exactly-once *first-occurrence* pass-through per
  key — per-group state holds the set of already-emitted ids, so
  duplicates arriving in later micro-batches (or replayed batches) are
  dropped.  State survives restarts through the checkpointed state
  store.
- ``running_cell_counts``: per-cell running totals emitted every
  micro-batch (monotone counters without outputMode=complete).

State is bounded by construction: dedup state is per (key, id-set)
group — at scale key by ``cell_id`` so each group's set stays
city-sized, and pair with a TTL re-keying (date-salted keys) when the
stream is unbounded.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["dedup_stream", "running_cell_counts"]


def dedup_stream(stream_df: DataFrame, key_col: str, id_col: str,
                 out_schema: str | None = None) -> DataFrame:
    """First occurrence of each ``id_col`` within each ``key_col`` group
    wins; later duplicates are dropped across micro-batches."""
    cols = stream_df.columns
    out_schema = out_schema or ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stream_df.schema.fields)
    id_type = stream_df.schema[id_col].dataType.simpleString()

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen)]
            # first occurrence within the batch too
            fresh = fresh.drop_duplicates(subset=[id_col], keep="first")
            seen.update(fresh[id_col].tolist())
            if len(fresh):
                yield fresh[cols]
        state.update((sorted(seen),))

    return (stream_df.groupBy(key_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=f"ids array<{id_type}>",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def running_cell_counts(stream_df: DataFrame,
                        cell_col: str = "cell_id") -> DataFrame:
    """Running per-cell row counts in append mode (state = one long)."""
    key_type = stream_df.schema[cell_col].dataType.simpleString()

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        total = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        total += batch
        state.update((total,))
        yield pd.DataFrame({"cell": [key[0]], "n_total": [total],
                            "n_batch": [batch]})

    return (stream_df.groupBy(cell_col)
            .applyInPandasWithState(
                fn, outputStructType=f"cell {key_type}, n_total long, n_batch long",
                stateStructType="n long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
