"""Incremental ingest via Structured Streaming (SURVEY.md §2.9).

The reference daemon is a stateless request/response server; the
engine's equivalent incremental surface is a ``foreachBatch`` loop that
runs the same batch localization over each micro-batch and commits a
snapshot per epoch — exactly-once via the snapshot manifest (replayed
epochs skip completed partitions).

``localize_stream`` wires any streaming DataFrame with the input-table
schema into the pipeline; ``windowed_cell_counts`` demonstrates the
watermark + tumbling-window aggregation path on an event-time column.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..engine.localize import localize
from ..engine.snapshots import SnapshotStore

__all__ = ["localize_stream", "curate_stream", "windowed_cell_counts"]


def localize_stream(stream_df: DataFrame, store_root: str,
                    target_lang: str = "en", checkpoint_dir: str | None = None):
    """Start a foreachBatch streaming query running the localization
    pipeline per micro-batch with snapshot commits.

    Concurrency contract: one ACTIVE committer per store root (the
    normal Structured Streaming deployment — one query per checkpoint).
    The committed-epoch cache is still re-validated against the
    manifests on every cache miss, so an epoch landed by ANOTHER
    incarnation (an old job that drained after this one started, even
    one whose manifest seq COLLIDES with an already-scanned seq — seq
    is allocated at commit start, the manifest lands after the slow
    data write) is detected before any double-commit; the rescan reads
    only manifest files not read before (filename-tracked, exact), so
    a long-running stream's per-epoch miss path stays O(new
    manifests), not O(all epochs ever committed)."""
    from ..engine.job import add_cell_prefix

    store = SnapshotStore(store_root)
    # loaded once at stream start, appended in memory, re-validated
    # exactly on miss (see the concurrency contract above)
    seen_files: set[str] = set()
    committed = store.committed_epochs_tracked(seen_files)

    def process(batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        # exactly-once: a crash AFTER commit but BEFORE the streaming
        # checkpoint re-delivers this epoch on restart — the manifest
        # (written last = the commit point) proves it already landed
        if int(epoch_id) in committed:
            return
        # cache miss → read any manifest file not read before (covers
        # stale committers, including seq collisions)
        committed.update(store.committed_epochs_tracked(seen_files))
        if int(epoch_id) in committed:
            return
        staged = add_cell_prefix(batch_df)
        out = localize(staged, target_lang)
        keys = [r.cell_prefix for r in
                staged.select("cell_prefix").distinct().collect()]
        store.commit(out, keys, metrics={"epoch": int(epoch_id)})
        committed.add(int(epoch_id))

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def curate_stream(stream_df: DataFrame, store_root: str,
                  checkpoint_dir: str | None = None, **curate_kwargs):
    """Incremental corpus curation: the composed curate() pipeline
    (dedup → quality gate → lang → optional localize) per micro-batch,
    exactly-once via epoch-keyed snapshot commits — the streaming twin
    of the batch pipeline.  EXACT dedup is scoped per batch
    (cross-batch first-occurrence dedup lives in streaming.stateful) —
    except under ``near_dup='minhash'``, which IS cross-batch: the
    per-epoch gated docs run through a persistent
    :class:`~..streaming.neardup.NearDupStore` under
    ``{store_root}/_neardup`` (first-survivor semantics, exact-batch
    equivalence on arrival-ordered ids; a cross-epoch EXACT dup is a
    jaccard-1.0 near-dup, so it is dropped too).  The near-dup filter
    runs BEFORE the manifest commit (its store appends are idempotent
    per-epoch overwrites, the manifest stays the commit point), and its
    eager intermediates inherit ``checkpoint_dir``'s sibling
    ``{store_root}/_neardup_ckpt`` when the stream has a reliable
    checkpoint.  Same concurrency contract as localize_stream: one
    active committer per store root; the epoch cache re-validates on
    miss."""
    import os

    from ..engine.curate import curate

    store = SnapshotStore(store_root)
    seen_files: set[str] = set()
    committed = store.committed_epochs_tracked(seen_files)

    nd_store = None
    if curate_kwargs.pop("near_dup", None) is not None:
        from .neardup import NearDupStore
        nd_store = NearDupStore(
            os.path.join(store_root, "_neardup"),
            id_col=curate_kwargs.get("id_col", "doc_id"),
            text_col=curate_kwargs.get("text_col", "text"),
            jaccard_threshold=curate_kwargs.pop("near_dup_threshold", 0.8),
            checkpoint_dir=(os.path.join(store_root, "_neardup_ckpt")
                            if checkpoint_dir else None))

    def process(batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        if int(epoch_id) in committed:
            return
        committed.update(store.committed_epochs_tracked(seen_files))
        if int(epoch_id) in committed:
            return
        out, _ = curate(batch_df, with_metrics=False, **curate_kwargs)
        if nd_store is not None:
            out = nd_store.filter_epoch(out, int(epoch_id))
        # partition bookkeeping is epoch-keyed for text streams (no
        # spatial prefix unless the caller localizes)
        store.commit(out, [int(epoch_id)], metrics={"epoch": int(epoch_id)})
        committed.add(int(epoch_id))

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def windowed_cell_counts(stream_df: DataFrame, ts_col: str = "ts",
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window per-cell activity counts (late data
    beyond the watermark is dropped)."""
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window), F.col("cell_id"))
            .agg(F.count(F.lit(1)).alias("n_events")))
