"""Custom stateful streaming operators (applyInPandasWithState):
first-occurrence dedup and running counters, driven through a real file
stream with maxFilesPerTrigger=1 so state must carry ACROSS
micro-batches for the assertions to hold."""
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dirs(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: ids a,b,c in cell 1 / d in cell 2
    spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 2)],
        "image_id string, cell_id long").coalesce(1) \
        .write.parquet(str(src / "f1"))
    # batch 2: duplicates a,d + fresh e,f (e duplicated inside batch)
    spark.createDataFrame(
        [("a", 1), ("d", 2), ("e", 2), ("e", 2), ("f", 1)],
        "image_id string, cell_id long").coalesce(1) \
        .write.parquet(str(src / "f2"))
    return src, tmp_path / "chk"


def _run_stream(spark, src, chk, transform, name,
                schema="image_id string, cell_id long"):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*"))
    q = (transform(stream).writeStream.format("memory")
         .queryName(name).outputMode("append")
         .option("checkpointLocation", str(chk))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_dedup_stream_drops_cross_batch_duplicates(spark, stream_dirs):
    from osml10n_spark.streaming.stateful import dedup_stream
    src, chk = stream_dirs
    out = _run_stream(spark, src, chk,
                      lambda s: dedup_stream(s, "cell_id", "image_id"),
                      "dedup_sink")
    ids = sorted(out["image_id"].tolist())
    assert ids == ["a", "b", "c", "d", "e", "f"]   # each exactly once


def test_running_cell_counts_accumulate(spark, stream_dirs):
    from osml10n_spark.streaming.stateful import running_cell_counts
    src, chk = stream_dirs
    out = _run_stream(spark, src, chk,
                      lambda s: running_cell_counts(s, "cell_id"),
                      "counts_sink")
    # final totals: cell 1 saw a,b,c (+a,f) = 5 rows; cell 2 d (+d,e,e) = 4
    final = out.sort_values("n_total").groupby("cell").tail(1)
    totals = dict(zip(final["cell"], final["n_total"]))
    assert totals == {1: 5, 2: 4}


def test_dedup_stream_numeric_ids(spark, tmp_path):
    """State schema follows the id column's type (long ids here)."""
    from osml10n_spark.streaming.stateful import dedup_stream
    src = tmp_path / "nsrc"
    src.mkdir()
    spark.createDataFrame([(10, 1), (11, 1)], "image_id long, cell_id long") \
        .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame([(10, 1), (12, 1)], "image_id long, cell_id long") \
        .coalesce(1).write.parquet(str(src / "f2"))
    out = _run_stream(spark, src, tmp_path / "nchk",
                      lambda s: dedup_stream(s, "cell_id", "image_id"),
                      "dedup_num_sink",
                      schema="image_id long, cell_id long")
    assert sorted(out["image_id"].tolist()) == [10, 11, 12]
