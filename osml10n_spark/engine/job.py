"""Batch job runner: localize → geo-partition → snapshot commit with
lineage + metrics, resumable mid-run.

``run_localization_job`` processes the input in partition groups keyed
by a coarse cell prefix (parent cell at a low resolution).  Each group
commits its own snapshot — killing the job between commits and rerunning
resumes from the manifest and produces the identical final table
(tests/test_snapshots.py proves it).
"""
from __future__ import annotations


import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..spatial.cellexpr import cell_expr
from .localize import localize
from .metrics import lineage, observe_localization
from .snapshots import SnapshotStore

__all__ = ["run_localization_job", "add_cell_prefix"]

PREFIX_RES = 2       # 8×4 world buckets → snapshot partition groups


def add_cell_prefix(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
                    out_col: str = "cell_prefix") -> DataFrame:
    return df.withColumn(out_col,
                         cell_expr(F.col(lon_col), F.col(lat_col), PREFIX_RES))


def run_localization_job(spark: SparkSession, images: DataFrame, store_root: str,
                         target_lang: str = "en", groups_per_commit: int = 8,
                         max_commits: int | None = None) -> dict:
    """Returns a summary dict with snapshots committed and metrics."""
    store = SnapshotStore(store_root)
    staged = add_cell_prefix(images)

    done = store.completed_partitions()
    prefixes = [r.cell_prefix for r in
                staged.select("cell_prefix").distinct().collect()]
    todo = sorted(p for p in prefixes if p not in done)

    committed = []
    for i in range(0, len(todo), groups_per_commit):
        if max_commits is not None and len(committed) >= max_commits:
            break
        batch_keys = todo[i:i + groups_per_commit]
        batch = staged.filter(F.col("cell_prefix").isin(batch_keys))
        out = localize(batch, target_lang, repartition_by_cell=False)
        observed, obs = observe_localization(out)
        result = observed.repartition(F.col("cell_prefix")) \
            .sortWithinPartitions("cell_id", "tile_id")
        manifest = store.commit(result, batch_keys, metrics={})
        # Observation values are available after the commit action ran;
        # the store owns the manifest rewrite
        manifest["metrics"] = {k: (int(v) if v is not None else None)
                               for k, v in obs.get.items()}
        store.update_metrics(manifest["snapshot_id"], manifest["metrics"])
        # lineage from the JUST-WRITTEN files — identical rows without
        # re-running the cascade a second time
        committed_df = spark.read.parquet(manifest["data_dir"])
        lineage(committed_df).write.mode("overwrite").parquet(
            os.path.join(store_root, "lineage", manifest["snapshot_id"]))
        committed.append(manifest)
    return {"snapshots": [m["snapshot_id"] for m in committed],
            "total_rows": sum(m["row_count"] for m in committed),
            "resumed_from": len(done)}
