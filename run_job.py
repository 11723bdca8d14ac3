#!/usr/bin/env python3
"""spark-submit entry point for the localization job (north-rule run
mode: ``spark-submit --py-files osml10n_spark.zip run_job.py ...``).

On a cluster the package zip ships to every executor via --py-files;
locally the repo root on sys.path works too.  The session comes from
``SparkSession.builder.getOrCreate()`` so spark-submit's --master /
--conf win; the engine's scale defaults (AQE, skew-join, Arrow) are
applied only where not already set.

Examples
--------
  # generate a synthetic input table, localize to German, commit
  # snapshots under /tmp/store (resumable: rerun continues)
  spark-submit --master local[8] --py-files osml10n_spark.zip \
      run_job.py --generate 100000 --store /tmp/store --lang de

  # run over an existing parquet table of image+caption rows
  spark-submit --py-files osml10n_spark.zip run_job.py \
      --input /data/images.parquet --store /data/l10n_store --lang en

  # corpus curation (dedup → quality gate → lang; + localization when
  # the input carries lon/lat) over a documents table; add
  # --near-dup minhash [--checkpoint-dir hdfs://...] for near-dup
  # removal via LSH pairs → components → survivor
  spark-submit --py-files osml10n_spark.zip run_job.py \
      --mode curate --input /data/docs.parquet --output /data/kept

  # persistent IVF ANN index: build once, probe many (partition-pruned)
  spark-submit --py-files osml10n_spark.zip run_job.py \
      --mode index --input /data/emb.parquet --id-col vec_id \
      --output /data/ivf_index
  spark-submit --py-files osml10n_spark.zip run_job.py \
      --mode search --index /data/ivf_index --input /data/queries.parquet \
      --id-col vec_id --k 5 --nprobe 2 --output /data/neighbors

Build the zip with:  python run_job.py --make-zip osml10n_spark.zip
"""
from __future__ import annotations

import argparse
import json
import sys


ENGINE_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
}


def make_zip(dest: str) -> None:
    import pathlib
    import zipfile
    root = pathlib.Path(__file__).resolve().parent / "osml10n_spark"
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(root.rglob("*")):
            if p.is_file() and "__pycache__" not in p.parts:
                zf.write(p, "osml10n_spark/" + str(p.relative_to(root)))
    print(f"wrote {dest}")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet table of image+caption rows")
    ap.add_argument("--generate", type=int,
                    help="synthesize N input rows instead of --input")
    ap.add_argument("--store", required=False,
                    help="snapshot store root (resumable)")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--output", help="plain parquet output (no snapshots)")
    ap.add_argument("--mode",
                    choices=["localize", "curate", "index", "search"],
                    default="localize",
                    help="localize = flagship pipeline; curate = dedup → "
                         "quality gate → lang (+ localization when the "
                         "input has lon/lat); index = build a persistent "
                         "IVF ANN index from an embeddings table; search "
                         "= probe an index built by --mode index")
    ap.add_argument("--id-col", default="doc_id",
                    help="curate/index mode: id column")
    ap.add_argument("--text-col", default="text",
                    help="curate mode: text column")
    ap.add_argument("--near-dup", choices=["minhash"], default=None,
                    help="curate mode: also remove NEAR-duplicate docs "
                         "(LSH pairs → connected components → min-id "
                         "survivor)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="curate --near-dup: reliable checkpoint store "
                         "for the components fixpoint (HDFS/S3 path on "
                         "a cluster; default executor-local)")
    ap.add_argument("--vec-col", default="embedding",
                    help="index/search mode: embedding column")
    ap.add_argument("--index", help="search mode: index path "
                                    "(--output of --mode index)")
    ap.add_argument("--n-centroids", type=int, default=16,
                    help="index mode: coarse centroid count")
    ap.add_argument("--k", type=int, default=5,
                    help="search mode: neighbors per query")
    ap.add_argument("--nprobe", type=int, default=2,
                    help="search mode: probed centroids per query")
    ap.add_argument("--hex-res", type=int, default=None, metavar="RES",
                    help="also emit an H3-analog 'hexcell' column at this "
                         "resolution (0-24) on localize outputs")
    ap.add_argument("--make-zip", metavar="DEST",
                    help="write the --py-files package zip and exit")
    args = ap.parse_args(argv)

    if args.make_zip:
        make_zip(args.make_zip)
        return

    if args.hex_res is not None and not (args.mode == "localize"
                                         and args.output
                                         and not args.store):
        # silently ignoring the flag on curate/index/search or the
        # snapshot-store path would look like a no-op bug downstream
        ap.error("--hex-res applies only to --mode localize with "
                 "--output (plain parquet localize output)")

    from pyspark import SparkConf
    from pyspark.sql import SparkSession
    submitted = SparkConf()          # carries spark-submit --conf values
    b = SparkSession.builder.appName("osml10n-localize")
    for k, v in ENGINE_DEFAULTS.items():
        if not submitted.contains(k):    # --conf wins over engine defaults
            b = b.config(k, v)
    spark = b.getOrCreate()

    from osml10n_spark.engine.job import run_localization_job
    from osml10n_spark.engine.localize import localize
    from osml10n_spark.sources.datagen import generate_images

    if args.generate:
        images = generate_images(spark, args.generate, seed=42)
    elif args.input:
        images = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --generate")

    if args.mode == "index":
        from osml10n_spark.operators.similarity import IVFIndex
        if not args.output:
            ap.error("--mode index needs --output (the index path)")
        idx = IVFIndex.build(images, args.output,
                             n_centroids=args.n_centroids,
                             iid_col=args.id_col, vec_col=args.vec_col)
        # build stats ride the write job (df.observe) — no re-scan
        print(json.dumps({"index": args.output,
                          "n_centroids": args.n_centroids,
                          "items": int(idx.build_stats["items"]),
                          "non_empty_lists": int(idx.build_stats["lists"])}))
        spark.stop()
        return

    if args.mode == "search":
        from osml10n_spark.operators.similarity import IVFIndex
        if not args.index or not args.output:
            ap.error("--mode search needs --index and --output")
        idx = IVFIndex.load(spark, args.index)
        res = idx.search(images, args.k, nprobe=args.nprobe,
                         qid_col=args.id_col, vec_col=args.vec_col)
        res.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output,
                          "rows": spark.read.parquet(args.output).count()}))
        spark.stop()
        return

    if args.mode == "curate":
        from osml10n_spark.engine.curate import curate
        has_geo = "lon" in images.columns and "lat" in images.columns
        kw = dict(id_col=args.id_col, text_col=args.text_col,
                  checkpoint_dir=args.checkpoint_dir)
        if args.near_dup:
            kw.update(near_dup=args.near_dup)
        if has_geo:
            kw.update(localize_to=args.lang, lon_col="lon", lat_col="lat")
        out, obs = curate(images, **kw)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(json.dumps({"output": args.output,
                              "metrics": {k: (float(v) if v is not None
                                              else None)
                                          for k, v in obs.get.items()}}))
        else:
            n = out.count()
            print(json.dumps({"rows_kept": n}))
        spark.stop()
        return

    if args.store:
        summary = run_localization_job(spark, images, args.store,
                                       target_lang=args.lang)
        print(json.dumps(summary))
    elif args.output:
        out = localize(images, args.lang)
        if args.hex_res is not None:
            from osml10n_spark.operators.spatial import assign_hexcells
            out = assign_hexcells(out, res=args.hex_res)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output}))
    else:
        n = localize(images, args.lang).count()
        print(json.dumps({"rows": n}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
