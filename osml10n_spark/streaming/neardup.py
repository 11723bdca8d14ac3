"""Cross-batch NEAR-duplicate dedup for streaming ingest.

``streaming.stateful.dedup_stream`` drops EXACT re-arrivals across
micro-batches; this module completes the streaming dedup story for
NEAR-duplicates (SURVEY.md §2.9 extension; the batch twin is
``curate(near_dup='minhash')``).  The state that must survive between
epochs — minhash band signatures, gated doc texts, discovered pair
edges — is too large for the streaming state store at corpus scale, so
it lives in a parquet SIGNATURE STORE partitioned by epoch:

    {root}/sigs/epoch=N/    (doc_id, band, minhash)    — LSH postings
    {root}/docs/epoch=N/    (doc_id, text)             — verify corpus
    {root}/edges/epoch=N/   (a_id, b_id, band_matches, jaccard)

Per-epoch cost is proportional to the EPOCH, not the corpus: the new
docs' signatures band-join the store (a parquet scan, no re-hash);
Jaccard verification re-shingles only docs in a candidate pair
(semi-join pruned); the connected-components closure runs over the
epoch's new-new edges only.  Writes are per-epoch directory overwrites,
so a replayed epoch (crash between the store append and the snapshot
manifest) is idempotent — prior-state reads filter ``epoch < current``
and never see a partially-written replay.

Semantics — FIRST-SURVIVOR, NO RETRACTION:

- a new doc whose component (within-epoch new-new closure, seeded by
  any direct pair against a prior-epoch doc) touches the prior corpus
  is dropped — the survivor already streamed out in an earlier epoch;
- a purely-within-epoch component keeps its min-id doc (exactly the
  batch rule);
- the one case streaming CANNOT reproduce batch-exactly: a late
  "bridge" doc whose pairs merge two components whose survivors were
  both already committed in earlier epochs.  Batch would keep only the
  min; the stream has already emitted both and does not retract.  The
  bridge itself is dropped, the merging edges land in the edge store,
  and ``reconcile()`` — a global ``dup_components`` closure over the
  accumulated edges — returns the exact batch keep/drop verdict for an
  offline compaction pass (tests/test_streaming_neardup.py pins both
  the equivalence on ordered corpora and the bridge divergence +
  reconcile catch).

Stream ≡ batch EXACTLY whenever each component's members arrive so
that every already-committed prefix is connected and min-id first —
in particular whenever ids are assigned in arrival order (the normal
ingest pattern).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.errors import AnalysisException

from ..operators.dedup import (dup_components, minhash_pairs_incremental,
                               minhash_signature)

__all__ = ["NearDupStore"]


class NearDupStore:
    """Persistent cross-epoch minhash near-dup state (see module doc).

    ``checkpoint_dir``: optional reliable-checkpoint directory for the
    eager intermediates (candidate pairs, closure rounds) — same
    contract as ``dup_components(checkpoint_dir=...)``: pass an
    HDFS/S3 path on a real cluster so executor loss mid-epoch is
    survivable; default executor-local blocks.
    """

    def __init__(self, root: str, *, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 5, bands: int = 8,
                 min_band_matches: int = 2,
                 jaccard_threshold: float = 0.8,
                 checkpoint_dir: str | None = None):
        self.root = root.rstrip("/")
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.bands = bands
        self.min_band_matches = min_band_matches
        self.jaccard_threshold = jaccard_threshold
        self.checkpoint_dir = checkpoint_dir

    # -- store IO ---------------------------------------------------

    def _prior(self, spark: SparkSession, sub: str,
               template: DataFrame, epoch_id: int) -> DataFrame:
        """All rows committed by epochs BEFORE ``epoch_id`` (the strict
        filter makes a crash-replayed epoch re-read the same prior
        state even though its own partial directory already exists)."""
        try:
            df = spark.read.parquet(f"{self.root}/{sub}")
        except AnalysisException:  # first epoch: store not created yet
            return template.limit(0)
        return (df.filter(F.col("epoch") < F.lit(epoch_id))
                .select(*template.columns))

    def _snap(self, df: DataFrame) -> DataFrame:
        """Eager materialization with lineage truncation (the epoch
        stage re-consumes pairs/labels several times and the band-join
        lineage is expensive to re-analyze — same rationale as the
        dup_components rounds)."""
        if self.checkpoint_dir is not None:
            df.sparkSession.sparkContext.setCheckpointDir(
                self.checkpoint_dir)
            return df.checkpoint()
        return df.localCheckpoint()

    # -- per-epoch dedup ---------------------------------------------

    def filter_epoch(self, df: DataFrame, epoch_id: int) -> DataFrame:
        """Drop the near-dup losers of this epoch and append the
        epoch's signatures/docs/edges to the store.  Returns the
        surviving rows of ``df`` (all columns preserved).  EAGER (the
        closure is a fixpoint and the store append is a write); call
        BEFORE the epoch's snapshot commit so a crash replays cleanly
        (store writes are idempotent per-epoch overwrites; the
        manifest is the commit point)."""
        spark = df.sparkSession
        new = df.select(F.col(self.id_col).alias("doc_id"),
                        F.col(self.text_col).alias("text"))
        sig_new = minhash_signature(new, "doc_id", "text",
                                    self.n, self.bands)
        prior_docs = self._prior(spark, "docs", new, epoch_id)
        prior_sigs = self._prior(spark, "sigs", sig_new, epoch_id)

        pairs = self._snap(minhash_pairs_incremental(
            new, prior_docs.unionByName(new), "doc_id", "text",
            n=self.n, bands=self.bands,
            min_band_matches=self.min_band_matches,
            jaccard_threshold=self.jaccard_threshold,
            sig_all=prior_sigs.unionByName(sig_new)))

        # classify pair sides: every pair involves >=1 new doc
        new_ids = new.select("doc_id")
        flagged = (pairs
                   .join(new_ids.select(F.col("doc_id").alias("a_id"))
                         .withColumn("a_new", F.lit(True)), "a_id", "left")
                   .join(new_ids.select(F.col("doc_id").alias("b_id"))
                         .withColumn("b_new", F.lit(True)), "b_id", "left")
                   .select("a_id", "b_id",
                           F.coalesce("a_new", F.lit(False)).alias("a_new"),
                           F.coalesce("b_new", F.lit(False)).alias("b_new")))
        new_new = flagged.filter(F.col("a_new") & F.col("b_new")) \
            .select("a_id", "b_id")
        # tainted seed: the NEW side of a pair whose other side is a
        # prior-epoch doc — its component's true survivor already
        # streamed out
        tainted = (flagged.filter(F.col("a_new") != F.col("b_new"))
                   .select(F.when(F.col("a_new"), F.col("a_id"))
                           .otherwise(F.col("b_id")).alias("doc_id"))
                   .distinct())

        labels = dup_components(new_new, nodes=tainted,
                                checkpoint_dir=self.checkpoint_dir)
        tainted_comps = (labels.join(tainted, "doc_id", "left_semi")
                         .select("component_id").distinct())
        in_tainted = labels.join(tainted_comps, "component_id", "left_semi")
        in_clean = labels.join(tainted_comps, "component_id", "left_anti")
        losers = self._snap(
            in_tainted.select("doc_id")
            .unionByName(in_clean.filter(~F.col("is_survivor"))
                         .select("doc_id")))

        # append epoch state BEFORE the caller's manifest commit —
        # idempotent per-epoch overwrite (see module doc); the DOCS and
        # SIGS stores keep LOSERS too: a later chain member must pair
        # against any seen doc, committed or not (A~B~C with A≁C —
        # B lost to A in its epoch, but C can only be caught via B)
        for sub, frame in (("sigs", sig_new), ("docs", new),
                           ("edges", pairs)):
            frame.write.mode("overwrite").parquet(
                f"{self.root}/{sub}/epoch={int(epoch_id)}")

        return df.join(losers.withColumnRenamed("doc_id", self.id_col),
                       self.id_col, "left_anti")

    # -- offline closure ---------------------------------------------

    def reconcile(self, spark: SparkSession) -> DataFrame:
        """Exact BATCH keep/drop verdict over everything the stream has
        seen: global ``dup_components`` closure of the accumulated edge
        store with every gated doc as a node.  Returns (doc_id,
        component_id, is_survivor) — ``is_survivor=false`` rows that
        the stream nevertheless committed (the late-bridge case, see
        module doc) are the compaction work-list for an offline pass
        over the committed snapshots."""
        empty_edges = spark.createDataFrame(
            [], "a_id long, b_id long")  # only used when store is empty
        try:
            edges = spark.read.parquet(f"{self.root}/edges") \
                .select("a_id", "b_id")
        except AnalysisException:
            edges = empty_edges
        try:
            nodes = spark.read.parquet(f"{self.root}/docs") \
                .select("doc_id")
        except AnalysisException:
            nodes = empty_edges.select(F.col("a_id").alias("doc_id"))
        return dup_components(edges, nodes=nodes,
                              checkpoint_dir=self.checkpoint_dir)
