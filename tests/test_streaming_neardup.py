"""Cross-batch streaming near-dup dedup (streaming/neardup.py).

Pins the four contracts of the NearDupStore design:
1. per-epoch incremental LSH pairs tile exactly into the batch pairs;
2. curate_stream(near_dup='minhash') ≡ batch curate(near_dup='minhash')
   on an arrival-ordered corpus with chains straddling every epoch
   route (within-epoch, store-tainted, tainted-component);
3. the ONE case streaming cannot match batch — a late bridge doc
   merging two already-committed survivors — is no-retraction by
   design, and reconcile() returns the exact batch verdict offline;
4. a crash-replayed epoch is idempotent (same survivors, no duplicated
   store state).
"""
import pytest
from pyspark.sql import functions as F

from osml10n_spark.operators.dedup import (minhash_dup_pairs,
                                           minhash_pairs_incremental)
from osml10n_spark.streaming.neardup import NearDupStore

# ten genuinely-distinct base sentences (pairwise jaccard well under
# the 0.8 gate) that pass the Gopher quality gate
_BASES = [
    "the harbour market sells fresh mackerel every tuesday morning",
    "a granite lighthouse guards the northern channel against fog",
    "wild lavender covers the southern hillside throughout early summer",
    "the night train crosses two rivers before reaching the capital",
    "old copper kettles whistle softly inside the village bakery",
    "migrating cranes rest beside the shallow lake each october",
    "the observatory dome rotates slowly under clear winter skies",
    "handwoven baskets line the narrow alley behind the tannery",
    "spring meltwater fills the irrigation ditches across the plateau",
    "the ferry timetable changes whenever the tide tables shift",
]


def _chain_corpus(spark):
    """Arrival-ordered planted chains: base i (id i), variant +100
    (text+' zz', i<5), variant +200 (text+' zz zz', i<5) — base~v1 and
    v1~v2 always pair; ids increase along each chain."""
    rows = [(i, t) for i, t in enumerate(_BASES)]
    rows += [(100 + i, _BASES[i] + " zz") for i in range(5)]
    rows += [(200 + i, _BASES[i] + " zz zz") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_pairs_tile_into_batch(spark):
    """Union of per-epoch minhash_pairs_incremental over a 3-epoch
    split == minhash_dup_pairs over the final corpus (every pair found
    exactly once, when its later member arrives)."""
    corpus = _chain_corpus(spark)
    batch = {(r.a_id, r.b_id, r.band_matches, round(r.jaccard, 9))
             for r in minhash_dup_pairs(
                 corpus, "doc_id", "text",
                 jaccard_threshold=0.8).collect()}
    # epoch splits: ids <8 | 8..104 | rest — cuts chains at every joint
    bounds = [(None, 8), (8, 105), (105, None)]
    seen_rows = []
    inc = set()
    for lo, hi in bounds:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") < hi)
        new = corpus.filter(cond)
        seen_rows.append(new)
        all_df = seen_rows[0]
        for frame in seen_rows[1:]:
            all_df = all_df.unionByName(frame)
        got = minhash_pairs_incremental(new, all_df, "doc_id", "text",
                                        jaccard_threshold=0.8).collect()
        epoch_pairs = {(r.a_id, r.b_id, r.band_matches,
                        round(r.jaccard, 9)) for r in got}
        assert not (epoch_pairs & inc), "pair found twice across epochs"
        inc |= epoch_pairs
    assert inc == batch


def test_curate_stream_neardup_matches_batch(spark, tmp_path):
    """Full streaming pipeline with near_dup='minhash' over two epochs
    (id-threshold split = arrival order) commits exactly the batch
    curate(near_dup='minhash') rows."""
    from osml10n_spark.engine.curate import curate
    from osml10n_spark.engine.snapshots import SnapshotStore
    from osml10n_spark.streaming.incremental import curate_stream

    corpus = _chain_corpus(spark)
    expect, _ = curate(corpus, near_dup="minhash", with_metrics=False)
    expect_rows = {(r.doc_id, r.lang) for r in
                   expect.select("doc_id", "lang").collect()}

    src = str(tmp_path / "src")
    # epoch0: bases + v1 of chains 0-2 (within-epoch closure);
    # epoch1: v1 of 3-4 (store-tainted) + all v2 (tainted component
    # via their epoch-local v1 pair OR store pair)
    corpus.filter(F.col("doc_id") < 103).coalesce(1).write.parquet(src)
    corpus.filter(F.col("doc_id") >= 103).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(corpus.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    root = str(tmp_path / "store")
    q = curate_stream(stream, root, checkpoint_dir=str(tmp_path / "ckpt"),
                      near_dup="minhash")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = SnapshotStore(root).committed_output(spark)
    got_rows = {(r.doc_id, r.lang) for r in
                out.select("doc_id", "lang").collect()}
    assert got_rows == expect_rows
    # each chain collapsed to its base id
    assert {r[0] for r in got_rows} == set(range(10))


def test_cross_epoch_exact_dup_dropped(spark, tmp_path):
    """A byte-identical re-arrival in a later epoch is a jaccard-1.0
    near-dup: the store drops it even though exact dedup is per-batch."""
    store = NearDupStore(str(tmp_path / "nd"))
    e0 = spark.createDataFrame([(1, _BASES[0])], "doc_id long, text string")
    e1 = spark.createDataFrame([(2, _BASES[0]), (3, _BASES[1])],
                               "doc_id long, text string")
    assert {r.doc_id for r in store.filter_epoch(e0, 0).collect()} == {1}
    assert {r.doc_id for r in store.filter_epoch(e1, 1).collect()} == {3}


def test_bridge_divergence_and_reconcile(spark, tmp_path):
    """Late bridge doc G pairs with two ALREADY-COMMITTED survivors D
    and F (D≁F directly): the stream drops G but cannot retract F —
    documented no-retraction semantics — while reconcile() returns the
    exact batch verdict (single component, D survives, F flagged)."""
    d_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    f_text = "one two three four five six seven eight nine ten eleven"
    g_text = d_text + " " + f_text
    store = NearDupStore(str(tmp_path / "nd"),
                         min_band_matches=1, jaccard_threshold=0.4)
    e0 = spark.createDataFrame([(1, d_text), (2, f_text)],
                               "doc_id long, text string")
    e1 = spark.createDataFrame([(3, g_text)], "doc_id long, text string")
    assert {r.doc_id for r in store.filter_epoch(e0, 0).collect()} == {1, 2}
    # sanity: the bridge really pairs with BOTH committed survivors
    survivors1 = {r.doc_id for r in store.filter_epoch(e1, 1).collect()}
    edges = {(r.a_id, r.b_id) for r in
             spark.read.parquet(str(tmp_path / "nd" / "edges")).collect()}
    assert edges == {(1, 3), (2, 3)}
    assert survivors1 == set()              # bridge dropped, no retraction
    verdict = {r.doc_id: (r.component_id, r.is_survivor)
               for r in store.reconcile(spark).collect()}
    assert verdict == {1: (1, True), 2: (1, False), 3: (1, False)}


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Crash between the store append and the manifest commit replays
    the epoch: same survivors, per-epoch overwrite leaves no duplicate
    store rows, prior-state reads never see the partial replay."""
    store = NearDupStore(str(tmp_path / "nd"))
    corpus = _chain_corpus(spark)
    e0 = corpus.filter(F.col("doc_id") < 100)
    e1 = corpus.filter(F.col("doc_id") >= 100)
    store.filter_epoch(e0, 0)
    first = {r.doc_id for r in store.filter_epoch(e1, 1).collect()}
    replay = {r.doc_id for r in store.filter_epoch(e1, 1).collect()}
    assert replay == first == set()         # every later chain member loses
    sigs = spark.read.parquet(str(tmp_path / "nd" / "sigs"))
    assert sigs.count() == sigs.distinct().count()
    docs = spark.read.parquet(str(tmp_path / "nd" / "docs"))
    assert docs.count() == corpus.count()
