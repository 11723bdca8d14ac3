"""Similarity search over embedding columns (array<float>).

- cosine_topk:   brute-force exact top-k per query (the baseline and
                 the oracle; broadcast the smaller side).
- lsh_topk:      random-hyperplane LSH bucketing — candidates share a
                 signature bucket (equi-join), exact cosine refine,
                 window top-k.  The scale path: one shuffle on the
                 bucket key instead of a cross join.

Vector math is JVM-side (zip_with/aggregate — no Python), deterministic
hyperplanes derived from a seed.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cosine_topk", "lsh_topk", "ivf_topk", "IVFIndex",
           "cell_embedding_profile"]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_topk(queries: DataFrame, items: DataFrame, k: int,
                qid_col: str = "qid", iid_col: str = "iid",
                vec_col: str = "embedding",
                broadcast_items: bool = True) -> DataFrame:
    """Exact cosine top-k; output (qid, iid, cosine, rank)."""
    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(vec_col).alias("q_vec")) \
        .withColumn("q_nrm", _norm(F.col("q_vec")))
    i = items.select(F.col(iid_col).alias("iid"),
                     F.col(vec_col).alias("i_vec")) \
        .withColumn("i_nrm", _norm(F.col("i_vec")))
    if broadcast_items:
        i = F.broadcast(i)
    joined = q.crossJoin(i).withColumn(
        "cosine", _dot(F.col("q_vec"), F.col("i_vec"))
        / (F.col("q_nrm") * F.col("i_nrm")))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("iid").asc())
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "iid", "cosine", "rank"))


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_topk(queries: DataFrame, items: DataFrame, k: int, dim: int,
             n_bits: int = 8, n_tables: int = 4, seed: int = 42,
             qid_col: str = "qid", iid_col: str = "iid",
             vec_col: str = "embedding") -> DataFrame:
    """ANN: sign-of-projection LSH signatures over ``n_tables``
    independent tables; bucket equi-join → exact cosine → top-k.
    Recall grows with n_tables; candidates stay near-linear."""
    def signature(vec, table: int):
        planes = _hyperplanes(dim, n_bits, seed + table)
        bit_exprs = []
        for bi, plane in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(p) for p in plane]),
                           lambda x, p: x.cast("double") * p),
                F.lit(0.0), lambda acc, x: acc + x)
            bit_exprs.append(F.when(proj >= 0,
                                    F.lit(1 << bi)).otherwise(F.lit(0)))
        sig = bit_exprs[0]
        for e in bit_exprs[1:]:
            sig = sig + e
        return F.concat(F.lit(f"t{table}:"), sig.cast("string"))

    def bucketize(df, id_alias, vec_alias):
        sigs = F.array(*[signature(F.col(vec_alias), t) for t in range(n_tables)])
        return df.withColumn("bucket", F.explode(sigs))

    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(vec_col).alias("q_vec")) \
        .withColumn("q_nrm", _norm(F.col("q_vec")))
    i = items.select(F.col(iid_col).alias("iid"),
                     F.col(vec_col).alias("i_vec")) \
        .withColumn("i_nrm", _norm(F.col("i_vec")))
    qb = bucketize(q, "qid", "q_vec")
    ib = bucketize(i, "iid", "i_vec")
    # dedup on the (qid, iid) PAIR KEYS only — full vectors never pass
    # through the distinct shuffle; they rejoin once per surviving pair
    cand = (qb.select("qid", "bucket")
            .join(ib.select("iid", "bucket"), "bucket")
            .select("qid", "iid")
            .distinct())
    scored = (cand.join(q, "qid").join(i, "iid")
              .withColumn("cosine", _dot(F.col("q_vec"), F.col("i_vec"))
                          / (F.col("q_nrm") * F.col("i_nrm"))))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("iid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "iid", "cosine", "rank"))


def _pick_centroids(i: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic coarse centroids: the ``n_centroids`` items with
    the smallest id hash — orderBy().limit() is a distributed
    TakeOrdered reduction; the tiny result is collected and rebuilt as
    a literal DataFrame (the daemon's prepared-at-startup dimension
    idiom), so nothing downstream depends on a cached lineage and no
    persist can leak executor storage across calls.  ``i`` must carry
    (iid, i_vec, i_nrm)."""
    picked = i.orderBy(F.xxhash64("iid").asc(), F.col("iid").asc()) \
        .limit(n_centroids).collect()
    picked.sort(key=lambda r: r.iid)
    return i.sparkSession.createDataFrame(
        [(cid, [float(x) for x in r.i_vec], float(r.i_nrm))
         for cid, r in enumerate(picked)],
        "cid long, c_vec array<double>, c_nrm double")


def _assign_centroids(df: DataFrame, cents: DataFrame, id_col: str,
                      vec: str, nrm: str, keep: int) -> DataFrame:
    """Nearest ``keep`` centroids by cosine (broadcast centroid dim),
    one rank window per ``id_col`` value."""
    sim = _dot(F.col(vec), F.col("c_vec")) / (F.col(nrm) * F.col("c_nrm"))
    w = Window.partitionBy(id_col) \
        .orderBy(F.col("_csim").desc(), F.col("cid").asc())
    return (df.crossJoin(F.broadcast(cents))
            .withColumn("_csim", sim)
            .withColumn("_crank", F.row_number().over(w))
            .filter(F.col("_crank") <= keep)
            .drop("c_vec", "c_nrm", "_csim", "_crank"))


def ivf_topk(queries: DataFrame, items: DataFrame, k: int,
             n_centroids: int = 16, nprobe: int = 2,
             qid_col: str = "qid", iid_col: str = "iid",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: coarse quantization + cluster-probed search.

    Centroids are data-derived deterministically: the ``n_centroids``
    items with the smallest xxhash64(id) — a uniform pseudo-random
    sample reproducible under any partitioning; a k-means refinement
    would slot in here without changing the plan shape.  Items shuffle
    ONCE on their nearest
    centroid (the inverted lists); queries probe their ``nprobe``
    nearest centroids and equi-join the lists, then exact cosine +
    window top-k refine.  At 100 TB the item→centroid assignment is a
    broadcast join (centroid table is tiny) and the probe join shuffles
    only by centroid id — candidates per query are bounded by
    nprobe/n_centroids of the corpus instead of all items.
    """
    i = items.select(F.col(iid_col).alias("iid"),
                     F.col(vec_col).alias("i_vec")) \
        .withColumn("i_nrm", _norm(F.col("i_vec")))
    cents = _pick_centroids(i, n_centroids)
    inv = _assign_centroids(i, cents, "iid", "i_vec", "i_nrm", 1)
    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(vec_col).alias("q_vec")) \
        .withColumn("q_nrm", _norm(F.col("q_vec")))
    probed = _assign_centroids(q, cents, "qid", "q_vec", "q_nrm", nprobe)
    # (qid, rank) is unique by construction — each item sits in exactly
    # one inverted list, so no distinct/dedup shuffle is needed; result
    # is returned LAZY (centroids are a literal, items scan twice at
    # most — callers persist the result if they iterate it)
    return _refine_topk(probed, inv, k)


def _refine_topk(probed: DataFrame, lists: DataFrame, k: int) -> DataFrame:
    """Shared IVF refine: probe⨝list on cid → exact cosine → per-query
    top-k.  Both ivf_topk and IVFIndex.search end here, so their
    documented result identity holds by construction."""
    cand = probed.join(lists, "cid") \
        .withColumn("cosine", _dot(F.col("q_vec"), F.col("i_vec"))
                    / (F.col("q_nrm") * F.col("i_nrm")))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("iid").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "iid", "cosine", "rank"))


def _profile_stats(mat, power_iters: int = 8):
    """Pure per-group math for cell_embedding_profile: (n, mean vector
    norm, dominant-eigenvalue share of covariance via power iteration).
    Module-level so the contract's replay-literal oracle runs the SAME
    float-op sequence driver-side — any drift between the distributed
    path and the replay breaks the gate hash instead of hiding."""
    import numpy as np
    n = mat.shape[0]
    norms = np.sqrt((mat * mat).sum(axis=1))
    centered = mat - mat.mean(axis=0, keepdims=True)
    share = 0.0
    if n > 1:
        cov = centered.T @ centered / (n - 1)
        v = np.ones(cov.shape[0])
        for _ in range(power_iters):
            v = cov @ v
            nv = np.linalg.norm(v)
            if nv == 0.0:
                break
            v /= nv
        lam = float(v @ cov @ v)
        tr = float(np.trace(cov))
        share = lam / tr if tr > 0 else 0.0
    return n, float(norms.mean()), share


def cell_embedding_profile(df: DataFrame, cell_col: str = "cell_id",
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           power_iters: int = 8) -> DataFrame:
    """Per-cell embedding summary via applyInPandas (grouped-map): row
    count, mean vector norm, and the dominant-eigenvalue share of the
    cell's covariance (power iteration — deterministic: rows sorted by
    id inside each group, fixed all-ones start vector).  The curation
    signal for drift/cluster collapse per spatial cell.

    This is the genuinely-iterative per-group computation the built-in
    operators can't express (SURVEY §2.10's grouped-map slot): one
    shuffle on the grouping key, numpy inside.  Output:
    (cell, n, mean_norm, top_eig_share)."""
    import numpy as np
    import pandas as pd

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        n, mean_norm, share = _profile_stats(mat, power_iters)
        return pd.DataFrame({
            "cell": [pdf[cell_col].iloc[0]],
            "n": [n],
            "mean_norm": [mean_norm],
            "top_eig_share": [share],
        })

    return (df.select(F.col(cell_col), F.col(id_col), F.col(vec_col))
            .groupBy(cell_col)
            .applyInPandas(profile,
                           schema="cell long, n long, mean_norm double, "
                                  "top_eig_share double"))


class IVFIndex:
    """Persistent IVF ANN index: build ONCE, probe many times.

    ``ivf_topk`` recomputes centroid selection and the item→centroid
    assignment on every call — fine for one-shot queries, wrong at
    corpus scale where the index must amortize.  This class makes the
    inverted lists a durable, *partition-pruned* artifact:

        {path}/centroids/        (cid, c_vec, c_nrm)       tiny
        {path}/lists/cid=N/      (iid, i_vec, i_nrm)       parquet,
                                 partitioned by centroid id

    ``search`` assigns queries to their ``nprobe`` nearest centroids
    (broadcast — the centroid table is a literal), resolves the probed
    cid set driver-side (bounded by n_centroids, never by corpus), and
    reads the lists with ``cid IN (...)`` — a static partition filter,
    so the scan touches ONLY the probed directories.  At 100 TB that is
    the difference between scanning the corpus and scanning
    nprobe/n_centroids of it; the plan's PartitionFilters line proves
    it (pinned in tests/test_similarity_index.py).

    ``append`` assigns NEW items to the existing centroids and appends
    to the lists — incremental ingest without a rebuild (centroids stay
    fixed; recall degrades only if the data distribution drifts, the
    standard IVF trade).  Search results are IDENTICAL to ``ivf_topk``
    over the same item set and parameters (same deterministic centroid
    pick, same assignment, same refine — pinned by test).
    """

    def __init__(self, spark, path: str, cents: DataFrame):
        self.spark = spark
        self.path = path
        self.cents = cents

    @staticmethod
    def build(items: DataFrame, path: str, n_centroids: int = 16,
              iid_col: str = "iid", vec_col: str = "embedding") -> "IVFIndex":
        """Select centroids, assign every item to its nearest one, and
        write both as the on-disk index (overwrites ``path``).  Build
        stats ride the write job itself via ``df.observe`` (zero extra
        scans) and land in ``index.build_stats``: items written and the
        approximate number of non-empty lists."""
        from pyspark.sql import Observation
        i = items.select(F.col(iid_col).alias("iid"),
                         F.col(vec_col).alias("i_vec")) \
            .withColumn("i_nrm", _norm(F.col("i_vec")))
        cents = _pick_centroids(i, n_centroids)
        cents.write.mode("overwrite").parquet(path + "/centroids")
        inv = _assign_centroids(i, cents, "iid", "i_vec", "i_nrm", 1)
        obs = Observation("ivf_build")
        inv.observe(obs, F.count("*").alias("items"),
                    F.approx_count_distinct("cid").alias("lists")) \
            .write.mode("overwrite").partitionBy("cid") \
            .parquet(path + "/lists")
        idx = IVFIndex(items.sparkSession, path, cents)
        idx.build_stats = dict(obs.get)
        return idx

    @staticmethod
    def load(spark, path: str) -> "IVFIndex":
        """Re-open an index: the centroid table is tiny — collect and
        rebuild it as a literal so search plans stay broadcast-clean."""
        rows = spark.read.parquet(path + "/centroids").collect()
        rows.sort(key=lambda r: r.cid)
        cents = spark.createDataFrame(
            [(r.cid, [float(x) for x in r.c_vec], float(r.c_nrm))
             for r in rows],
            "cid long, c_vec array<double>, c_nrm double")
        return IVFIndex(spark, path, cents)

    def append(self, items: DataFrame, iid_col: str = "iid",
               vec_col: str = "embedding") -> None:
        """Assign new items to the EXISTING centroids and append them
        to the inverted lists (no rebuild)."""
        i = items.select(F.col(iid_col).alias("iid"),
                         F.col(vec_col).alias("i_vec")) \
            .withColumn("i_nrm", _norm(F.col("i_vec")))
        inv = _assign_centroids(i, self.cents, "iid", "i_vec", "i_nrm", 1)
        inv.write.mode("append").partitionBy("cid") \
            .parquet(self.path + "/lists")

    def probed_lists(self, queries: DataFrame, nprobe: int = 2,
                     qid_col: str = "qid",
                     vec_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
        """(probed queries, partition-pruned list scan) — the search
        building blocks, exposed so plan tests can pin the pruning."""
        q = queries.select(F.col(qid_col).alias("qid"),
                           F.col(vec_col).alias("q_vec")) \
            .withColumn("q_nrm", _norm(F.col("q_vec")))
        probed = _assign_centroids(q, self.cents, "qid", "q_vec", "q_nrm",
                                   nprobe)
        # localCheckpoint pins ONE evaluation of the assignment: the
        # driver-side cid collect below and the downstream refine join
        # must see the SAME probe set (a re-evaluated nondeterministic
        # query source could otherwise land a query in a cid outside
        # the pruned scan and silently lose its candidates), and the
        # collect's work isn't recomputed for the join.  The probed
        # frame is queries×nprobe rows — query-sized, never corpus-
        # sized.
        probed = probed.localCheckpoint(eager=True)
        # the probed cid set is bounded by n_centroids (a literal-sized
        # dimension), never by the corpus — one tiny driver job over
        # the query side, and the static IN filter prunes the list scan
        # at PLANNING time (no DPP machinery, no runtime subquery)
        cids = sorted(r.cid for r in probed.select("cid").distinct().collect())
        lists = self.spark.read.parquet(self.path + "/lists") \
            .filter(F.col("cid").isin(cids))
        return probed, lists

    def search(self, queries: DataFrame, k: int, nprobe: int = 2,
               qid_col: str = "qid", vec_col: str = "embedding") -> DataFrame:
        """Probe → pruned list scan → exact cosine refine → top-k.
        Output (qid, iid, cosine, rank), identical to ``ivf_topk`` over
        the same items/params."""
        probed, lists = self.probed_lists(queries, nprobe, qid_col, vec_col)
        return _refine_topk(probed, lists, k)
