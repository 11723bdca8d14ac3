"""Driver-contract queries + DuckDB oracle SQL (consumed by
__spark_entry__.py).

Every entry pairs one engine operator (SURVEY.md §2) with an
ANSI-SQL re-derivation DuckDB can run on the same parquet tables.
Column names and value derivations are kept bit-identical on both
sides (deterministic point/rect synthesis from integer keys, exact
decimal aggregation before double casts, floor-truncation instead of
round, md5-based portable hashing).  Queries whose Spark side runs
engine UDFs with no SQL equivalent (pixel decoding, FP-hyperplane ANN)
have no oracle → the driver records the weaker rows-only check.
"""
from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators.dedup import (exact_dedup, minhash_dup_pairs,
                              minhash_signature, simhash_dup_pairs)
from .operators.similarity import cosine_topk, ivf_topk, lsh_topk
from .operators.spatial import (assign_cells, cell_histogram, knn_cells,
                                pip_join_rects)
from .operators.textops import (add_script_flags, fingerprint, lang_id,
                                quality_score, token_count)
from .udfs import (udf_country_name, udf_placename, udf_street_abbrev,
                   udf_unaccent)

# ------------------------------------------------------------------ helpers

RE_NON_LATIN_SPARK = "[^\\x00-\\u024F]"
RE_NON_LATIN_DUCK = r"[^\x{0000}-\x{024F}]"
RE_CJK_DUCK = r"[\x{4E01}-\x{9FFE}]"
RE_CYR_DUCK = r"[\x{0401}-\x{04FE}]"
RE_THAI_DUCK = r"[\x{0E01}-\x{0E7E}]"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _points(spark, sf_dir):
    """Deterministic synthetic points from customer keys — identical
    expression text on the SQL side."""
    return _t(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS id",
        "((c_custkey * 37) % 360) - 180 + 0.5 AS lon",
        "((c_custkey * 7) % 160) - 80 + 0.5 AS lat")


_PTS_SQL = ("SELECT c_custkey AS id, "
            "((c_custkey * 37) % 360) - 180 + 0.5 AS lon, "
            "((c_custkey * 7) % 160) - 80 + 0.5 AS lat FROM customer")

# Morton spread chain (shared by tile/cell oracles); x must be < 2^32.
_M1, _M2, _M3 = 281470681808895, 71777214294589695, 1085102592571150095
_M4, _M5 = 3689348814741910323, 6148914691236517205


def _spread_sql(steps_src: str, xin: str, yin: str) -> str:
    """CTE chain computing morton from integer columns xin/yin of
    ``steps_src`` (must expose them)."""
    return f"""
s1 AS (SELECT *, ({xin} | ({xin} << 16)) & {_M1} AS sx1,
                ({yin} | ({yin} << 16)) & {_M1} AS sy1 FROM {steps_src}),
s2 AS (SELECT *, (sx1 | (sx1 << 8)) & {_M2} AS sx2,
                (sy1 | (sy1 << 8)) & {_M2} AS sy2 FROM s1),
s3 AS (SELECT *, (sx2 | (sx2 << 4)) & {_M3} AS sx3,
                (sy2 | (sy2 << 4)) & {_M3} AS sy3 FROM s2),
s4 AS (SELECT *, (sx3 | (sx3 << 2)) & {_M4} AS sx4,
                (sy3 | (sy3 << 2)) & {_M4} AS sy4 FROM s3),
s5 AS (SELECT *, ((sx4 | (sx4 << 1)) & {_M5})
               | (((sy4 | (sy4 << 1)) & {_M5}) << 1) AS morton FROM s4)"""


_NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


# ------------------------------------------------------------------ queries

def q_cascade(spark, sf_dir):
    """W3/J3: localization priority cascade as a pure column plan."""
    n = _t(spark, sf_dir, "nation")
    name_de = F.when(F.col("n_nationkey") % 3 == 0,
                     F.concat(F.lit("Deutsch "), F.col("n_name")))
    gen_name = F.when(F.col("n_nationkey") % 4 == 1,
                      F.concat(F.lit("Кириллица "), F.col("n_name"))) \
        .otherwise(F.col("n_name"))
    int_name = F.when(F.col("n_nationkey") % 5 == 2,
                      F.concat(F.lit("Intl "), F.col("n_name")))
    name_en = F.when(F.col("n_nationkey") % 2 == 0,
                     F.concat(F.lit("English "), F.col("n_name")))
    latin = lambda c: F.when(~c.rlike(RE_NON_LATIN_SPARK), c)
    cascade = F.coalesce(name_de, latin(gen_name), latin(int_name),
                         name_en, gen_name)
    return n.select(F.col("n_nationkey").alias("id"),
                    cascade.alias("caption_l10n")).orderBy("id")


Q_CASCADE_SQL = f"""
WITH v AS (
  SELECT n_nationkey AS id,
    CASE WHEN n_nationkey % 3 = 0 THEN 'Deutsch ' || n_name END AS name_de,
    CASE WHEN n_nationkey % 4 = 1 THEN 'Кириллица ' || n_name ELSE n_name END AS gen_name,
    CASE WHEN n_nationkey % 5 = 2 THEN 'Intl ' || n_name END AS int_name,
    CASE WHEN n_nationkey % 2 = 0 THEN 'English ' || n_name END AS name_en
  FROM nation)
SELECT id, COALESCE(name_de,
   CASE WHEN NOT regexp_matches(gen_name, '{RE_NON_LATIN_DUCK}') THEN gen_name END,
   CASE WHEN NOT regexp_matches(int_name, '{RE_NON_LATIN_DUCK}') THEN int_name END,
   name_en, gen_name) AS caption_l10n
FROM v ORDER BY id
"""


def q_script_flags(spark, sf_dir):
    """P1-P4 script classifiers as JVM predicates."""
    d = _t(spark, sf_dir, "documents")
    return add_script_flags(d).select("doc_id", "is_latin", "has_cjk",
                                      "has_cyrillic", "has_thai")


Q_SCRIPT_FLAGS_SQL = f"""
SELECT doc_id,
  NOT regexp_matches(text, '{RE_NON_LATIN_DUCK}') AS is_latin,
  regexp_matches(text, '{RE_CJK_DUCK}') AS has_cjk,
  regexp_matches(text, '{RE_CYR_DUCK}') AS has_cyrillic,
  regexp_matches(text, '{RE_THAI_DUCK}') AS has_thai
FROM documents
"""


def q_lang_profile(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.select(lang_id(F.col("text")).alias("lid"))
            .groupBy("lid").agg(F.count("*").alias("n")))


_LANG_HITS_SQL = r"""len(regexp_extract_all(lower(text), '\b(der|die|das|und|straße|platz)\b')) AS de_h,
  len(regexp_extract_all(lower(text), '\b(le|la|les|rue|avenue|de la)\b')) AS fr_h,
  len(regexp_extract_all(lower(text), '\b(the|street|road|of|and)\b')) AS en_h"""

_LANG_CASE_SQL = f"""CASE
  WHEN regexp_matches(text, '{RE_CJK_DUCK}') THEN 'cjk'
  WHEN regexp_matches(text, '{RE_THAI_DUCK}') THEN 'th'
  WHEN regexp_matches(text, '{RE_CYR_DUCK}') THEN 'cyrillic'
  WHEN regexp_matches(text, '{RE_NON_LATIN_DUCK}') THEN 'other'
  WHEN de_h > fr_h AND de_h > en_h THEN 'de'
  WHEN fr_h > en_h THEN 'fr'
  WHEN en_h > 0 THEN 'en'
  ELSE 'latin' END"""

Q_LANG_PROFILE_SQL = f"""
WITH h AS (SELECT text, {_LANG_HITS_SQL} FROM documents)
SELECT {_LANG_CASE_SQL} AS lid, COUNT(*) AS n
FROM h GROUP BY 1
"""


def q_quality_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = token_count(F.col("text"))
    return d.select("doc_id",
                    tok.getField("words").alias("words"),
                    tok.getField("subwords").alias("subwords"),
                    quality_score(F.col("text")).alias("quality"),
                    fingerprint(F.col("text")).alias("fp"))


Q_QUALITY_TOKENS_SQL = rf"""
WITH n AS (SELECT doc_id, text, {_NORM_SQL} AS t FROM documents),
m AS (SELECT doc_id, t,
  CAST(length(text) AS DOUBLE) AS ln,
  CAST(length(regexp_replace(text, '[^\p{{L}}]', '', 'g')) AS DOUBLE) AS alpha,
  CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) AS punct,
  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digit
  FROM n),
s AS (SELECT doc_id, t,
  LEAST(ln / 200.0, 1.0) AS len_score,
  CASE WHEN ln > 0 THEN alpha / ln ELSE 0.0 END AS alpha_ratio,
  CASE WHEN ln > 0 THEN LEAST(punct / ln * 4.0, 1.0) ELSE 0.0 END AS punct_pen,
  CASE WHEN ln > 0 THEN LEAST(digit / ln * 2.0, 1.0) ELSE 0.0 END AS digit_pen
  FROM m)
SELECT doc_id,
  CAST(CASE WHEN length(t) = 0 THEN 0
       ELSE array_length(string_split(t, ' ')) END AS BIGINT) AS words,
  CAST(ceil(length(t) / 4.0) AS BIGINT) AS subwords,
  floor((0.3 * len_score + 0.5 * alpha_ratio
         + 0.2 * (1.0 - punct_pen) * (1.0 - digit_pen)) * 1000000.0)
    / 1000000.0 AS quality,
  substr(md5(t), 1, 16) AS fp
FROM s
"""


def q_gopher_quality(spark, sf_dir):
    """Gopher-rule pretraining quality signals (words, mean word length,
    symbol/bullet/ellipsis/alpha fractions + combined pass flag) — all
    JVM expressions, each ratio floor-truncated for exact cross-engine
    parity."""
    from .operators.textops import add_gopher_flags
    d = add_gopher_flags(_t(spark, sf_dir, "documents"), "text", "q")
    g = F.col("q")
    return d.select("doc_id", g.getField("words").alias("words"),
                    g.getField("mean_word_len").alias("mean_word_len"),
                    g.getField("symbol_ratio").alias("symbol_ratio"),
                    g.getField("bullet_frac").alias("bullet_frac"),
                    g.getField("ellipsis_frac").alias("ellipsis_frac"),
                    g.getField("alpha_word_frac").alias("alpha_word_frac"),
                    g.getField("gopher_pass").alias("gopher_pass"))


def _gopher_sql(src: str) -> str:
    """CTE chain ``w``/``w2``/``m`` computing the Gopher quality signals
    from ``src`` (must expose doc_id, text, t) — ONE source of truth
    shared by Q_GOPHER_QUALITY_SQL and Q_CURATE_SQL.  Line metrics run
    on \\r/LS/PS/NEL-stripped text, matching the engine (Java (?m)
    anchors at those terminators, RE2 only at \\n)."""
    return rf"""
w AS (SELECT doc_id, text, t,
  CAST(CASE WHEN length(t) = 0 THEN 0
       ELSE len(string_split(t, ' ')) END AS BIGINT) AS words,
  CAST(length(replace(t, ' ', '')) AS DOUBLE) AS word_chars,
  CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE) AS symbols,
  regexp_replace(text, '[\r\x{{2028}}\x{{2029}}\x{{0085}}]', '', 'g') AS tl
  FROM {src}),
w2 AS (SELECT *,
  CAST(len(string_split(tl, chr(10))) AS DOUBLE) AS n_lines,
  CAST(len(regexp_extract_all(tl, '(?m)^[ \t]*[-*•]')) AS DOUBLE)
    AS bullet_lines,
  CAST(len(regexp_extract_all(tl, '(?m)(\.\.\.|…)[ \t]*$')) AS DOUBLE)
    AS ellipsis_lines,
  CAST(len(regexp_extract_all(' ' || t, ' [^ ]*\p{{L}}')) AS DOUBLE)
    AS alpha_words
  FROM w),
m AS (SELECT doc_id, text, t, words,
  CASE WHEN words > 0 THEN floor(word_chars / words * 1000000.0) / 1000000.0
       ELSE 0.0 END AS mean_word_len,
  CASE WHEN words > 0 THEN floor(symbols / words * 1000000.0) / 1000000.0
       ELSE 0.0 END AS symbol_ratio,
  floor(bullet_lines / n_lines * 1000000.0) / 1000000.0 AS bullet_frac,
  floor(ellipsis_lines / n_lines * 1000000.0) / 1000000.0 AS ellipsis_frac,
  CASE WHEN words > 0 THEN
    floor(alpha_words / words * 1000000.0) / 1000000.0
    ELSE 0.0 END AS alpha_word_frac
  FROM w2)"""


_GOPHER_PASS_SQL = (
    "(words >= 3 AND mean_word_len >= 1.0 AND mean_word_len <= 12.0 "
    "AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 "
    "AND ellipsis_frac <= 0.3 AND alpha_word_frac >= 0.6)")

Q_GOPHER_QUALITY_SQL = rf"""
WITH n AS (SELECT doc_id, text, {_NORM_SQL} AS t FROM documents),
{_gopher_sql('n')}
SELECT doc_id, words, mean_word_len, symbol_ratio, bullet_frac,
  ellipsis_frac, alpha_word_frac,
  {_GOPHER_PASS_SQL} AS gopher_pass
FROM m
"""


def q_repetition(spark, sf_dir):
    """Duplicate word-n-gram fractions (the Gopher repetition filter) —
    measured on the raw text AND a self-concatenation (provably
    repetitive), as pure array expressions."""
    from .operators.textops import repetition_ratio
    d = _t(spark, sf_dir, "documents")
    doubled = F.concat(F.col("text"), F.lit(" "), F.col("text"))
    return d.select("doc_id",
                    repetition_ratio(F.col("text"), 2).alias("rep2"),
                    repetition_ratio(doubled, 2).alias("rep2_doubled"),
                    repetition_ratio(F.col("text"), 3).alias("rep3"))


def _rep_sql(src: str, n: int) -> str:
    gram = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))
    return f"""(
  SELECT CASE WHEN len(ws) - {n - 1} >= 1 THEN
    floor(CAST(len(ws) - {n - 1}
           - len(list_distinct(list_transform(
               generate_series(1, len(ws) - {n - 1}), i -> {gram})))
          AS DOUBLE) / (len(ws) - {n - 1}) * 1000000.0) / 1000000.0
    ELSE 0.0 END
  FROM (SELECT string_split({src}, ' ') AS ws))"""


Q_REPETITION_SQL = rf"""
WITH n AS (SELECT doc_id, {_NORM_SQL} AS t,
  {_NORM_SQL.replace('text', "(text || ' ' || text)")} AS td
  FROM documents)
SELECT doc_id,
  {_rep_sql('t', 2)} AS rep2,
  {_rep_sql('td', 2)} AS rep2_doubled,
  {_rep_sql('t', 3)} AS rep3
FROM n
"""


def q_clean_text(spark, sf_dir):
    """Boilerplate strip (URLs, e-mails, whitespace collapse) on a
    constructed corpus — the oracle re-derives with DuckDB's RE2, an
    independent regex engine, over the same dialect-portable patterns."""
    from .operators.textops import clean_text
    n = _t(spark, sf_dir, "nation")
    dirty = F.concat(
        F.lit("See https://x.test/a?b=1&c=%20 and mail "),
        F.lit("bob.smith+x@ex-ample.co.uk  or http://t.co "),
        F.col("n_name"), F.lit("   end"))
    return n.select(F.col("n_nationkey").alias("id"),
                    clean_text(dirty).alias("cleaned"))


Q_CLEAN_TEXT_SQL = r"""
WITH c AS (SELECT n_nationkey AS id,
  'See https://x.test/a?b=1&c=%20 and mail bob.smith+x@ex-ample.co.uk  or http://t.co '
    || n_name || '   end' AS dirty FROM nation)
SELECT id, trim(regexp_replace(regexp_replace(regexp_replace(dirty,
  'https?://\S+', ' ', 'g'),
  '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+', ' ', 'g'),
  '\s+', ' ', 'g')) AS cleaned
FROM c
"""


def q_curate(spark, sf_dir):
    """The composed curation pipeline (exact dedup → Gopher+repetition
    quality gate → language profile) with a FULL oracle: every stage is
    individually oracled, and this query proves the COMPOSITION — the
    dedup keep-set, the gate predicate and the surviving rows' signals
    are re-derived end-to-end in DuckDB.  The corpus plants one victim
    per stage: exact duplicates (doc_id+100000), a high-repetition doc
    (+200000) and a symbol-spam doc (+300000) — each must die in its
    own stage on BOTH engines."""
    from .engine.curate import curate
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.unionAll(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .filter(F.col("doc_id") < 100030)) \
        .unionAll(d.select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.lit("spam spam spam spam spam spam spam spam").alias("text"))
        .filter(F.col("doc_id") < 200005)) \
        .unionAll(d.select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.lit("alpha # beta # gamma # # # #").alias("text"))
        .filter(F.col("doc_id") < 300005))
    out, _ = curate(planted, with_metrics=False)
    return out.select("doc_id", F.col("quality.words").alias("words"),
                      F.col("repetition").alias("repetition"), "lang")


def q_curate_stream(spark, sf_dir):
    """Streaming curation ≡ batch curation, contract-proven: the SAME
    planted corpus as q_curate flows through curate_stream as TWO
    micro-batches (file-per-trigger), lands in an epoch-keyed snapshot
    store with exactly-once commits, and the committed output matches
    the SAME DuckDB oracle as q_curate — one oracle, batch and
    streaming plans.  Dedup is per-batch in the streaming twin
    (cross-batch first-occurrence dedup lives in streaming.stateful),
    so the epoch split keys each (doc, +100000-planted-dup) pair into
    the same file via base-id parity (+100000 preserves parity).  The
    spam (+200000) and symbol (+300005) plantings are INTRA-group
    duplicates whose members DO straddle the parity split; streaming ≡
    batch still holds only because the quality gate drops every member
    of those groups regardless of which batch deduped them — if their
    texts are ever edited to pass the gate, move them onto one parity
    side (e.g. even ids) or the oracle will mismatch confusingly."""
    import os
    import tempfile
    import uuid

    from .engine.snapshots import SnapshotStore
    from .streaming.incremental import curate_stream

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.unionAll(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .filter(F.col("doc_id") < 100030)) \
        .unionAll(d.select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.lit("spam spam spam spam spam spam spam spam").alias("text"))
        .filter(F.col("doc_id") < 200005)) \
        .unionAll(d.select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.lit("alpha # beta # gamma # # # #").alias("text"))
        .filter(F.col("doc_id") < 300005))
    run = os.path.join(tempfile.gettempdir(),
                       "osml10n_gate_cstream_" + uuid.uuid4().hex[:12])
    src = os.path.join(run, "src")
    # two explicit single-file writes → exactly two files → exactly two
    # epochs at ANY scale (a range/hash repartition can collapse to one
    # non-empty file on tiny inputs); duplicate pairs co-locate because
    # +100000 preserves doc_id parity
    par = F.pmod(F.col("doc_id"), F.lit(2))
    planted.filter(par == 0).coalesce(1).write.parquet(src)
    planted.filter(par == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(planted.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    sq = curate_stream(stream, os.path.join(run, "store"),
                       checkpoint_dir=os.path.join(run, "ckpt"))
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    out = SnapshotStore(os.path.join(run, "store")).committed_output(spark)
    return out.select("doc_id", F.col("quality.words").alias("words"),
                      F.col("repetition").alias("repetition"), "lang")


Q_CURATE_SQL = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 30
  UNION ALL SELECT doc_id + 200000,
    'spam spam spam spam spam spam spam spam' FROM documents WHERE doc_id < 5
  UNION ALL SELECT doc_id + 300000,
    'alpha # beta # gamma # # # #' FROM documents WHERE doc_id < 5),
n0 AS (SELECT doc_id, text, {_NORM_SQL} AS t FROM corpus),
k AS (SELECT md5(t) AS dk, MIN(doc_id) AS keep_id FROM n0 GROUP BY 1),
d AS (SELECT n0.doc_id, n0.text, n0.t FROM n0
      JOIN k ON md5(n0.t) = k.dk AND n0.doc_id = k.keep_id),
{_gopher_sql('d')},
q AS (SELECT doc_id, text, t, words,
  {_GOPHER_PASS_SQL} AS gopher_pass,
  {_rep_sql('t', 2)} AS rep2
  FROM m),
h AS (SELECT doc_id, words, gopher_pass, rep2, text,
  {_LANG_HITS_SQL}
  FROM q)
SELECT doc_id, words, rep2 AS repetition,
  {_LANG_CASE_SQL} AS lang
FROM h
WHERE gopher_pass AND rep2 <= 0.3
"""


def q_curate_neardup(spark, sf_dir):
    """curate(near_dup='minhash') — the full production dedup shape in
    ONE composed pipeline: exact dedup → quality gate → LSH near-dup
    pairs → connected-components closure → min-id survivor anti-join.
    The corpus plants near-dup CHAINS on the real documents (doc <20:
    variants +400000 = text||' zz' and +500000 = text||' zz zz'), so
    base~v1 and v1~v2 pair while base~v2 may not — the closure must
    still collapse each chain to its min id.  Every stage re-derives
    in DuckDB: the minhash chain (q_minhash_pairs SQL), the recursive
    CTE closure (q_dup_components SQL) and the curate gate compose into
    one oracle.  The corpus is capped at doc_id < 500 (the full table
    at the gate's sf0.01) so the SINGLE-NODE oracle's minhash — one
    md5 per shingle × band — stays in memory at every sf: at sf0.1 the
    uncapped derivation spilled >80 GB of DuckDB temp while the
    distributed engine side ran fine, which is the scale asymmetry the
    cap exists to absorb (the operator itself has no such limit)."""
    from .engine.curate import curate
    d = _t(spark, sf_dir, "documents").select("doc_id", "text") \
        .filter(F.col("doc_id") < 500)
    planted = d.unionAll(
        d.select((F.col("doc_id") + 400000).alias("doc_id"),
                 F.concat(F.col("text"), F.lit(" zz")).alias("text"))
        .filter(F.col("doc_id") < 400020)) \
        .unionAll(
        d.select((F.col("doc_id") + 500000).alias("doc_id"),
                 F.concat(F.col("text"), F.lit(" zz zz")).alias("text"))
        .filter(F.col("doc_id") < 500020))
    out, _ = curate(planted, near_dup="minhash", with_metrics=False)
    return out.select("doc_id", F.col("quality.words").alias("words"),
                      F.col("repetition").alias("repetition"), "lang")


Q_CURATE_NEARDUP_SQL = rf"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 500
  UNION ALL SELECT doc_id + 400000, text || ' zz'
    FROM documents WHERE doc_id < 20
  UNION ALL SELECT doc_id + 500000, text || ' zz zz'
    FROM documents WHERE doc_id < 20),
n0 AS (SELECT doc_id, text, {_NORM_SQL} AS t FROM corpus),
k AS (SELECT md5(t) AS dk, MIN(doc_id) AS keep_id FROM n0 GROUP BY 1),
d AS (SELECT n0.doc_id, n0.text, n0.t FROM n0
      JOIN k ON md5(n0.t) = k.dk AND n0.doc_id = k.keep_id),
{_gopher_sql('d')},
q AS (SELECT doc_id, text, t, words,
  {_GOPHER_PASS_SQL} AS gopher_pass,
  {_rep_sql('t', 2)} AS rep2
  FROM m),
h AS (SELECT doc_id, t, words, gopher_pass, rep2, text,
  {_LANG_HITS_SQL}
  FROM q),
kept AS (SELECT doc_id, t, words, rep2,
  {_LANG_CASE_SQL} AS lang
  FROM h WHERE gopher_pass AND rep2 <= 0.3),
ix AS (SELECT doc_id, t,
  unnest(generate_series(1, GREATEST(length(t) - 4, 1))) AS i FROM kept),
sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INTEGER), 5) AS sg
       FROM ix),
b AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band),
sig AS (SELECT doc_id, band, MIN(md5(band::VARCHAR || '|' || sg)) AS mh
        FROM sh CROSS JOIN b GROUP BY doc_id, band),
cand AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
         FROM sig a JOIN sig b2 ON a.band = b2.band AND a.mh = b2.mh
                               AND a.doc_id < b2.doc_id
         GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
-- intersections for CANDIDATE pairs only (the final join discards the
-- rest anyway, and the operator itself verifies candidates-only): the
-- unbounded all-pairs-sharing-a-shingle self-join spilled >80 GB of
-- DuckDB temp at sf0.1 (5k docs x ~1k shingles, hub shingles quadratic)
inter AS (SELECT c.a_id, c.b_id, COUNT(*) AS n_int
          FROM cand c
          JOIN sh s1 ON s1.doc_id = c.a_id
          JOIN sh s2 ON s2.doc_id = c.b_id AND s2.sg = s1.sg
          GROUP BY 1, 2),
pairs AS (SELECT c.a_id, c.b_id FROM cand c
          JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
          JOIN sizes sa ON sa.doc_id = c.a_id
          JOIN sizes sb ON sb.doc_id = c.b_id
          WHERE CAST(i.n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_int)
                >= 0.8),
edges AS (SELECT a_id AS s, b_id AS dst FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach(s, dst) AS (
  SELECT s, dst FROM edges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.dst = e.s),
losers AS (SELECT s AS doc_id FROM reach GROUP BY s HAVING MIN(dst) < s)
SELECT doc_id, words, rep2 AS repetition, lang
FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM losers)
"""


def q_curate_stream_neardup(spark, sf_dir):
    """Streaming cross-batch NEAR-dup curation ≡ batch, contract-proven:
    the SAME planted chain corpus as q_curate_neardup flows through
    curate_stream(near_dup='minhash') as TWO micro-batches and the
    committed output matches the SAME DuckDB oracle — one oracle, three
    plans (batch, and now stream with the persistent NearDupStore).
    The epoch split is an id THRESHOLD (epoch0: bases + v1 of doc<10;
    epoch1: v1 of 10-19 + every v2), i.e. arrival-ordered ids — the
    regime where first-survivor streaming semantics is EXACTLY the
    batch min-id rule (streaming/neardup.py module doc) — and it cuts
    the chains at every route: within-epoch closure (base~v1 both in
    epoch0), store-taint (v1 arriving after its base committed), and
    tainted-component (v2 pairing its same-epoch v1 which pairs the
    store).  Cross-epoch EXACT dups need no separate stage here: they
    are jaccard-1.0 near-dups and die in the store."""
    import os
    import tempfile
    import uuid

    from .engine.snapshots import SnapshotStore
    from .streaming.incremental import curate_stream

    d = _t(spark, sf_dir, "documents").select("doc_id", "text") \
        .filter(F.col("doc_id") < 500)
    planted = d.unionAll(
        d.select((F.col("doc_id") + 400000).alias("doc_id"),
                 F.concat(F.col("text"), F.lit(" zz")).alias("text"))
        .filter(F.col("doc_id") < 400020)) \
        .unionAll(
        d.select((F.col("doc_id") + 500000).alias("doc_id"),
                 F.concat(F.col("text"), F.lit(" zz zz")).alias("text"))
        .filter(F.col("doc_id") < 500020))
    run = os.path.join(tempfile.gettempdir(),
                       "osml10n_gate_csneardup_" + uuid.uuid4().hex[:12])
    src = os.path.join(run, "src")
    planted.filter(F.col("doc_id") < 400010).coalesce(1).write.parquet(src)
    planted.filter(F.col("doc_id") >= 400010).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(planted.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    sq = curate_stream(stream, os.path.join(run, "store"),
                       checkpoint_dir=os.path.join(run, "ckpt"),
                       near_dup="minhash")
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    out = SnapshotStore(os.path.join(run, "store")).committed_output(spark)
    return out.select("doc_id", F.col("quality.words").alias("words"),
                      F.col("repetition").alias("repetition"), "lang")


def q_unaccent(spark, sf_dir):
    """F1 unaccent kernel vs DuckDB strip_accents (same decomposition
    semantics on latin corpora; ß preserved on both sides)."""
    n = _t(spark, sf_dir, "nation")
    corpus = F.concat(F.lit("Besançon-München-"), F.col("n_name"))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_unaccent(corpus).alias("unaccented"))


Q_UNACCENT_SQL = """
SELECT n_nationkey AS id,
       strip_accents('Besançon-München-' || n_name) AS unaccented
FROM nation
"""


def q_abbrev_ru(spark, sf_dir):
    """F6 russian street abbreviation (sequential literal replaces)."""
    n = _t(spark, sf_dir, "nation")
    longname = (F.when(F.col("n_nationkey") % 4 == 0,
                       F.concat(F.lit("улица "), F.col("n_name")))
                .when(F.col("n_nationkey") % 4 == 1,
                      F.concat(F.col("n_name"), F.lit(" проспект")))
                .when(F.col("n_nationkey") % 4 == 2,
                      F.concat(F.lit("набережная "), F.col("n_name")))
                .otherwise(F.concat(F.lit("тупик "), F.col("n_name"))))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_street_abbrev(longname, F.lit("ru")).alias("abbrev"))


Q_ABBREV_RU_SQL = """
WITH c AS (SELECT n_nationkey AS id,
  CASE n_nationkey % 4
    WHEN 0 THEN 'улица ' || n_name
    WHEN 1 THEN n_name || ' проспект'
    WHEN 2 THEN 'набережная ' || n_name
    ELSE 'тупик ' || n_name END AS longname
  FROM nation)
SELECT id,
  replace(replace(replace(replace(replace(replace(replace(replace(
    longname, 'переулок', 'пер.'), 'тупик', 'туп.'), 'улица', 'ул.'),
    'бульвар', 'бул.'), 'площадь', 'пл.'), 'проспект', 'просп.'),
    'спуск', 'сп.'), 'набережная', 'наб.') AS abbrev
FROM c
"""


def q_abbrev_uk(spark, sf_dir):
    """F7 ukrainian street abbreviation (literal substring replaces)."""
    n = _t(spark, sf_dir, "nation")
    longname = (F.when(F.col("n_nationkey") % 4 == 0,
                       F.concat(F.lit("провулок "), F.col("n_name")))
                .when(F.col("n_nationkey") % 4 == 1,
                      F.concat(F.col("n_name"), F.lit(" вулиця")))
                .when(F.col("n_nationkey") % 4 == 2,
                      F.concat(F.lit("площа "), F.col("n_name")))
                .otherwise(F.concat(F.col("n_name"), F.lit(" набережна"))))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_street_abbrev(longname, F.lit("uk")).alias("abbrev"))


Q_ABBREV_UK_SQL = """
SELECT n_nationkey AS id,
  CASE n_nationkey % 4
    WHEN 0 THEN 'пров. ' || n_name
    WHEN 1 THEN n_name || ' вул.'
    WHEN 2 THEN 'пл. ' || n_name
    ELSE n_name || ' наб.' END AS abbrev
FROM nation
"""


def q_abbrev_all(spark, sf_dir):
    """F8-F10 abbreviator compositions (latin ∘ non_latin): mixed-script
    street names through street_abbrev_all."""
    n = _t(spark, sf_dir, "nation")
    longname = (F.when(F.col("n_nationkey") % 4 == 0,
                       F.concat(F.lit("улица "), F.col("n_name"),
                                F.lit(" Street")))
                .when(F.col("n_nationkey") % 4 == 1,
                      F.concat(F.lit("Professor-"), F.col("n_name"),
                               F.lit("-Platz Road")))
                .when(F.col("n_nationkey") % 4 == 2,
                      F.concat(F.lit("Avenue "), F.col("n_name")))
                .otherwise(F.concat(F.lit("вулиця "), F.col("n_name"),
                                    F.lit(" Straße"))))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_street_abbrev(longname, F.lit("all")).alias("abbrev"))


Q_ABBREV_ALL_SQL = """
SELECT n_nationkey AS id,
  CASE n_nationkey % 4
    WHEN 0 THEN 'ул. ' || n_name || ' St.'
    WHEN 1 THEN 'Prof.-' || n_name || '-Pl. Rd.'
    WHEN 2 THEN 'Av. ' || n_name
    ELSE 'вул. ' || n_name || ' Str.' END AS abbrev
FROM nation
"""


def q_salted_agg(spark, sf_dir):
    """Skew pattern with exact parity: hot key spread over 8 salts,
    partial aggregation per (key, salt), exact final merge — result
    equals the direct group-by the oracle runs."""
    o = _t(spark, sf_dir, "orders")
    key = F.when(F.col("o_orderkey") % 3 == 0, F.lit("HOT")) \
        .otherwise(F.concat(F.lit("k"), (F.col("o_orderkey") % 50).cast("string")))
    salted = o.select(key.alias("key"),
                      F.pmod(F.col("o_orderkey"), F.lit(8)).alias("salt"),
                      F.col("o_orderkey").alias("v"))
    partial = salted.groupBy("key", "salt").agg(
        F.sum("v").alias("psum"), F.count("*").alias("pn"))
    return partial.groupBy("key").agg(F.sum("psum").alias("total"),
                                      F.sum("pn").alias("n"))


Q_SALTED_AGG_SQL = """
SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'HOT'
            ELSE 'k' || CAST(o_orderkey % 50 AS VARCHAR) END AS key,
       CAST(SUM(o_orderkey) AS BIGINT) AS total, COUNT(*) AS n
FROM orders GROUP BY 1
"""


def _nation_rects(spark, sf_dir):
    """Shared synthetic 15°×15° PiP rectangles from nation keys.  The
    *53/*29 multipliers are embedded verbatim in Q_PIP_SQUARES_SQL —
    the one oracle all three q_pip_* physical plans share — so the
    derivation lives in exactly one place on the Spark side too."""
    return [(r.n_name,
             ((r.n_nationkey * 53) % 300) - 170.0,
             ((r.n_nationkey * 29) % 140) - 80.0,
             ((r.n_nationkey * 53) % 300) - 170.0 + 15.0,
             ((r.n_nationkey * 29) % 140) - 80.0 + 15.0)
            for r in _t(spark, sf_dir, "nation").collect()]


def q_pip_squares(spark, sf_dir):
    """J1 point-in-polygon join against caller polygons (synthetic
    squares from nation keys) — ray-cast on the Spark side, range
    predicates in the oracle."""
    pts = _points(spark, sf_dir)
    return pip_join_rects(pts, _nation_rects(spark, sf_dir)) \
        .select(F.col("id").alias("pid"), "cc")


Q_PIP_SQUARES_SQL = f"""
WITH pts AS ({_PTS_SQL}),
sq AS (SELECT n_name AS cc,
  ((n_nationkey * 53) % 300) - 170.0 AS xmin,
  ((n_nationkey * 29) % 140) - 80.0 AS ymin FROM nation)
SELECT p.id AS pid, COALESCE(MIN(s.cc), '') AS cc
FROM pts p LEFT JOIN sq s
  ON p.lon > s.xmin AND p.lon < s.xmin + 15.0
 AND p.lat > s.ymin AND p.lat < s.ymin + 15.0
GROUP BY p.id
"""



def q_pip_cover(spark, sf_dir):
    """J1 via the cover equi-join strategy (interior cells = pure
    broadcast hash join, boundary cells = targeted ray-cast) — same
    semantics and ORACLE as q_pip_squares, different physical plan."""
    from .operators.spatial import pip_join_via_cover
    pts = _points(spark, sf_dir)
    return pip_join_via_cover(pts, _nation_rects(spark, sf_dir),
                              res=8).select("pid", "cc")


def q_pip_hexcover(spark, sf_dir):
    """J1 via the HEX cover equi-join — third physical plan for the
    same PiP semantics and oracle (hex covers have no corner
    over-reach, shrinking the ray-cast boundary fraction); exactness
    is cover-soundness + targeted refinement, identical to the quad
    path."""
    from .operators.spatial import pip_join_via_cover
    pts = _points(spark, sf_dir)
    return pip_join_via_cover(pts, _nation_rects(spark, sf_dir), res=7,
                              cell_family="hex").select("pid", "cc")


def q_knn_geo(spark, sf_dir):
    """J5/W5: kNN via cell k-ring expansion + exact refine (the scale
    path), checked against a brute-force SQL oracle."""
    pts = _points(spark, sf_dir)
    q = pts.filter(F.col("id") % 29 == 0)
    return knn_cells(q, pts, 5, res=5, qid_col="id", iid_col="id") \
        .select("qid", "iid", "rank")


Q_KNN_GEO_SQL = f"""
WITH pts AS ({_PTS_SQL}),
q AS (SELECT * FROM pts WHERE id % 29 = 0),
pairs AS (SELECT q.id AS qid, i.id AS iid,
  (q.lon - i.lon) * (q.lon - i.lon) + (q.lat - i.lat) * (q.lat - i.lat) AS dist2
  FROM q CROSS JOIN pts i),
r AS (SELECT qid, iid,
  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2 ASC, iid ASC) AS rank
  FROM pairs)
SELECT qid, iid, rank FROM r WHERE rank <= 5
"""


def q_tile_assign(spark, sf_dir):
    """J6: raster tile assignment via z-order bit interleave."""
    pts = _points(spark, sf_dir)
    from .spatial.cellexpr import tile_expr
    tiled = pts.withColumn("tile_id", tile_expr(F.col("lon"), F.col("lat"), 8, 16))
    return tiled.groupBy("tile_id").agg(F.count("*").alias("n"))


Q_TILE_ASSIGN_SQL = f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 65536) AS BIGINT), 0), 65535) AS tx,
  LEAST(GREATEST(CAST(floor((90.0 - lat) / 180.0 * 65536) AS BIGINT), 0), 65535) AS ty
  FROM pts),
{_spread_sql('g', 'tx', 'ty')}
SELECT ((8::BIGINT << 58) | (morton >> 16)) AS tile_id, COUNT(*) AS n
FROM s5 GROUP BY 1
"""


def q_cell_histogram(spark, sf_dir):
    """A4: per-cell histogram (skew detection input)."""
    pts = _points(spark, sf_dir)
    return cell_histogram(assign_cells(pts, res=6)) \
        .select("cell_id", "n_rows")


Q_CELL_HISTOGRAM_SQL = f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 128) AS BIGINT), 0), 127) AS tx,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS ty
  FROM pts),
{_spread_sql('g', 'tx', 'ty')}
SELECT ((6::BIGINT << 58) | morton) AS cell_id, COUNT(*) AS n_rows
FROM s5 GROUP BY 1
"""


def q_cell_density(spark, sf_dir):
    """k-ring smoothed per-cell density (the skew/salting heat input):
    convolution runs on the histogram, not the rows — scatter each
    occupied cell's count to its ring (lon wraps, lat drops; exact
    k_ring semantics) and sum per receiving cell.  Oracle re-derives
    the same scatter with a generate_series offset cross join and the
    shared morton spread chain."""
    from .operators.spatial import cell_density
    pts = _points(spark, sf_dir)
    return cell_density(pts, res=6, k=2).select("cell_id", "density")


Q_CELL_DENSITY_SQL = f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 128) AS BIGINT), 0), 127) AS px,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS py
  FROM pts),
h AS (SELECT px, py, COUNT(*) AS n FROM g GROUP BY 1, 2),
nb AS (
  SELECT ((h.px + dx.v + 128) % 128) AS tx, h.py + dy.v AS ty, h.n
  FROM h,
       (SELECT unnest(generate_series(-2, 2)) AS v) dx,
       (SELECT unnest(generate_series(-2, 2)) AS v) dy
  WHERE h.py + dy.v BETWEEN 0 AND 63),
a AS (SELECT tx, ty, CAST(SUM(n) AS BIGINT) AS density FROM nb GROUP BY 1, 2),
{_spread_sql('a', 'tx', 'ty')}
SELECT ((6::BIGINT << 58) | morton) AS cell_id, density FROM s5
"""


def q_exact_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionAll(d.filter(F.col("doc_id") < 5))
    return exact_dedup(doubled, "doc_id", "text")


Q_EXACT_DEDUP_SQL = rf"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id < 5),
k AS (SELECT doc_id, md5({_NORM_SQL}) AS dup_key FROM all_docs)
SELECT dup_key, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
FROM k GROUP BY dup_key HAVING COUNT(*) > 1
"""


def q_minhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return minhash_signature(d, "doc_id", "text", n=5, bands=4)


Q_MINHASH_SQL = rf"""
WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
ix AS (SELECT doc_id, t,
  unnest(generate_series(1, GREATEST(length(t) - 4, 1))) AS i FROM norm),
sh AS (SELECT doc_id, substr(t, CAST(i AS INTEGER), 5) AS sg FROM ix),
b AS (SELECT unnest([0, 1, 2, 3]) AS band)
SELECT doc_id, band, MIN(md5(band::VARCHAR || '|' || sg)) AS minhash
FROM sh CROSS JOIN b GROUP BY doc_id, band
"""


def q_levenshtein_pairs(spark, sf_dir):
    """F11/A1: Levenshtein-threshold pair dedup (char-based built-in;
    the byte-based reference parity shim is golden-tested separately)."""
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("nm"))
    a, b = n.alias("a"), n.alias("b")
    return (a.join(b, F.col("a.k") < F.col("b.k"))
            .withColumn("dist", F.levenshtein(F.col("a.nm"), F.col("b.nm")))
            .filter(F.col("dist") <= 5)
            .select(F.col("a.k").alias("a_id"), F.col("b.k").alias("b_id"),
                    "dist"))


Q_LEVENSHTEIN_SQL = """
SELECT a.n_nationkey AS a_id, b.n_nationkey AS b_id,
       levenshtein(a.n_name, b.n_name) AS dist
FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 5
"""


def q_cosine_knn(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 20 == 0) \
        .select(F.col("vec_id").alias("qid"), "embedding")
    items = e.select(F.col("vec_id").alias("iid"), "embedding")
    return cosine_topk(q, items, 3).select("qid", "iid", "rank")


Q_COSINE_KNN_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 20 = 0),
r AS (SELECT q.qid, i.vec_id AS iid,
  ROW_NUMBER() OVER (PARTITION BY q.qid
    ORDER BY list_cosine_similarity(q.embedding, i.embedding) DESC,
             i.vec_id ASC) AS rank
  FROM q CROSS JOIN embeddings i)
SELECT qid, iid, rank FROM r WHERE rank <= 3
"""


def q_agg_pricing(spark, sf_dir):
    """A-class aggregations (TPC-H Q1 shape) with exact decimal sums."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_base"),
                 F.sum(F.col("l_discount").cast("decimal(18,4)"))
                 .cast("double").alias("sum_disc"),
                 F.count("*").alias("count_order")))


Q_AGG_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_topk_orders(spark, sf_dir):
    """W5 window top-k per group."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority") \
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (o.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank"))


Q_TOPK_ORDERS_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders) WHERE rank <= 3
"""


def q_dim_rollup(spark, sf_dir):
    """J2-style broadcast dimension joins + rollup."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return joined.groupBy("r_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("revenue"),
        F.count("*").alias("n_orders"))


Q_DIM_ROLLUP_SQL = """
SELECT r_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_antijoin_resume(spark, sf_dir):
    """E4 snapshot-resume anti-join semantics."""
    o = _t(spark, sf_dir, "orders")
    committed = o.filter(F.col("o_orderkey") % 10 < 3).select("o_orderkey")
    return (o.join(committed, "o_orderkey", "left_anti")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_pending")))


Q_ANTIJOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_pending
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM orders c
                  WHERE c.o_orderkey = o.o_orderkey AND c.o_orderkey % 10 < 3)
GROUP BY o_orderpriority
"""


def q_window_events(spark, sf_dir):
    """Streaming-shaped tumbling window (batch equivalence)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("hour_start"), "event_type", "n"))


Q_WINDOW_EVENTS_SQL = """
SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_abbrev_de(spark, sf_dir):
    """F3 german abbreviation: position guards (>2), title prefixes,
    and the position-1 quirk (Platzhirschweg untouched)."""
    n = _t(spark, sf_dir, "nation")
    longname = (F.when(F.col("n_nationkey") % 4 == 0,
                       F.concat(F.col("n_name"), F.lit("straße")))
                .when(F.col("n_nationkey") % 4 == 1,
                      F.concat(F.lit("Professor-"), F.col("n_name"),
                               F.lit("-Platz")))
                .when(F.col("n_nationkey") % 4 == 2, F.lit("Platzhirschweg"))
                .otherwise(F.concat(F.col("n_name"), F.lit(" Gasse"))))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_street_abbrev(longname, F.lit("de")).alias("abbrev"))


Q_ABBREV_DE_SQL = """
SELECT n_nationkey AS id,
  CASE n_nationkey % 4
    WHEN 0 THEN n_name || 'str.'
    WHEN 1 THEN 'Prof.-' || n_name || '-Pl.'
    WHEN 2 THEN 'Platzhirschweg'
    ELSE n_name || ' G.' END AS abbrev
FROM nation
"""


def q_abbrev_en(spark, sf_dir):
    """F4 english abbreviation: first-match suffix ladder + the
    string-initial Avenue exclusion."""
    n = _t(spark, sf_dir, "nation")
    longname = (F.when(F.col("n_nationkey") % 5 == 0,
                       F.concat(F.col("n_name"), F.lit(" Street")))
                .when(F.col("n_nationkey") % 5 == 1,
                      F.concat(F.col("n_name"), F.lit(" Avenue")))
                .when(F.col("n_nationkey") % 5 == 2,
                      F.concat(F.lit("Avenue "), F.col("n_name")))
                .when(F.col("n_nationkey") % 5 == 3,
                      F.concat(F.col("n_name"), F.lit(" Boulevard")))
                .otherwise(F.concat(F.col("n_name"), F.lit(" Parkway"))))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_street_abbrev(longname, F.lit("en")).alias("abbrev"))


Q_ABBREV_EN_SQL = """
SELECT n_nationkey AS id,
  CASE n_nationkey % 5
    WHEN 0 THEN n_name || ' St.'
    WHEN 1 THEN n_name || ' Ave.'
    WHEN 2 THEN 'Avenue ' || n_name
    WHEN 3 THEN n_name || ' Blvd.'
    ELSE n_name || ' Pkwy.' END AS abbrev
FROM nation
"""


def q_abbrev_fr(spark, sf_dir):
    """F5 french abbreviation: string-initial-only anchored ladder."""
    n = _t(spark, sf_dir, "nation")
    longname = (F.when(F.col("n_nationkey") % 4 == 0,
                       F.concat(F.lit("Avenue "), F.col("n_name")))
                .when(F.col("n_nationkey") % 4 == 1,
                      F.concat(F.lit("Boulevard "), F.col("n_name")))
                .when(F.col("n_nationkey") % 4 == 2,
                      F.concat(F.col("n_name"), F.lit(" Avenue")))
                .otherwise(F.concat(F.lit("Impasse "), F.col("n_name"))))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_street_abbrev(longname, F.lit("fr")).alias("abbrev"))


Q_ABBREV_FR_SQL = """
SELECT n_nationkey AS id,
  CASE n_nationkey % 4
    WHEN 0 THEN 'Av. ' || n_name
    WHEN 1 THEN 'Bd ' || n_name
    WHEN 2 THEN n_name || ' Avenue'
    ELSE 'Imp. ' || n_name END AS abbrev
FROM nation
"""


def q_country_name(spark, sf_dir):
    """C5 get_country_name: official-language candidates (BE: nl,fr,de)
    with byte-Levenshtein≤1 dedup — 'Belgien-*' collapses into
    'Belgie-*' on even keys, 'Deutsch-*' survives on odd keys.
    Exploded to (id, pos, cname) rows for portable hashing."""
    n = _t(spark, sf_dir, "nation")
    tags = F.create_map(
        F.lit("ISO3166-1:alpha2"), F.lit("BE"),
        F.lit("name:en"), F.concat(F.lit("Belgium-"), F.col("n_name")),
        F.lit("name:nl"), F.concat(F.lit("Belgie-"), F.col("n_name")),
        F.lit("name:fr"), F.concat(F.lit("Belgique-"), F.col("n_name")),
        F.lit("name:de"),
        F.when(F.col("n_nationkey") % 2 == 0,
               F.concat(F.lit("Belgien-"), F.col("n_name")))
        .otherwise(F.concat(F.lit("Deutsch-"), F.col("n_name"))))
    arr = udf_country_name(tags, F.lit("en"), F.lit(False))
    return (n.select(F.col("n_nationkey").alias("id"),
                     F.posexplode(arr).alias("pos", "cname")))


Q_COUNTRY_NAME_SQL = """
WITH base AS (SELECT n_nationkey AS id, n_name FROM nation),
names AS (
  SELECT id, 0 AS pos, 'Belgium-' || n_name AS cname FROM base
  UNION ALL SELECT id, 1, 'Belgie-' || n_name FROM base
  UNION ALL SELECT id, 2, 'Belgique-' || n_name FROM base
  UNION ALL SELECT id, 3, 'Deutsch-' || n_name FROM base WHERE id % 2 = 1)
SELECT id, ROW_NUMBER() OVER (PARTITION BY id ORDER BY pos) - 1 AS pos, cname
FROM names
"""


def q_placename_bilingual(spark, sf_dir):
    """C2/C3b/C4 combined-name heuristic with an exact oracle: the
    localized tag is found inside the generic name at a boundary, the
    name:it variant is extracted by position, and the pair is formatted
    with U+202A/U+202C LTR embedding marks."""
    n = _t(spark, sf_dir, "nation")
    tags = F.create_map(
        F.lit("name:de"), F.concat(F.lit("Ober"), F.col("n_name")),
        F.lit("name:it"), F.concat(F.lit("Bassa"), F.col("n_name")),
        F.lit("name"), F.concat(F.lit("Bassa"), F.col("n_name"),
                                F.lit(" / Ober"), F.col("n_name")))
    out = udf_placename(
        F.col("n_nationkey").cast("string"), F.to_json(tags), F.lit("de"),
        F.lit(False), F.lit("\n"), F.lit(None).cast("double"),
        F.lit(None).cast("double"))
    return n.select(F.col("n_nationkey").alias("id"),
                    out.alias("combined"))


Q_PLACENAME_BILINGUAL_SQL = """
SELECT n_nationkey AS id,
  chr(8234) || 'Ober' || n_name || chr(10) || 'Bassa' || n_name || chr(8236)
    AS combined
FROM nation
"""


def q_snapshot_compact(spark, sf_dir):
    """Snapshot compaction through the gate: three epoch commits of
    disjoint nation slices rewrite into ONE compacted snapshot; the
    table read AFTER compaction must carry exactly the source rows
    (full value oracle — the rewrite is lossless) and the in-query
    ``n_files`` invariant proves the replaced-snapshot bookkeeping
    routed the reader to the single compacted file."""
    import os
    import tempfile
    import uuid

    from .engine.snapshots import SnapshotStore
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name",
                                           "n_regionkey")
    root = os.path.join(tempfile.gettempdir(),
                        "osml10n_gate_compact_" + uuid.uuid4().hex[:12])
    store = SnapshotStore(root)
    for i in range(3):
        store.commit(n.filter(F.col("n_nationkey") % 3 == i), [i],
                     metrics={"epoch": i})
    cm = store.compact(spark)
    out = store.committed_output(spark)
    return out.select("n_nationkey", "n_name", "n_regionkey",
                      F.lit(len(out.inputFiles())).alias("n_files"),
                      F.lit(cm is not None).alias("compacted"))


Q_SNAPSHOT_COMPACT_SQL = """
SELECT n_nationkey, n_name, n_regionkey, 1 AS n_files, TRUE AS compacted
FROM nation
"""


def q_combined_quirks(spark, sf_dir):
    """F21 Lua-pattern escaping quirks with a CASE-literal oracle: the
    reference's crude metachar substitutions before the in-name search
    (get_localized_name_from_tags.lua:144 — %W properly %%-escaped for
    the LOCAL tag; :185-186 — '.'→'::' and '[]()%+*?^$'→'@' for the
    ADDITIONAL tags, deliberately breaking the match) decide which
    branch each constructed row takes:
      0 hyphen in LOCAL name  → properly escaped, found → combined pair
      1 dot in additional tag → '::' mangles the search → tag dropped
      2 brackets in add. tag  → '@' mangles the search → tag dropped
      3 slash-separated pair  → both found → positional combined pair
      4 clean pair            → classic Bolzano/Bozen positional order"""
    n = _t(spark, sf_dir, "nation")
    m = F.col("n_nationkey") % 5
    tags = (
        F.when(m == 0, F.create_map(
            F.lit("name"), F.lit("Porto-Novo - Hogbonu"),
            F.lit("name:de"), F.lit("Porto-Novo"),
            F.lit("name:yo"), F.lit("Hogbonu")))
        .when(m == 1, F.create_map(
            F.lit("name"), F.lit("St. Anton - Sankt Anton"),
            F.lit("name:de"), F.lit("Sankt Anton"),
            F.lit("name:it"), F.lit("St. Anton")))
        .when(m == 2, F.create_map(
            F.lit("name"), F.lit("Plaza [M] - Platz M"),
            F.lit("name:de"), F.lit("Platz M"),
            F.lit("name:es"), F.lit("Plaza [M]")))
        .when(m == 3, F.create_map(
            F.lit("name"), F.lit("Biel/Bienne"),
            F.lit("name:de"), F.lit("Biel"),
            F.lit("name:fr"), F.lit("Bienne")))
        .otherwise(F.create_map(
            F.lit("name"), F.lit("Bolzano - Bozen"),
            F.lit("name:de"), F.lit("Bozen"),
            F.lit("name:it"), F.lit("Bolzano"))))
    out = udf_placename(
        F.col("n_nationkey").cast("string"), F.to_json(tags), F.lit("de"),
        F.lit(False), F.lit("\n"), F.lit(None).cast("double"),
        F.lit(None).cast("double"))
    return n.select(F.col("n_nationkey").alias("id"),
                    out.alias("combined"))


Q_COMBINED_QUIRKS_SQL = """
SELECT n_nationkey AS id, CASE n_nationkey % 5
  WHEN 0 THEN chr(8234) || 'Porto-Novo' || chr(10) || 'Hogbonu' || chr(8236)
  WHEN 1 THEN 'Sankt Anton'
  WHEN 2 THEN 'Platz M'
  WHEN 3 THEN chr(8234) || 'Biel' || chr(10) || 'Bienne' || chr(8236)
  ELSE chr(8234) || 'Bozen' || chr(10) || 'Bolzano' || chr(8236)
  END AS combined
FROM nation
"""


def q_localize_latin(spark, sf_dir):
    """Flagship pipeline with a full oracle on the latin subset:
    latin-caption rows pass the cascade unchanged, and cell/tile ids are
    pure morton bit-math — end-to-end plumbing verified value-exact."""
    from .engine.localize import localize
    d = _t(spark, sf_dir, "documents") \
        .filter(~F.substring(F.col("text"), 1, 48).rlike(RE_NON_LATIN_SPARK))
    staged = d.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("image_id"),
        F.substring(F.col("text"), 1, 48).alias("caption"),
        F.create_map(F.lit("name"), F.substring(F.col("text"), 1, 48)).alias("tags"),
        (((F.col("doc_id") * 37) % 360) - 180 + 0.5).alias("lon"),
        (((F.col("doc_id") * 7) % 160) - 80 + 0.5).alias("lat"))
    return localize(staged, "de").select("image_id", "caption_l10n",
                                         "cell_id", "tile_id")


Q_LOCALIZE_LATIN_SQL = f"""
WITH d AS (SELECT doc_id, substr(text, 1, 48) AS cap FROM documents
           WHERE NOT regexp_matches(substr(text, 1, 48), '{RE_NON_LATIN_DUCK}')),
p AS (SELECT doc_id, cap,
  ((doc_id * 37) % 360) - 180 + 0.5 AS lon,
  ((doc_id * 7) % 160) - 80 + 0.5 AS lat FROM d),
gc AS (SELECT doc_id, cap, lon, lat,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 1024) AS BIGINT), 0), 1023) AS cx,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 512) AS BIGINT), 0), 511) AS cy
  FROM p),
{_spread_sql('gc', 'cx', 'cy')},
cells AS (SELECT doc_id, cap, lon, lat,
  ((9::BIGINT << 58) | morton) AS cell_id FROM s5),
gt AS (SELECT doc_id, cap, cell_id,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 65536) AS BIGINT), 0), 65535) AS cx,
  LEAST(GREATEST(CAST(floor((90.0 - lat) / 180.0 * 65536) AS BIGINT), 0), 65535) AS cy
  FROM cells),
{_spread_sql('gt', 'cx', 'cy').replace('s1 AS', 't1 AS').replace('s2 AS', 't2 AS')
    .replace('s3 AS', 't3 AS').replace('s4 AS', 't4 AS').replace('s5 AS', 't5 AS')
    .replace('FROM s1', 'FROM t1').replace('FROM s2', 'FROM t2')
    .replace('FROM s3', 'FROM t3').replace('FROM s4', 'FROM t4')}
SELECT 'doc_' || doc_id AS image_id, cap AS caption_l10n, cell_id,
  ((8::BIGINT << 58) | (morton >> 16)) AS tile_id
FROM t5
"""


def q_payload_audit(spark, sf_dir):
    """input_hint integrity invariant as a driver-visible query: decode
    every synthesized payload, recompute phash, assert-match against
    the stored value (lossless fmts) / decode-viability (jpegq).  All
    rows must come back ok=true; PSNR≥40dB is separately pytest-gated.
    ``ok_frac`` is the in-query self-check (expected 1.0 on every row)
    so the gate record carries the invariant VALUE, not just a count
    (whole-frame window: fine at gate scale, 300 rows).  Every 4th row
    is re-containered as REAL PNG (zlib/CRC/filter codec) — its ok
    flag demands decoded-phash equality like any lossless format — and
    every 5th as REAL baseline JPEG (jpegcodec.py DCT+Huffman; lossy,
    so its ok flag is decode viability like jpegq) — both spec codecs
    value-audited in-gate, not just pytest-gated.
    FULL replay-literal oracle: DuckDB re-derives ok from
    independently-replayed (stored phash, decoded phash) literal pairs
    — the ok logic itself runs in SQL, not just an echo."""
    from .operators.multimodal import verify_payload
    from .sources.datagen import generate_images
    imgs = generate_images(spark, 300, seed=7, png_every=4, jpeg_every=5)
    w = Window.partitionBy(F.lit(1))
    return verify_payload(imgs).select(
        "image_id", "fmt", "ok",
        F.round(F.avg(F.col("ok").cast("double")).over(w), 4)
        .alias("ok_frac"))


def q_asof_join(spark, sf_dir):
    """As-of (point-in-time) join: for every click event, the newest
    error event at-or-before it for the same user — single-shuffle
    union+carry-forward-window formulation, proven against DuckDB's
    native ASOF JOIN."""
    from .operators.temporal import asof_join
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    errors = e.filter(F.col("event_type") == "error") \
        .select("user_id", "ts", "value")
    return asof_join(clicks, errors, "user_id", "ts", ["value"]) \
        .select("event_id", "user_id", "asof_ts", "asof_value")


Q_ASOF_JOIN_SQL = """
SELECT c.event_id, c.user_id, e.ts AS asof_ts, e.value AS asof_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id AND c.ts >= e.ts
"""


def q_interval_join(spark, sf_dir):
    """Interval overlap self-join: all pairs of events by the same
    user whose [start, start + 600 + id%1800 s] activity windows
    overlap — bucketed-blocking equi-join with exactly-once bucket
    ownership (operators/temporal.py:interval_join), proven against
    DuckDB's native range join.  All values are integer epoch-second
    arithmetic; Spark's unix_timestamp truncates toward zero while
    DuckDB's floor(epoch()) floors, which agree exactly for the
    POSITIVE epochs this table carries (all events are 2024) — the
    derivation is bit-identical here, but would diverge by 1s on
    pre-1970 fractional timestamps."""
    from .operators.temporal import interval_join
    iv = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"), "user_id",
        F.unix_timestamp("ts").alias("s"))
    iv = iv.withColumn(
        "e", F.col("s") + 600 + F.col("id") % 1800)
    pairs = interval_join(iv, iv, "user_id", "s", "e")
    return (pairs.filter(F.col("id") < F.col("id_r"))
            .select("user_id", F.col("id").alias("a_id"),
                    F.col("id_r").alias("b_id"),
                    (F.least("e", "e_r") - F.greatest("s", "s_r"))
                    .alias("overlap_s")))


Q_INTERVAL_JOIN_SQL = """
WITH iv AS (
  SELECT event_id AS id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 600 + (event_id % 1800) AS e
  FROM events)
SELECT a.user_id AS user_id, a.id AS a_id, b.id AS b_id,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_s
FROM iv a JOIN iv b
  ON a.user_id = b.user_id AND a.id < b.id
 AND a.s <= b.e AND b.s <= a.e
"""


def q_merge_intervals(spark, sf_dir):
    """Interval coalescing (gaps-and-islands, one shuffle): each
    user's overlapping activity windows fuse into maximal merged
    intervals with a source-row count — the same integer epoch-second
    derivation as q_interval_join, gap=120s so near-adjacent windows
    sessionize.  Oracle: the identical running-max/island-sum window
    chain in DuckDB (tie order on equal (s, e) is island-neutral, see
    merge_intervals docstring)."""
    from .operators.temporal import merge_intervals
    iv = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"), "user_id",
        F.unix_timestamp("ts").alias("s"))
    iv = iv.withColumn("e", F.col("s") + 600 + F.col("id") % 1800)
    return merge_intervals(iv, "user_id", "s", "e", gap=120) \
        .select("user_id", "m_start", "m_end", "n_merged")


Q_MERGE_INTERVALS_SQL = """
WITH iv AS (
  SELECT event_id AS id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 600 + (event_id % 1800) AS e
  FROM events),
m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS run_max
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN run_max IS NULL OR s > run_max + 120
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS g
  FROM m)
SELECT user_id, MIN(s) AS m_start, MAX(e) AS m_end,
       COUNT(*) AS n_merged
FROM isl GROUP BY user_id, g
"""


def q_radius_join(spark, sf_dir):
    """Distance-range spatial join (all pairs within 2°) via ring-1
    cell equi-join + exact refine — no cross join."""
    from .operators.spatial import radius_join
    pts = _points(spark, sf_dir)
    sample = pts.filter(F.col("id") % 17 == 0)
    # dist2 is exact-decimal on both sides but with engine-specific
    # precision/scale; hash over a DOUBLE (same nearest-double of the
    # same exact rational) so representation can't diverge
    return radius_join(sample, pts, 2.0, lid_col="id", rid_col="id") \
        .withColumn("dist2", F.col("dist2").cast("double"))


Q_RADIUS_JOIN_SQL = f"""
WITH pts AS ({_PTS_SQL}),
sample AS (SELECT * FROM pts WHERE id % 17 = 0)
SELECT s.id AS lid, p.id AS rid,
  CAST((s.lon - p.lon) * (s.lon - p.lon)
       + (s.lat - p.lat) * (s.lat - p.lat) AS DOUBLE) AS dist2
FROM sample s CROSS JOIN pts p
WHERE (s.lon - p.lon) * (s.lon - p.lon) + (s.lat - p.lat) * (s.lat - p.lat)
      <= 4.0
"""


def q_polygon_cover(spark, sf_dir):
    """Polygon covering index (J1 scale path / J6): sound cell cover of
    synthetic rectangles from nation keys at res 6 — for axis-aligned
    rects the cover is exactly the bbox cell window, its frame cells
    boundary and the rest interior, so SQL can re-derive it including
    the packed morton ids."""
    from .operators.spatial import polygon_cover_table
    from .spatial.geometry import pack_polygon
    polys = [pack_polygon(cc, [[(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                                (x0, y0)]])
             for cc, x0, y0, x1, y1 in _nation_rects(spark, sf_dir)]
    return polygon_cover_table(spark, polys, res=6)


Q_POLYGON_COVER_SQL = f"""
WITH sq AS (SELECT n_name AS cc,
  ((n_nationkey * 53) % 300) - 170.0 AS x0,
  ((n_nationkey * 29) % 140) - 80.0 AS y0 FROM nation),
fr AS (SELECT cc, x0, y0,
  CAST(floor((x0 + 180.0) / 360.0 * 128) AS BIGINT) AS fx0,
  CAST(floor((x0 + 15.0 + 180.0) / 360.0 * 128) AS BIGINT) AS fx1,
  CAST(floor((y0 + 90.0) / 180.0 * 64) AS BIGINT) AS fy0,
  CAST(floor((y0 + 15.0 + 90.0) / 180.0 * 64) AS BIGINT) AS fy1 FROM sq),
cells AS (SELECT cc, x0, y0, fx0, fx1, fy0, fy1,
  unnest(generate_series(fx0, fx1)) AS cx FROM fr),
g AS (SELECT cc, x0, y0, fx0, fx1, fy0, fy1, cx,
  unnest(generate_series(fy0, fy1)) AS cy FROM cells),
{_spread_sql('g', 'cx', 'cy')}
SELECT cc, ((6::BIGINT << 58) | morton) AS cell_id,
  CASE WHEN cx IN (fx0, fx1) OR cy IN (fy0, fy1)
       THEN 'boundary' ELSE 'interior' END AS kind
FROM s5
"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs with length-bucket blocking
    (the quadratic-bounding pattern); doubled corpus guarantees
    jaccard=1.0 pairs, natural near-dups surface below that."""
    from .operators.dedup import ngram_jaccard_pairs, normalize_text
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionAll(
        d.filter(F.col("doc_id") < 20)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    blk = F.floor(F.length(normalize_text(F.col("text"))) / 16)
    return ngram_jaccard_pairs(doubled, "doc_id", "text", n=3,
                               threshold=0.5, block_col=blk)


Q_NGRAM_JACCARD_SQL = rf"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20),
norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM all_docs),
blocked AS (SELECT doc_id, t, CAST(floor(length(t) / 16) AS BIGINT) AS blk
            FROM norm),
ix AS (SELECT doc_id, t, blk,
  unnest(generate_series(1, GREATEST(length(t) - 2, 1))) AS i FROM blocked),
sh AS (SELECT DISTINCT doc_id, blk, substr(t, CAST(i AS INTEGER), 3) AS sg
       FROM ix),
sizes AS (SELECT doc_id, blk, COUNT(*) AS n_sh FROM sh GROUP BY 1, 2),
inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_int
  FROM sh a JOIN sh b ON a.sg = b.sg AND a.blk = b.blk
                     AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.a_id, i.b_id,
  CAST(i.n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_int) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
WHERE CAST(i.n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_int) >= 0.5
"""


def q_embedding_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs over the FULL table (no limit) —
    sign-band blocked, so no all-pairs join; the oracle re-derives the
    exact band buckets (signs of stored floats — no FP arithmetic) and
    the cosine refine.  Planted exact duplicates (vec_id+100000, the
    text-dedup pattern) are provably recalled: identical vectors share
    every band.  Ids only (cosine FP accumulation order differs across
    engines, pair membership does not)."""
    from .operators.dedup import embedding_dups
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doubled = e.unionAll(
        e.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        .filter(F.col("vec_id") < 100040))
    # dim passed explicitly: zero driver jobs at plan-build (the probe
    # fallback is for ad-hoc use only; at scale callers know the dim)
    return embedding_dups(doubled, "vec_id", "embedding", threshold=0.9,
                          dim=64).select("a_id", "b_id")


_EMB_BANDS_SQL = " UNION ALL ".join(
    "SELECT vec_id, {j} AS band, {key} AS bkey FROM e".format(
        j=j, key=" + ".join(
            f"(CASE WHEN embedding[{j * 8 + i + 1}] >= 0 THEN {1 << i} "
            f"ELSE 0 END)" for i in range(8)))
    for j in range(8))

Q_EMBEDDING_DUPS_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings
  WHERE vec_id < 40),
banded AS ({_EMB_BANDS_SQL}),
cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
         FROM banded x JOIN banded y
           ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
SELECT c.a_id, c.b_id
FROM cand c
JOIN e a ON a.vec_id = c.a_id
JOIN e b ON b.vec_id = c.b_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
"""


def q_session_events(spark, sf_dir):
    """Streaming-grade session windows (30-min gap) per user, batch
    equivalence against a gaps-and-islands oracle."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"),
                      "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    "n_events"))


Q_SESSION_EVENTS_SQL = """
WITH o AS (SELECT user_id, ts,
  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
            >= INTERVAL 30 MINUTE
       THEN 1 ELSE 0 END AS brk
  FROM events),
g AS (SELECT user_id, ts,
  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS grp FROM o)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM g GROUP BY user_id, grp
"""



def q_streetname_bilingual(spark, sf_dir):
    """C3a street variant of the combined-name heuristic: per-tag
    language dispatch abbreviates the de side (straße→str.) while the
    it side passes through — formatted with ' - ' and LTR marks."""
    from .udfs import udf_streetname
    n = _t(spark, sf_dir, "nation")
    tags = F.create_map(
        F.lit("name:de"), F.concat(F.lit("Ober"), F.col("n_name"),
                                   F.lit("straße")),
        F.lit("name:it"), F.concat(F.lit("Bassa"), F.col("n_name"),
                                   F.lit("gasse")),
        F.lit("name"), F.concat(F.lit("Bassa"), F.col("n_name"),
                                F.lit("gasse / Ober"), F.col("n_name"),
                                F.lit("straße")))
    out = udf_streetname(
        F.col("n_nationkey").cast("string"), F.to_json(tags), F.lit("de"),
        F.lit(False), F.lit(" - "), F.lit(None).cast("double"),
        F.lit(None).cast("double"))
    return n.select(F.col("n_nationkey").alias("id"), out.alias("combined"))


Q_STREETNAME_BILINGUAL_SQL = """
SELECT n_nationkey AS id,
  chr(8234) || 'Ober' || n_name || 'str. - Bassa' || n_name || 'gasse'
    || chr(8236) AS combined
FROM nation
"""


def q_sql_registered(spark, sf_dir):
    """S6 SQL bridge: the reference's PL/Python stored function becomes
    spark.sql-registered UDFs (osml10n_*) — the whole query runs through
    the SQL surface, not the DataFrame API."""
    from .udfs import register_all
    register_all(spark)
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql("""
        SELECT n_nationkey AS id,
               osml10n_unaccent('Besançon-' || n_name) AS unaccented,
               osml10n_street_abbrev(n_name || ' Street', 'en') AS abbrev,
               osml10n_is_latin(n_name) AS latin
        FROM nation_v""")


Q_SQL_REGISTERED_SQL = """
SELECT n_nationkey AS id,
       strip_accents('Besançon-' || n_name) AS unaccented,
       n_name || ' St.' AS abbrev,
       TRUE AS latin
FROM nation
"""



def q_cell_rollup(spark, sf_dir):
    """Hierarchical cell rollup (hypertable-style multi-resolution
    aggregation): res-9 histogram rolled up to res-6 parents with pure
    JVM bit math (parent = res tag swap + morton >> 2*(9-6)) — no
    re-indexing of the points."""
    pts = _points(spark, sf_dir)
    fine = cell_histogram(assign_cells(pts, res=9))
    morton = F.col("cell_id").bitwiseAND(F.lit((1 << 58) - 1))
    parent = F.lit(6 << 58).bitwiseOR(F.shiftrightunsigned(morton, 6))
    return (fine.withColumn("parent_cell", parent)
            .groupBy("parent_cell")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.count("*").alias("n_child_cells")))


Q_CELL_ROLLUP_SQL = f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 1024) AS BIGINT), 0), 1023) AS tx,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 512) AS BIGINT), 0), 511) AS ty
  FROM pts),
{_spread_sql('g', 'tx', 'ty')},
fine AS (SELECT ((9::BIGINT << 58) | morton) AS cell_id, COUNT(*) AS n_rows
         FROM s5 GROUP BY 1)
SELECT ((6::BIGINT << 58) | ((cell_id & {(1 << 58) - 1}) >> 6)) AS parent_cell,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows, COUNT(*) AS n_child_cells
FROM fine GROUP BY 1
"""


# ------------------------------------------------------------ hex (H3-analog)
# SQL twin of spatial/hexindex.py: one floor(coord*1e6) per axis is the
# only FP step (bit-identical IEEE multiply in numpy/JVM/DuckDB); the
# band → zigzag-triangle → axial chain after it is pure BIGINT math, so
# the oracle reproduces the engine ids exactly.

_HEX_QUANT_SQL = ("CAST(floor(lon * 1000000.0) AS BIGINT) + 540000000 AS gx, "
                  "CAST(floor(lat * 1000000.0) AS BIGINT) + 450000000 AS gy")


def _hex_sql(src: str, xin: str, yin: str, res: int, p: str = "hx") -> str:
    """CTE chain assigning hex cell ids from offset-µdeg integer
    columns ``xin``/``yin`` of ``src``; final CTE ``{p}5`` exposes
    ``{p}_cell`` (and ``{p}_row``/``{p}_col`` for rollups)."""
    from .spatial.hexindex import hex_wu
    w, u = hex_wu(res)
    zz = f"({yin} + {u}) % {3 * u} >= {2 * u}"
    dy = f"(({yin} + {u}) % {3 * u}) - {2 * u}"
    return f"""
{p}1 AS (SELECT *, ({yin} + {u}) // {3 * u} AS {p}_band FROM {src}),
{p}2 AS (SELECT *, ({xin} - ({p}_band & 1) * {w} + {w}) % {2 * w} AS {p}_t FROM {p}1),
{p}3 AS (SELECT *, {p}_band + CASE WHEN {zz} AND NOT
    ({u} * {p}_t >= {w} * ({dy}) AND {u} * ({2 * w} - {p}_t) >= {w} * ({dy}))
  THEN 1 ELSE 0 END AS {p}_row FROM {p}2),
{p}4 AS (SELECT *, ({xin} - ({p}_row & 1) * {w} + {w}) // {2 * w} AS {p}_col FROM {p}3),
{p}5 AS (SELECT *, (({res}::BIGINT << 52)
  | (({p}_col - ({p}_row - ({p}_row & 1)) // 2) << 26) | {p}_row) AS {p}_cell
  FROM {p}4)"""


def q_hexcell_histogram(spark, sf_dir):
    """F24 hex half: per-hex-cell histogram (uniform-adjacency twin of
    q_cell_histogram) — assignment is a pure JVM int64 expression."""
    from .operators.spatial import assign_hexcells
    pts = _points(spark, sf_dir)
    return (assign_hexcells(pts, res=8)
            .groupBy("hexcell").agg(F.count("*").alias("n_rows")))


Q_HEXCELL_HISTOGRAM_SQL = f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id, {_HEX_QUANT_SQL} FROM pts),
{_hex_sql('g', 'gx', 'gy', 8)}
SELECT hx_cell AS hexcell, COUNT(*) AS n_rows FROM hx5 GROUP BY 1
"""


def q_hexcell_rollup(spark, sf_dir):
    """Hex multi-resolution rollup: res-9 histogram re-aggregated under
    res-7 parents (H3-parent semantics: the coarser cell containing the
    fine cell's exact integer center — replayed identically in SQL)."""
    from .operators.spatial import assign_hexcells
    from .spatial.cellexpr import hex_parent_expr
    pts = _points(spark, sf_dir)
    fine = (assign_hexcells(pts, res=9)
            .groupBy("hexcell").agg(F.count("*").alias("n_rows")))
    return (fine.withColumn("parent_cell",
                            hex_parent_expr(F.col("hexcell"), 9, 7))
            .groupBy("parent_cell")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.count("*").alias("n_child_cells")))


def _hex_rollup_sql() -> str:
    from .spatial.hexindex import hex_wu
    w9, u9 = hex_wu(9)
    return f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id, {_HEX_QUANT_SQL} FROM pts),
{_hex_sql('g', 'gx', 'gy', 9)},
fine AS (SELECT hx_cell, COUNT(*) AS n_rows FROM hx5 GROUP BY 1),
ctr AS (SELECT hx_cell, n_rows,
  {w9} * (2 * ((hx_cell >> 26) & {(1 << 26) - 1}) + (hx_cell & {(1 << 26) - 1})) AS cx,
  {3 * u9} * (hx_cell & {(1 << 26) - 1}) AS cy FROM fine),
{_hex_sql('ctr', 'cx', 'cy', 7, p='px')}
SELECT px_cell AS parent_cell, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       COUNT(*) AS n_child_cells
FROM px5 GROUP BY 1
"""


def q_hex_ring_join(spark, sf_dir):
    """Hex k-ring candidate join: points within axial distance 2 of
    each seed cell via a broadcast equi-join on driver-enumerated ring
    cells (3k(k+1)+1 per seed) — the hex twin of the quad k-ring
    candidate stage inside knn_cells.  The oracle recomputes membership
    through the independent axial distance formula
    (|dq|+|dr|+|dq+dr|)/2 ≤ k, so ring enumeration and adjacency
    semantics are value-pinned against each other."""
    from .operators.spatial import assign_hexcells, hex_ring_join
    pts = assign_hexcells(_points(spark, sf_dir), res=8)
    seeds = sorted({int(r[0]) for r in
                    pts.filter(F.col("id") % 97 == 0)
                    .select("hexcell").distinct().collect()})
    return hex_ring_join(pts, seeds, k=2)


Q_HEX_RING_JOIN_SQL = f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id, {_HEX_QUANT_SQL} FROM pts),
{_hex_sql('g', 'gx', 'gy', 8)},
cells AS (SELECT id, hx_cell FROM hx5),
seeds AS (SELECT DISTINCT hx_cell AS seed_cell FROM cells WHERE id % 97 = 0),
d AS (SELECT s.seed_cell,
  ((s.seed_cell >> 26) & {(1 << 26) - 1}) - ((c.hx_cell >> 26) & {(1 << 26) - 1}) AS dq,
  (s.seed_cell & {(1 << 26) - 1}) - (c.hx_cell & {(1 << 26) - 1}) AS dr
  FROM seeds s CROSS JOIN cells c)
SELECT seed_cell, COUNT(*) AS n_in_ring FROM d
WHERE abs(dq) + abs(dr) + abs(dq + dr) <= 4 GROUP BY 1
"""



def q_percentiles(spark, sf_dir):
    """Per-group exact distribution stats (median/p90 via SQL
    percentile; interpolation is bit-identical to DuckDB's
    quantile_cont) — the sketch-input shape for per-cell size/quality
    monitoring at scale."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.expr("percentile(o_totalprice, 0.5)").alias("med_price"),
                 F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
                 F.count("*").alias("n")))


Q_PERCENTILES_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS med_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
"""



def q_cube_revenue(spark, sf_dir):
    """Grouping-sets coverage (SURVEY §2.4 note): CUBE over
    priority × orderstatus with exact decimal revenue — Catalyst
    expands the grouping sets; DuckDB runs the identical CUBE."""
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderpriority", "o_orderstatus")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("revenue"),
                 F.count("*").alias("n")))


Q_CUBE_REVENUE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q_running_window(spark, sf_dir):
    """Window frames beyond top-k: per-user running event count and
    3-row moving value sum ordered by time (exact decimal arithmetic)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id", "user_id",
        F.count("*").over(run).alias("n_so_far"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(mov)
        .cast("double").alias("mov_sum"))


Q_RUNNING_WINDOW_SQL = """
SELECT event_id, user_id,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS n_so_far,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum
FROM events
"""



# ------------------------------------------------------------------
# q_micro_kernels: ONE gate query promoting the six golden-only
# micro-kernels (P7 gate, P8 langcode, A2 candidate count, W2 tag
# sort, F20 capitalize/strip, F22 centroid quirk) to dedicated oracle
# rows.  Case inputs are shared constants so the Spark query and the
# oracle SQL read one source of truth.
_MK_P8 = [(1, "name"), (2, "name:de"), (3, "name:zh-Hant"), (4, "a:b:c"),
          (5, "name:"), (6, ":::"), (7, "name:ja_rm")]
_MK_W2 = [(1, ["name:ja_rm", "name:zh", "name:ko-Latn", "name"]),
          (2, ["name:yue_rm", "name:abc_rm", "name:ab-Latn",
               "name:abcd_rm", "name:AB-Latn"]),
          (3, []), (4, ["name:de", "alt_name"])]
_MK_F20 = [(1, "  tokyo tower  "), (2, "mIxEd cAsE"), (3, "100 abc"),
           (4, ""), (5, "X")]
_MK_F22 = [(1, [0.0, 10.0, 10.0, 30.0]), (2, [2.5, 3.5, 4.5, 8.5]),
           (3, [1.0, 2.0]), (4, None)]
_MK_P7 = [(1, "Main Street", 139.7, 35.68), (2, "東京タワー", 139.7, 35.68),
          (3, "北京", 116.4, 39.9), (4, "สถานีรถไฟ", 0.0, 0.0),
          (5, "東京", 0.0, 0.0), (6, None, 10.0, 50.0)]
_MK_A2 = [
    (1, {"ISO3166-1:alpha2": "BE", "name:en": "Belgium",
         "name:nl": "Belgie", "name:fr": "Belgique",
         "name:de": "Belgien"}, "en", False),
    (2, {"ISO3166-1:alpha2": "BE", "name:en": "Belgien",
         "name:nl": "Belgie", "name:fr": "Belgique",
         "name:de": "Belgien"}, "en", False),
    (3, {"ISO3166-1:alpha2": "DE", "name:de": "Deutschland",
         "name:en": "Germany"}, "en", False),
    (4, {"ISO3166-1:alpha2": "CH", "name:en": "Switzerland",
         "name:de": "Schweiz", "name:fr": "Suisse",
         "name:it": "Svizzera", "name:rm": "Svizra"}, "en", True),
]


def q_micro_kernels(spark, sf_dir):
    """Composite oracle for the six micro-kernels that were previously
    golden-only (pytest-pinned inside composite queries, no dedicated
    gate row): P8 langcode extraction
    (get_localized_name_from_tags.lua:44-52 — note the 'name:' →
    'name' trailing-colon quirk), W2 deterministic romanization-tag
    sort (:181), F20 capitalize/strip (geo-transcript-srv.py:155-158,
    via kanji_transcript on single-token latin runs), F22 bbox
    centroid with degradation quirks (geo_transcript.lua:19-35 —
    short/NULL bboxes collapse to (0,0)), P7 the CJK/Thai
    filter-before-join gate (geo-transcript-srv.py:268-275), and A2
    the candidate count surviving get_country_name's Levenshtein dedup
    (get_country_name.lua:75).  Output is (kernel, case_id, result) —
    P8/W2/F20/F22 are re-derived INDEPENDENTLY in DuckDB SQL; P7 (PiP
    geometry) and A2 (country-language dim) replay the pure-python
    kernels driver-side at oracle build (the replay-literal pattern —
    transport/plan integrity; kernel math is pytest-pinned)."""
    from .udfs import (udf_capitalize_strip as u_capstrip,
                       udf_centroid_quirk10 as u_centroid,
                       udf_country_gated, udf_country_name,
                       udf_langcode_from_tag as u_langcode,
                       udf_sorted_rm_tags as u_rm_sort)

    k = F.lit
    p8 = spark.createDataFrame(_MK_P8, "case_id long, tag string").coalesce(1) \
        .select(k("P8").alias("kernel"), "case_id",
                u_langcode("tag").alias("result"))
    w2 = spark.createDataFrame(_MK_W2, "case_id long, tags array<string>").coalesce(1) \
        .select(k("W2").alias("kernel"), "case_id",
                u_rm_sort("tags").alias("result"))
    f20 = spark.createDataFrame(_MK_F20, "case_id long, s string").coalesce(1) \
        .select(k("F20").alias("kernel"), "case_id",
                u_capstrip("s").alias("result"))
    f22 = spark.createDataFrame(_MK_F22, "case_id long, bbox array<double>").coalesce(1) \
        .select(k("F22").alias("kernel"), "case_id",
                u_centroid("bbox").alias("result"))
    p7 = spark.createDataFrame(
        _MK_P7, "case_id long, name string, lon double, lat double").coalesce(1) \
        .select(k("P7").alias("kernel"), "case_id",
                udf_country_gated("name", "lon", "lat").alias("result"))
    a2 = spark.createDataFrame(
        _MK_A2,
        "case_id long, tags map<string,string>, target string, app boolean").coalesce(1) \
        .select(k("A2").alias("kernel"), "case_id",
                F.size(udf_country_name("tags", "target", "app"))
                .cast("string").alias("result"))
    return (p8.unionAll(w2).unionAll(f20).unionAll(f22).unionAll(p7)
            .unionAll(a2).orderBy("kernel", "case_id"))


def _micro_kernels_sql() -> str:
    """Oracle for q_micro_kernels: P8/W2/F20/F22 derived in DuckDB SQL
    from the shared case constants; P7/A2 probed from the pure-python
    kernels here (geometry / language-dim lookups have no SQL twin)."""
    import numpy as np

    from .kernels.names import get_country_name
    from .kernels.scripts import contains_cjk, contains_thai
    from .udfs import _prepared

    def sq(s):
        return "'" + s.replace("'", "''") + "'"

    p8_vals = ", ".join(f"({cid}, {sq(tag)})" for cid, tag in _MK_P8)
    w2_vals = ", ".join(
        "({}, {})".format(cid, "CAST([] AS VARCHAR[])" if not tags else
                          "[" + ", ".join(sq(t) for t in tags) + "]")
        for cid, tags in _MK_W2)
    f20_vals = ", ".join(f"({cid}, {sq(s)})" for cid, s in _MK_F20)
    f22_vals = ", ".join(
        "({}, {})".format(cid, "CAST(NULL AS DOUBLE[])" if bbox is None
                          else "[" + ", ".join(repr(v) for v in bbox) + "]")
        for cid, bbox in _MK_F22)
    prep = _prepared()
    p7_rows = []
    for cid, nm, lon, lat in _MK_P7:
        if nm is not None and contains_cjk(nm):
            cc = prep.lookup(np.array([lon]), np.array([lat]))[0]
        elif nm is not None and contains_thai(nm):
            cc = "th"
        else:
            cc = ""
        p7_rows.append(f"({cid}, {sq(cc or '')})")
    p7_vals = ", ".join(p7_rows)
    a2_vals = ", ".join(
        f"({cid}, {len(get_country_name(dict(tags), tg, ap))})"
        for cid, tags, tg, ap in _MK_A2)
    return f"""
WITH p8(case_id, tag) AS (VALUES {p8_vals}),
w2(case_id, tags) AS (VALUES {w2_vals}),
f20(case_id, s) AS (VALUES {f20_vals}),
f22(case_id, bbox) AS (VALUES {f22_vals}),
p7(case_id, cc) AS (VALUES {p7_vals}),
a2(case_id, n) AS (VALUES {a2_vals}),
u AS (
  SELECT 'P8' AS kernel, case_id,
    CASE WHEN strpos(tag, ':') = 0 THEN NULL
         ELSE list_filter(string_split(tag, ':'), x -> x <> '')[-1]
    END AS result FROM p8
  UNION ALL SELECT 'W2', case_id,
    COALESCE(array_to_string(list_sort(list_filter(tags, t ->
      regexp_matches(t, '^name:[a-z][a-z][a-z]?_rm$')
      OR regexp_matches(t, '^name:[a-z][a-z][a-z]?-Latn$'))), '|'), '')
    FROM w2
  UNION ALL SELECT 'F20', case_id,
    CASE WHEN trim(s) = '' THEN ''
         ELSE upper(substr(trim(s), 1, 1)) || lower(substr(trim(s), 2))
    END FROM f20
  UNION ALL SELECT 'F22', case_id,
    CASE WHEN bbox IS NULL OR len(bbox) < 4 THEN '0,0'
         ELSE CAST(CAST((bbox[1] + bbox[3]) / 2 * 10 AS BIGINT) AS VARCHAR)
              || ',' ||
              CAST(CAST((bbox[2] + bbox[4]) / 2 * 10 AS BIGINT) AS VARCHAR)
    END FROM f22
  UNION ALL SELECT 'P7', case_id, cc FROM p7
  UNION ALL SELECT 'A2', case_id, CAST(n AS VARCHAR) FROM a2)
SELECT kernel, CAST(case_id AS BIGINT) AS case_id, result
FROM u ORDER BY kernel, case_id
"""


def q_translit_cyrillic(spark, sf_dir):
    """F18 generic Any-Latin transliteration (ISO 9 Cyrillic) as an
    oracle-backed query: a fixed city corpus keyed by nation rows, the
    engine transliterates via its table-driven kernel, the oracle holds
    the golden romanizations."""
    from .udfs import udf_transliterate
    n = _t(spark, sf_dir, "nation")
    cities = ["Москва", "Санкт-Петербург", "Новосибирск", "Екатеринбург",
              "Нижний Новгород", "Казань", "Челябинск", "Омск"]
    src = F.element_at(F.array(*[F.lit(c) for c in cities]),
                       (F.col("n_nationkey") % 8 + 1).cast("int"))
    return n.select(F.col("n_nationkey").alias("id"),
                    udf_transliterate(src, F.lit("")).alias("romanized"))


Q_TRANSLIT_CYRILLIC_SQL = """
SELECT n_nationkey AS id,
  CASE n_nationkey % 8
    WHEN 0 THEN 'Moskva'
    WHEN 1 THEN 'Sankt-Peterburg'
    WHEN 2 THEN 'Novosibirsk'
    WHEN 3 THEN 'Ekaterinburg'
    WHEN 4 THEN 'Nižnij Novgorod'
    WHEN 5 THEN 'Kazanʹ'
    WHEN 6 THEN 'Čelâbinsk'
    ELSE 'Omsk' END AS romanized
FROM nation
"""


def q_localize_mixed(spark, sf_dir):
    """The flagship cascade C1/C2/C4 + transliteration F15/F18/F19 with
    a FULL value oracle: a constructed tag corpus exercises every
    cascade branch of get_localized_name_from_tags.lua:252-267 —
    target-tag hit, latin name, latin int_name, latin_langs probe,
    romanization tag, name:ja-Hira country transcript (C7 intended
    semantics), PiP-routed kanji transcript (real jp boundary), generic
    Cyrillic ISO-9, the Thai charset gate, and the PiP-routed
    cantonese/jyutping transcript (F17, 香港 at the real hk boundary,
    geo-transcript-srv.py:105-120,166-176) — and every expected output
    is a CASE literal (the q_translit_cyrillic technique)."""
    from .engine.localize import localize
    n = _t(spark, sf_dir, "nation")
    m = F.col("n_nationkey") % 10
    cyr = F.concat(F.lit("Кириллица "), F.col("n_name"))
    tags = (
        F.when(m == 0, F.create_map(
            F.lit("name:de"), F.concat(F.lit("Zielname "), F.col("n_name")),
            F.lit("name"), F.concat(F.lit("Zielname "), F.col("n_name"))))
        .when(m == 1, F.create_map(
            F.lit("name"), F.concat(F.lit("Plain "), F.col("n_name"))))
        .when(m == 2, F.create_map(
            F.lit("name"), cyr,
            F.lit("int_name"), F.concat(F.lit("Intl "), F.col("n_name"))))
        .when(m == 3, F.create_map(
            F.lit("name"), cyr,
            F.lit("name:en"), F.concat(F.lit("English "), F.col("n_name"))))
        .when(m == 4, F.create_map(
            F.lit("name"), cyr,
            F.lit("name:ko_rm"), F.concat(F.lit("Romaja "), F.col("n_name"))))
        .when(m == 5, F.create_map(
            F.lit("name"), F.lit("緑台中"),
            F.lit("name:ja-Hira"), F.lit("みどりだいなか")))
        .when(m == 6, F.create_map(F.lit("name"), F.lit("東京")))
        .when(m == 7, F.create_map(F.lit("name"), F.lit("Москва")))
        .when(m == 8, F.create_map(F.lit("name"), F.lit("ถนนข้าวสาร")))
        .otherwise(F.create_map(F.lit("name"), F.lit("香港"))))
    staged = n.select(
        F.col("n_nationkey").alias("image_id"), tags.alias("tags"),
        # branches 6 and 9 must resolve to real boundaries (PiP: jp and
        # hk); other branches never consult geometry (charset gates
        # short-circuit)
        F.when(m == 6, F.lit(139.15)).when(m == 9, F.lit(114.175))
        .otherwise(F.lit(0.5)).alias("lon"),
        F.when(m == 6, F.lit(36.425)).when(m == 9, F.lit(22.305))
        .otherwise(F.lit(0.5)).alias("lat"))
    return localize(staged, "de", add_cells=False) \
        .select(F.col("image_id").alias("id"), "caption_l10n")


Q_LOCALIZE_MIXED_SQL = """
WITH b AS (SELECT n_nationkey AS id, n_nationkey % 10 AS m, n_name FROM nation)
SELECT id, CASE m
  WHEN 0 THEN 'Zielname ' || n_name
  WHEN 1 THEN 'Plain ' || n_name
  WHEN 2 THEN chr(8234) || 'Intl ' || n_name || chr(10)
           || 'Кириллица ' || n_name || chr(8236)
  WHEN 3 THEN chr(8234) || 'English ' || n_name || chr(10)
           || 'Кириллица ' || n_name || chr(8236)
  WHEN 4 THEN chr(8234) || 'Romaja ' || n_name || chr(10)
           || 'Кириллица ' || n_name || chr(8236)
  WHEN 5 THEN chr(8234) || 'Midoridainaka' || chr(10) || '緑台中' || chr(8236)
  WHEN 6 THEN chr(8234) || 'Toukyou' || chr(10) || '東京' || chr(8236)
  WHEN 7 THEN chr(8234) || 'Moskva' || chr(10) || 'Москва' || chr(8236)
  WHEN 8 THEN chr(8234) || 'thanon khaosan' || chr(10) || 'ถนนข้าวสาร' || chr(8236)
  ELSE chr(8234) || 'hōeng góng' || chr(10) || '香港' || chr(8236)
  END AS caption_l10n
FROM b
"""


def _staged_documents(spark, sf_dir):
    """The documents table staged into the input-hint shape — shared by
    q_localize_documents (oracled) and flagship() (driver smoke), so
    both always measure the SAME pipeline."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("image_id"),
        F.substring(F.col("text"), 1, 48).alias("caption"),
        F.create_map(F.lit("name"), F.substring(F.col("text"), 1, 48)).alias("tags"),
        (((F.col("doc_id") * 37) % 360) - 180 + 0.5).alias("lon"),
        (((F.col("doc_id") * 7) % 160) - 80 + 0.5).alias("lat"))


def q_localize_documents(spark, sf_dir):
    """Full localization cascade over the documents corpus — now with a
    value-carrying oracle: latin rows assert the exact localized
    caption, every row asserts cascade non-emptiness (a non-latin name
    always yields either its transliterated pair or the original —
    format_combined_name never drops to ''), and cell/tile ids are
    exact morton math on both sides."""
    from .engine.localize import localize
    staged = _staged_documents(spark, sf_dir)
    is_lat = ~F.col("caption").rlike(RE_NON_LATIN_SPARK)
    return localize(staged, "de").select(
        "image_id",
        F.when(is_lat, F.col("caption_l10n")).alias("latin_cap"),
        (F.col("caption_l10n") != "").alias("nonempty"),
        "cell_id", "tile_id")


def q_localize_documents_fast(spark, sf_dir):
    """localize(fast_path=True) through the gate: the physical
    fast/slow split (filter + unionByName, engine/localize.py:67-74)
    over the MIXED documents corpus — latin no-target rows resolve
    entirely inside whole-stage codegen (the fast branch), non-latin
    rows cross Arrow once (the slow branch) — matched against the SAME
    oracle as q_localize_documents: one oracle, two physical plans
    (the q_pip_cover technique)."""
    from .engine.localize import localize
    staged = _staged_documents(spark, sf_dir)
    is_lat = ~F.col("caption").rlike(RE_NON_LATIN_SPARK)
    return localize(staged, "de", fast_path=True).select(
        "image_id",
        F.when(is_lat, F.col("caption_l10n")).alias("latin_cap"),
        (F.col("caption_l10n") != "").alias("nonempty"),
        "cell_id", "tile_id")


Q_LOCALIZE_DOCUMENTS_SQL = f"""
WITH d AS (SELECT doc_id, substr(text, 1, 48) AS cap FROM documents),
p AS (SELECT doc_id, cap,
  ((doc_id * 37) % 360) - 180 + 0.5 AS lon,
  ((doc_id * 7) % 160) - 80 + 0.5 AS lat FROM d),
gc AS (SELECT doc_id, cap, lon, lat,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 1024) AS BIGINT), 0), 1023) AS cx,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 512) AS BIGINT), 0), 511) AS cy
  FROM p),
{_spread_sql('gc', 'cx', 'cy')},
cells AS (SELECT doc_id, cap, lon, lat,
  ((9::BIGINT << 58) | morton) AS cell_id FROM s5),
gt AS (SELECT doc_id, cap, cell_id,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 65536) AS BIGINT), 0), 65535) AS cx,
  LEAST(GREATEST(CAST(floor((90.0 - lat) / 180.0 * 65536) AS BIGINT), 0), 65535) AS cy
  FROM cells),
{_spread_sql('gt', 'cx', 'cy').replace('s1 AS', 't1 AS').replace('s2 AS', 't2 AS')
    .replace('s3 AS', 't3 AS').replace('s4 AS', 't4 AS').replace('s5 AS', 't5 AS')
    .replace('FROM s1', 'FROM t1').replace('FROM s2', 'FROM t2')
    .replace('FROM s3', 'FROM t3').replace('FROM s4', 'FROM t4')}
SELECT 'doc_' || doc_id AS image_id,
  CASE WHEN NOT regexp_matches(cap, '{RE_NON_LATIN_DUCK}') THEN cap END
    AS latin_cap,
  cap <> '' AS nonempty,
  cell_id,
  ((8::BIGINT << 58) | (morton >> 16)) AS tile_id
FROM t5
"""


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs with a FULL DuckDB oracle: the md5-nibble
    token hash, the per-bit sign aggregation, the 16-bit pigeonhole
    banding and the hamming refine are all re-derived in SQL."""
    d = _t(spark, sf_dir, "documents")
    doubled = d.select("doc_id", "text").unionAll(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .filter(F.col("doc_id") < 100020))
    return simhash_dup_pairs(doubled, "doc_id", "text", max_hamming=3)


_SIMHASH_NIBS = ", ".join(
    f"strpos('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1 AS n{i}"
    for i in range(16))
_SIMHASH_BITS = ", ".join(
    f"SUM(CASE WHEN ((n{b // 4} >> {b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(64))
_SIMHASH_SUM = " + ".join(
    ["CASE WHEN b63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END"]
    + [f"CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END"
       for b in range(63)])

Q_SIMHASH_PAIRS_SQL = rf"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20),
norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM all_docs),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
hxs AS (SELECT doc_id, md5(tok) AS hx FROM toks),
nib AS (SELECT doc_id, {_SIMHASH_NIBS} FROM hxs),
bits AS (SELECT doc_id, {_SIMHASH_BITS} FROM nib GROUP BY doc_id),
sim AS (SELECT doc_id, {_SIMHASH_SUM} AS simhash FROM bits),
banded AS (SELECT doc_id, simhash, band,
                  (simhash >> (16 * band)) & 65535 AS bkey
           FROM sim CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
pairs AS (SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id,
                 a.simhash AS a_sim, b2.simhash AS b_sim
          FROM banded a JOIN banded b2
            ON a.band = b2.band AND a.bkey = b2.bkey
           AND a.doc_id < b2.doc_id)
SELECT a_id, b_id, CAST(bit_count(xor(a_sim, b_sim)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(a_sim, b_sim)) <= 3
"""


def q_minhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    doubled = d.select("doc_id", "text").unionAll(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .filter(F.col("doc_id") < 100020))
    return minhash_dup_pairs(doubled, "doc_id", "text",
                             jaccard_threshold=0.8)


Q_MINHASH_PAIRS_SQL = rf"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20),
norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM all_docs),
ix AS (SELECT doc_id, t,
  unnest(generate_series(1, GREATEST(length(t) - 4, 1))) AS i FROM norm),
sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INTEGER), 5) AS sg FROM ix),
b AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band),
sig AS (SELECT doc_id, band, MIN(md5(band::VARCHAR || '|' || sg)) AS mh
        FROM sh CROSS JOIN b GROUP BY doc_id, band),
cand AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id, COUNT(*) AS band_matches
         FROM sig a JOIN sig b2 ON a.band = b2.band AND a.mh = b2.mh
                               AND a.doc_id < b2.doc_id
         GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
-- candidates-only intersections (same rewrite as Q_CURATE_NEARDUP_SQL:
-- the final join discards non-candidate rows, and the unbounded
-- self-join is quadratic in hub shingles at sf0.1)
inter AS (SELECT c.a_id, c.b_id, COUNT(*) AS n_int
          FROM cand c
          JOIN sh s1 ON s1.doc_id = c.a_id
          JOIN sh s2 ON s2.doc_id = c.b_id AND s2.sg = s1.sg
          GROUP BY 1, 2)
SELECT c.a_id, c.b_id, c.band_matches,
       CAST(i.n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_int) AS jaccard
FROM cand c
JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
JOIN sizes sa ON sa.doc_id = c.a_id
JOIN sizes sb ON sb.doc_id = c.b_id
WHERE CAST(i.n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_int) >= 0.8
"""


def _ann_recall(ann: DataFrame, exact: DataFrame, k: int,
                per_query_floor: float, mean_floor: float) -> DataFrame:
    """Per-query ANN evidence in ORACLE-CHECKABLE form.  The ANN result
    itself is not SQL-derivable (FP hyperplanes / centroid probing),
    so the gate pins what IS derivable + what must INVARIANTLY hold:

    - ``exact_nn``: the exact nearest NON-SELF neighbor (rank 2 — rank
      1 is the query itself, queries being drawn from the item set),
      value-matched against the oracle's own exact-cosine window SQL;
    - ``recall_ok``: per-query recall ≥ ``per_query_floor`` against the
      Spark-exact top-k — oracle emits literal true, so ANY query
      falling under the floor hash-mismatches the gate;
    - ``mean_recall_ok``: corpus-mean recall ≥ ``mean_floor``, same
      mechanism.

    Both floors are invariants of the DETERMINISTIC (data, seed)
    pairing, not statistical hopes — measured with margin before being
    pinned (see the per-query docstrings)."""
    hits = (ann.select("qid", "iid")
            .join(exact.select("qid", "iid"), ["qid", "iid"])
            .groupBy("qid").agg(F.count("*").alias("hits")))
    nn = exact.filter(F.col("rank") == 2) \
        .select("qid", F.col("iid").alias("exact_nn"))
    per = (nn.join(hits, "qid", "left").fillna({"hits": 0})
           .withColumn("recall", F.col("hits") / float(k)))
    w = Window.partitionBy(F.lit(1))
    return (per.select(
        "qid", "exact_nn",
        (F.col("recall") >= per_query_floor).alias("recall_ok"),
        (F.avg("recall").over(w) >= mean_floor).alias("mean_recall_ok"))
        .orderBy("qid"))


def q_dup_components(spark, sf_dir):
    """Near-dup pairs → transitive CLUSTERS → survivor per cluster
    (dup_components): the pairs→keep-set completion a production corpus
    dedup ships.  The corpus is synthesized so duplicate CHAINS exist
    (A~B and B~C at hamming ≤3, but A≁C at hamming 6 — connected
    components must still merge all three): per base doc ``g`` < 60,
    1–3 member signatures share a repetition-coded group base (each
    group bit spread over 4 signature bits ⇒ inter-group hamming ≥4 >
    threshold, provably no cross-group pairs) plus chain patterns
    0b000000/0b000111/0b111111 in the low bits.  Pairs come from the
    banded-Hamming equi-join (hash_dup_pairs), components from the
    pointer-jumping min-label propagation; the oracle re-derives pairs
    by brute-force bit_count(xor) and closes them with a recursive CTE.
    Singleton nodes (no pair) come back as their own surviving
    component via the ``nodes=`` corpus id set."""
    from .operators.dedup import dup_components, hash_dup_pairs
    g = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("g")) \
        .filter(F.col("g") < 60)
    mem = (g.select("g", F.lit(0).alias("j"))
           .unionAll(g.filter(F.col("g") % 3 >= 1)
                     .select("g", F.lit(1).alias("j")))
           .unionAll(g.filter(F.col("g") % 3 == 2)
                     .select("g", F.lit(2).alias("j"))))
    base = F.lit(0).cast("long")
    for i in range(6):
        base = base + (F.shiftright(F.col("g"), i).bitwiseAND(F.lit(1))
                       .cast("long") * F.lit(15 * (1 << (8 + 4 * i))))
    pat = F.element_at(F.array(F.lit(0), F.lit(7), F.lit(63)),
                       F.col("j") + 1).cast("long")
    nodes = mem.select((F.col("g") * 10 + F.col("j")).alias("doc_id"),
                       (base + pat).alias("sig"))
    pairs = hash_dup_pairs(nodes, "doc_id", "sig", max_hamming=3)
    comps = dup_components(pairs, nodes=nodes.select("doc_id"))
    return comps.orderBy("doc_id")


Q_DUP_COMPONENTS_SQL = """
WITH RECURSIVE g AS (SELECT doc_id AS g FROM documents WHERE doc_id < 60),
mem AS (
  SELECT g, 0 AS j FROM g
  UNION ALL SELECT g, 1 FROM g WHERE g % 3 >= 1
  UNION ALL SELECT g, 2 FROM g WHERE g % 3 = 2),
nodes AS (
  SELECT g*10 + j AS doc_id,
    (((g >> 0) & 1) * 3840 + ((g >> 1) & 1) * 61440
     + ((g >> 2) & 1) * 983040 + ((g >> 3) & 1) * 15728640
     + ((g >> 4) & 1) * 251658240 + ((g >> 5) & 1) * 4026531840
     + CASE j WHEN 0 THEN 0 WHEN 1 THEN 7 ELSE 63 END)::BIGINT AS sig
  FROM mem),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM nodes a JOIN nodes b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION SELECT b_id, a_id FROM pairs),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
SELECT n.doc_id,
  LEAST(n.doc_id, COALESCE(MIN(r.d), n.doc_id)) AS component_id,
  n.doc_id = LEAST(n.doc_id, COALESCE(MIN(r.d), n.doc_id)) AS is_survivor
FROM nodes n LEFT JOIN reach r ON r.s = n.doc_id
GROUP BY n.doc_id
ORDER BY doc_id
"""


def q_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN, VALUE-ORACLED: the exact non-self
    nearest neighbor is cross-derived by DuckDB's own cosine window,
    and per-query/mean recall floors are pinned as boolean invariants
    (see _ann_recall).  Runs over the exact-decimal _clustered_vectors
    derivation (same input as q_ann_ivf): the raw embeddings table is
    clusterless, so its exact-NN ranking had near-ties where Spark's
    aggregate()-summed dot/(norm·norm) and DuckDB's
    list_cosine_similarity — different float derivations — could
    disagree at some future sf/seed; on the clustered vectors the
    rank-2 gap is STRUCTURAL (shared 4.0 components dominate), not
    rounding-dependent.  Floors measured on the fixed derivation at
    sf0.01: every query at recall 1.0 (the 16-dim cluster structure is
    exactly what hyperplane sketches preserve); pinned at 0.9 per-query
    and mean, leaving one-of-three headroom per query."""
    e = _t(spark, sf_dir, "embeddings")
    cl = _clustered_vectors(e)
    q = cl.filter(F.col("vec_id") % 50 == 0) \
        .select(F.col("vec_id").alias("qid"), "embedding")
    items = cl.select(F.col("vec_id").alias("iid"), "embedding")
    ann = lsh_topk(q, items, 3, dim=16, n_bits=4, n_tables=12)
    exact = cosine_topk(q, items, 3)
    return _ann_recall(ann, exact, 3, per_query_floor=0.9, mean_floor=0.9)


Q_ANN_LSH_SQL = """
WITH cl AS (SELECT vec_id,
  list_transform(range(0, 16), j ->
    CASE WHEN j = (vec_id % 8) * 2 OR j = (vec_id % 8) * 2 + 1
         THEN 4.0 ELSE 0.0 END
    + ((vec_id * 31 + j * 17) % 7) * 0.05) AS embedding
  FROM embeddings),
q AS (SELECT vec_id AS qid, embedding FROM cl WHERE vec_id % 50 = 0),
r AS (SELECT q.qid, i.vec_id AS iid,
  ROW_NUMBER() OVER (PARTITION BY q.qid
    ORDER BY list_cosine_similarity(q.embedding, i.embedding) DESC,
             i.vec_id ASC) AS rank
  FROM q CROSS JOIN cl i)
SELECT qid, iid AS exact_nn, true AS recall_ok, true AS mean_recall_ok
FROM r WHERE rank = 2 ORDER BY qid
"""


def _clustered_vectors(e: DataFrame) -> DataFrame:
    """Deterministic clustered embeddings derived from vec_id alone —
    SQL-expressible, so the IVF oracle re-derives the SAME vectors and
    the exact top-k over them: 8 clusters keyed vec_id % 8, two strong
    components (4.0 at 2c, 2c+1) over a 16-dim base of small arithmetic
    pseudo-noise ((vec_id·31 + j·17) mod 7)·0.05.  The raw synthetic
    embeddings table is clusterless (intra ≈ inter cosine), which
    bounds ANY cluster-probing index by its probe fraction — this
    derivation gives IVF real structure to find while keeping every
    value portable."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: F.when((j == (F.col("vec_id") % 8) * 2)
                         | (j == (F.col("vec_id") % 8) * 2 + 1),
                         F.lit(4.0)).otherwise(F.lit(0.0))
        + ((F.col("vec_id") * 31 + j * 17) % 7).cast("double") * F.lit(0.05))
    return e.select("vec_id", vec.alias("embedding"))


def q_ann_ivf(spark, sf_dir):
    """IVF-bucketed ANN (inverted lists on deterministic coarse
    centroids, nprobe cluster probing), VALUE-ORACLED over the
    _clustered_vectors derivation (the oracle recomputes the vectors
    AND the exact neighbors in SQL).  Floors measured on the fixed
    derivation: every query at recall 1.0 across n_centroids ∈ {8,16,
    24}, nprobe ∈ {3,4,6} → per-query floor 0.9 pinned with full
    margin; mean floor 0.9 likewise."""
    e = _t(spark, sf_dir, "embeddings")
    cl = _clustered_vectors(e)
    q = cl.filter(F.col("vec_id") % 50 == 0) \
        .select(F.col("vec_id").alias("qid"), "embedding")
    items = cl.select(F.col("vec_id").alias("iid"), "embedding")
    ann = ivf_topk(q, items, 3, n_centroids=16, nprobe=4)
    exact = cosine_topk(q, items, 3)
    return _ann_recall(ann, exact, 3, per_query_floor=0.9, mean_floor=0.9)


def q_ann_ivf_persist(spark, sf_dir):
    """Persistent IVF index (build → parquet inverted lists partitioned
    by centroid id → load → partition-pruned search): the on-disk path
    must return IDENTICAL neighbors to the one-shot ivf_topk (same
    deterministic centroid pick, assignment, refine), so it shares
    q_ann_ivf's oracle — DuckDB re-derives the _clustered_vectors AND
    the exact top-k, and the recall floors are value-pinned.  The
    load() leg additionally proves the round-trip through parquet
    (centroid literals + cid-partitioned lists) loses nothing."""
    import os
    import shutil
    import tempfile
    import uuid

    from .operators.similarity import IVFIndex
    e = _t(spark, sf_dir, "embeddings")
    cl = _clustered_vectors(e)
    q = cl.filter(F.col("vec_id") % 50 == 0) \
        .select(F.col("vec_id").alias("qid"), "embedding")
    items = cl.select(F.col("vec_id").alias("iid"), "embedding")
    path = os.path.join(tempfile.gettempdir(),
                        "osml10n_gate_ivfidx_" + uuid.uuid4().hex[:12])
    try:
        IVFIndex.build(items, path, n_centroids=16)
        idx = IVFIndex.load(spark, path)
        ann = idx.search(q, 3, nprobe=4)
        exact = cosine_topk(q, items, 3)
        out = _ann_recall(ann, exact, 3, per_query_floor=0.9,
                          mean_floor=0.9)
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


Q_ANN_IVF_SQL = """
WITH cl AS (SELECT vec_id,
  list_transform(range(0, 16), j ->
    CASE WHEN j = (vec_id % 8) * 2 OR j = (vec_id % 8) * 2 + 1
         THEN 4.0 ELSE 0.0 END
    + ((vec_id * 31 + j * 17) % 7) * 0.05) AS embedding
  FROM embeddings),
q AS (SELECT vec_id AS qid, embedding FROM cl WHERE vec_id % 50 = 0),
r AS (SELECT q.qid, i.vec_id AS iid,
  ROW_NUMBER() OVER (PARTITION BY q.qid
    ORDER BY list_cosine_similarity(q.embedding, i.embedding) DESC,
             i.vec_id ASC) AS rank
  FROM q CROSS JOIN cl i)
SELECT qid, iid AS exact_nn, true AS recall_ok, true AS mean_recall_ok
FROM r WHERE rank = 2 ORDER BY qid
"""


def q_image_resize(spark, sf_dir):
    """F23 multimodal resize: decode → pure-numpy bilinear → re-encode
    in the same format via mapInPandas; real-world codecs keep the
    declared stub path (ok=false).  FULL replay-literal oracle: the
    resized-pixel phash per row is recomputed driver-side by the same
    pure-python kernels (decode → bilinear → phash, no Spark) and
    dims_ok / ok_frac are re-derived in SQL over those literals.
    Exactness is additionally pytest-gated (constant/gradient PSNR
    invariants)."""
    from .operators.multimodal import resize_images
    from .sources.datagen import generate_images
    imgs = generate_images(spark, 300, seed=7)
    w = Window.partitionBy(F.lit(1))
    dims_ok = F.when(F.col("ok"),
                     (F.col("w") == 32) & (F.col("h") == 24)) \
        .otherwise(F.lit(True))
    return resize_images(imgs, 32, 24).select(
        "image_id", "fmt", "w", "h", "phash", "ok",
        dims_ok.alias("dims_ok"),
        F.round(F.avg(F.col("ok").cast("double")).over(w), 4)
        .alias("ok_frac"))


def q_frame_sample(spark, sf_dir):
    """F23 multimodal frame sampling: rawv container demux + every-k-th
    frame re-encoded standalone with its phash (deterministic synthetic
    videos; a real demuxer swaps into _split_frames without touching
    the plan).  FULL replay-literal oracle: per-frame phash literals
    are recomputed driver-side from the identical rng(13) frame pool
    (no Spark, no container round-trip — so the demux path is what the
    compare exercises); idx_ok / dims_ok / count_ok re-derived in
    SQL."""
    import numpy as np

    from .operators.multimodal import encode_rawv, sample_frames
    rng = np.random.default_rng(13)
    vids = [(f"vid_{i}", encode_rawv(
        rng.integers(0, 256, (6, 8, 8, 3), dtype=np.uint8)), "rawv")
        for i in range(20)]
    df = spark.createDataFrame(
        vids, "video_id string, bytes binary, fmt string")
    w = Window.partitionBy(F.lit(1))
    return sample_frames(df, every_k=2).select(
        "video_id", "frame_idx", "w", "h", "phash",
        (F.col("frame_idx") % 2 == 0).alias("idx_ok"),
        ((F.col("w") == 8) & (F.col("h") == 8)).alias("dims_ok"),
        (F.count(F.lit(1)).over(w) == 60).alias("count_ok"))


def q_write_tiled(spark, sf_dir):
    """S5 write path verified through the gate: sinks.write_tiled's
    directory-partitioned, z-order-clustered parquet layout is written
    and read BACK — cell_prefix comes from the DIRECTORY NAME on
    re-read, so matching the oracle proves every row landed in its
    correct coarse-cell partition; zorder_ok asserts (cell_id, tile_id)
    monotonicity within each written file (the clustering invariant
    that buys min-max row-group skipping at scale)."""
    import os
    import tempfile
    import uuid

    from .sources.sinks import write_tiled
    pts = _points(spark, sf_dir)
    # per-run unique dir: two concurrent gate runs against the same SF
    # dir must not overwrite each other's parquet mid-read, and stale
    # output must not leak across runs (ADVICE r2)
    path = os.path.join(
        tempfile.gettempdir(),
        "osml10n_gate_write_%s_%s" % (
            os.path.basename(sf_dir.rstrip("/")), uuid.uuid4().hex[:12]))
    write_tiled(pts, path)
    back = spark.read.parquet(path).withColumn(
        "rid", F.monotonically_increasing_id())
    wfile = Window.partitionBy(F.input_file_name()).orderBy("rid")
    prev_c = F.lag("cell_id").over(wfile)
    prev_t = F.lag("tile_id").over(wfile)
    ok = (prev_c.isNull() | (prev_c < F.col("cell_id"))
          | ((prev_c == F.col("cell_id")) & (prev_t <= F.col("tile_id"))))
    return (back.withColumn("ok", ok)
            .groupBy(F.col("cell_prefix").cast("long").alias("cell_prefix"))
            .agg(F.count("*").alias("n"),
                 F.min("cell_id").alias("min_cell"),
                 F.max("cell_id").alias("max_cell"),
                 F.bool_and("ok").alias("zorder_ok")))


Q_WRITE_TILED_SQL = f"""
WITH pts AS ({_PTS_SQL}),
g AS (SELECT id, lon, lat,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 8) AS BIGINT), 0), 7) AS tx,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 4) AS BIGINT), 0), 3) AS ty
  FROM pts),
{_spread_sql('g', 'tx', 'ty')},
pre AS (SELECT id, lon, lat, ((2::BIGINT << 58) | morton) AS cell_prefix
        FROM s5),
gc AS (SELECT id, cell_prefix, lon, lat,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 1024) AS BIGINT), 0), 1023) AS tx,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 512) AS BIGINT), 0), 511) AS ty
  FROM pre),
{_spread_sql('gc', 'tx', 'ty').replace('s1 AS', 't1 AS').replace('s2 AS', 't2 AS')
    .replace('s3 AS', 't3 AS').replace('s4 AS', 't4 AS').replace('s5 AS', 't5 AS')
    .replace('FROM s1', 'FROM t1').replace('FROM s2', 'FROM t2')
    .replace('FROM s3', 'FROM t3').replace('FROM s4', 'FROM t4')}
SELECT cell_prefix, COUNT(*) AS n,
  MIN((9::BIGINT << 58) | morton) AS min_cell,
  MAX((9::BIGINT << 58) | morton) AS max_cell,
  TRUE AS zorder_ok
FROM t5 GROUP BY cell_prefix
"""


def q_cell_embedding_profile(spark, sf_dir):
    """Grouped-map (applyInPandas) per-cell embedding profile: count,
    mean norm, dominant-eigenvalue share via power iteration — the
    genuinely-iterative per-group computation built-ins can't express
    (SURVEY §2.10).  FULL replay-literal oracle since round 4: the
    500-vector input is built from exact-decimal arithmetic (quarter
    steps and x.5 lattice coordinates are exactly representable, so the
    JVM column expressions and the numpy replay produce bit-identical
    float64 inputs), the cell assignment replays through the
    pure-numpy cell kernel (property-tested bit-equal to the JVM
    expression), and the per-group power iteration replays through the
    SAME _profile_stats function driver-side — the grouped-map
    machinery (grouping, Arrow transport, in-group sort) is the thing
    on trial.  ``profile_ok`` (n≥1, mean_norm>0, eig-share ∈ [0,1]) is
    re-derived in SQL."""
    from .operators.similarity import cell_embedding_profile
    dim = 16
    emb = F.array(*[
        ((((F.col("vec_id") * 31 + 17 * j) % 7) * F.lit(0.25))
         + F.when((F.col("vec_id") % dim) == j,
                  F.lit(4.0)).otherwise(F.lit(0.0)))
        for j in range(dim)]).alias("embedding")
    e = spark.range(500).select(
        F.col("id").alias("vec_id"),
        (((F.col("id") * 37) % 360) - 180 + F.lit(0.5)).cast("double")
        .alias("lon"),
        (((F.col("id") * 7) % 160) - 80 + F.lit(0.5)).cast("double")
        .alias("lat"),
        emb)
    c = assign_cells(e, res=3)
    ok = ((F.col("n") >= 1) & (F.col("mean_norm") > 0)
          & (F.col("top_eig_share") >= 0)
          & (F.col("top_eig_share") <= 1.0 + 1e-9))
    return cell_embedding_profile(c) \
        .select("cell", "n", "mean_norm", "top_eig_share",
                ok.alias("profile_ok"))


def q_image_features(spark, sf_dir):
    """F23/multimodal: mapInPandas decode of opaque binary payloads with
    typed metadata (engine codecs; real-world fmts stubbed), per-channel
    stats + phash recomputation.  Input synthesized deterministically
    (BASELINE.json input_hint shape).  FULL replay-literal oracle (the
    q_image_dups pattern): the pure-python kernels recompute brightness
    (full-precision double) and the decoded-pixel phash per row
    driver-side with no Spark, and DuckDB re-derives stats_ok /
    decoded_frac from those literals — the distributed Arrow plumbing
    (batching, dtype=object null handling, schema) is the thing on
    trial.  PSNR is separately pytest-asserted."""
    from .operators.multimodal import image_features
    from .sources.datagen import generate_images
    imgs = generate_images(spark, 300, seed=7, png_every=4)
    w = Window.partitionBy(F.lit(1))
    stats_ok = F.when(F.col("decoded"),
                      (F.col("brightness") >= 0)
                      & (F.col("brightness") <= 255)).otherwise(F.lit(True))
    return image_features(imgs).select(
        "image_id", "fmt", "decoded", "brightness", "phash_check",
        stats_ok.alias("stats_ok"),
        F.round(F.avg(F.col("decoded").cast("double")).over(w), 4)
        .alias("decoded_frac"))


def q_image_dups(spark, sf_dir):
    """Near-duplicate IMAGE detection with a FULL DuckDB oracle: the
    deterministic generator plants near-dup images (1-3 perturbed pixel
    channels over a replayable base image, datagen.visual_for_id), and
    image_dup_pairs runs the banded Hamming equi-join over the 64-bit
    phash column (8 8-bit bands, pigeonhole-EXACT for hamming ≤4).
    The oracle re-derives banding + hamming refine in SQL over
    kernel-computed phash literals — the distributed candidate
    machinery is the thing on trial; the pixel kernel itself is pinned
    by pytest (phash equality, PSNR).  Only (id, phash) enter the
    self-join: payload bytes are pruned before the exchange."""
    from .operators.multimodal import image_dup_pairs
    from .sources.datagen import generate_images
    imgs = generate_images(spark, 300, seed=4242, near_dup_frac=0.15,
                           partitions=8)
    return image_dup_pairs(imgs, max_hamming=4)


def _banded_hamming_sql(sig_rows: list[tuple[str, int]],
                        max_hamming: int = 4) -> str:
    """Banding + hamming refine in DuckDB SQL over literal (id, sig64)
    ground truth (8 8-bit bands for hamming ≤4 — mirrors
    hash_dup_pairs defaults).  Arithmetic >> plus the band mask equals
    Spark's shiftrightunsigned (the mask discards sign-extension bits)
    — same trick as Q_SIMHASH_PAIRS_SQL."""
    vals = ", ".join(f"('{i}', {s}::BIGINT)" for i, s in sig_rows)
    return f"""
WITH sig(id, phash) AS (VALUES {vals}),
banded AS (SELECT id, phash, band, (phash >> (8 * band)) & 255 AS bkey
           FROM sig CROSS JOIN
                (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b),
pairs AS (SELECT DISTINCT a.id AS a_id, b2.id AS b_id,
                 a.phash AS a_sig, b2.phash AS b_sig
          FROM banded a JOIN banded b2
            ON a.band = b2.band AND a.bkey = b2.bkey
           AND a.id < b2.id)
SELECT a_id, b_id, CAST(bit_count(xor(a_sig, b_sig)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(a_sig, b_sig)) <= {max_hamming}
"""


def _image_dups_sql() -> str:
    """Oracle for q_image_dups: (image_id, phash) ground truth from the
    pure-python generator kernel (no Spark) through the shared banding
    SQL."""
    from .imaging import phash64
    from .sources.datagen import visual_for_id
    return _banded_hamming_sql(
        [(f"img_{i:012d}", phash64(visual_for_id(4242, i, 0.15)[3]))
         for i in range(300)])


Q_IMAGE_DUPS_SQL = _image_dups_sql()


def _replay_images(seed: int, n: int, png_every: int | None = None,
                   jpeg_every: int | None = None):
    """Driver-side (no Spark) replay of generate_images' per-row
    payloads — shared ground truth for the multimodal replay-literal
    oracles.  Returns (image_id, fmt, pixels, payload_bytes,
    stored_phash) per row, byte-identical to what the distributed
    generator emits (datagen._gen_rows keys the png re-container on the
    row id, so the replay needs no rng beyond visual_for_id's)."""
    from .imaging import encode_image, phash64
    from .sources.datagen import visual_for_id
    out = []
    for i in range(n):
        _w, _h, fmt, pix = visual_for_id(seed, i, 0.0)
        if png_every and i % png_every == 0:
            fmt = "png"
        if jpeg_every and i % jpeg_every == 0:   # jpeg wins an overlap
            fmt = "jpeg"
        out.append((f"img_{i:012d}", fmt, pix, encode_image(pix, fmt),
                    phash64(pix)))
    return out


def _image_features_sql() -> str:
    """Oracle for q_image_features: per-row brightness (full-precision
    double) + decoded-pixel phash replayed through the pure-python
    kernels; stats_ok / decoded_frac re-derived in SQL.  All 300 rows
    are engine codecs (bmp/raw/jpegq/png) so decoded is uniformly true
    — a Spark-side decode regression flips it and breaks the hash."""
    from .imaging import decode_image, phash64
    rows = []
    for rid, fmt, _pix, data, _ph in _replay_images(7, 300, png_every=4):
        dec = decode_image(data, fmt)
        means = dec.reshape(-1, 3).mean(axis=0)
        # string-cast, NOT a bare decimal::DOUBLE — DuckDB parses the
        # bare literal as DECIMAL and its decimal->double cast can be
        # 1 ulp off the correctly-rounded value repr() round-trips to
        rows.append(f"('{rid}', '{fmt}', CAST('{float(means.mean())!r}' "
                    f"AS DOUBLE), {phash64(dec)}::BIGINT)")
    vals = ",\n".join(rows)
    return f"""
WITH t(image_id, fmt, brightness, phash_check) AS (VALUES {vals})
SELECT image_id, fmt, true AS decoded, brightness, phash_check,
  (brightness >= 0 AND brightness <= 255) AS stats_ok,
  round(avg(1.0::DOUBLE) OVER (), 4) AS decoded_frac
FROM t
"""


def _payload_audit_sql() -> str:
    """Oracle for q_payload_audit: (stored phash, decoded-pixel phash)
    literal pairs from the replay kernels; the ok rule itself —
    decoded AND (lossy-fmt OR phash equality) — runs in SQL."""
    from .imaging import decode_image, phash64
    rows = []
    for rid, fmt, _pix, data, ph in _replay_images(7, 300, png_every=4,
                                                   jpeg_every=5):
        dec_ph = phash64(decode_image(data, fmt))
        rows.append(f"('{rid}', '{fmt}', {ph}::BIGINT, {dec_ph}::BIGINT)")
    vals = ",\n".join(rows)
    return f"""
WITH t(image_id, fmt, phash, phash_check) AS (VALUES {vals}),
o AS (SELECT image_id, fmt,
        (fmt IN ('jpegq', 'jpeg') OR phash_check = phash) AS ok
      FROM t)
SELECT image_id, fmt, ok,
  round(avg(CAST(ok AS DOUBLE)) OVER (), 4) AS ok_frac
FROM o
"""


def _image_resize_sql() -> str:
    """Oracle for q_image_resize: the resized-pixel phash per row,
    replayed decode → bilinear → phash with the same kernels (lossy
    jpegq rows resize their DECODED pixels, like the operator does);
    dims_ok / ok_frac re-derived in SQL."""
    from .imaging import decode_image, phash64
    from .operators.multimodal import _bilinear_resize
    rows = []
    for rid, fmt, _pix, data, _ph in _replay_images(7, 300):
        res = _bilinear_resize(decode_image(data, fmt), 24, 32)
        rows.append(f"('{rid}', '{fmt}', {phash64(res)}::BIGINT)")
    vals = ",\n".join(rows)
    return f"""
WITH t(image_id, fmt, phash) AS (VALUES {vals})
SELECT image_id, fmt, 32 AS w, 24 AS h, phash, true AS ok,
  true AS dims_ok,
  round(avg(1.0::DOUBLE) OVER (), 4) AS ok_frac
FROM t
"""


def _frame_sample_sql() -> str:
    """Oracle for q_frame_sample: per-sampled-frame phash literals
    recomputed from the identical rng(13) frame pool WITHOUT the rawv
    container round-trip — so the compare value-checks the demux +
    every-k sampling + phash path end-to-end; idx_ok / dims_ok /
    count_ok re-derived in SQL."""
    import numpy as np

    from .imaging import phash64
    rng = np.random.default_rng(13)
    rows = []
    for v in range(20):
        frames = rng.integers(0, 256, (6, 8, 8, 3), dtype=np.uint8)
        for idx in range(0, 6, 2):
            f = frames[idx]
            rows.append(f"('vid_{v}', {idx}, {f.shape[1]}, {f.shape[0]}, "
                        f"{phash64(f)}::BIGINT)")
    vals = ",\n".join(rows)
    return f"""
WITH t(video_id, frame_idx, w, h, phash) AS (VALUES {vals})
SELECT video_id, frame_idx, w, h, phash,
  frame_idx % 2 = 0 AS idx_ok,
  (w = 8 AND h = 8) AS dims_ok,
  COUNT(*) OVER () = 60 AS count_ok
FROM t
"""


def _cell_profile_sql() -> str:
    """Oracle for q_cell_embedding_profile: replay the exact-decimal
    vector construction in numpy, assign cells with the pure-python
    kernel (bit-equal to the JVM expr by property test), group, and run
    the SAME _profile_stats per group — full-precision doubles pinned
    as string-cast literals; profile_ok re-derived in SQL."""
    import numpy as np

    from .operators.similarity import _profile_stats
    from .spatial.cellindex import cell_from_lonlat
    n, dim = 500, 16
    ids = np.arange(n, dtype=np.int64)
    lon = (((ids * 37) % 360) - 180).astype(np.float64) + 0.5
    lat = (((ids * 7) % 160) - 80).astype(np.float64) + 0.5
    cells = cell_from_lonlat(lon, lat, 3)
    emb = np.empty((n, dim), dtype=np.float64)
    for j in range(dim):
        emb[:, j] = (((ids * 31 + 17 * j) % 7) * 0.25
                     + np.where(ids % dim == j, 4.0, 0.0))
    rows = []
    for cell in np.unique(cells):
        mat = emb[cells == cell]          # ids ascending already
        n_g, mean_norm, share = _profile_stats(mat)
        rows.append(f"({int(cell)}::BIGINT, {n_g}::BIGINT, "
                    f"CAST('{mean_norm!r}' AS DOUBLE), "
                    f"CAST('{share!r}' AS DOUBLE))")
    vals = ",\n".join(rows)
    return f"""
WITH t(cell, n, mean_norm, top_eig_share) AS (VALUES {vals})
SELECT cell, n, mean_norm, top_eig_share,
  (n >= 1 AND mean_norm > 0 AND top_eig_share >= 0
   AND top_eig_share <= 1.0 + 1e-9) AS profile_ok
FROM t
"""


# NOTE: the five replay-literal oracles above are NOT built here —
# each costs hundreds of deterministic image/audio generations plus
# encode/decode (including the zlib PNG round-trip), which importing
# contract.py for bench/tests/entry must not pay.  Their builder
# FUNCTIONS go into ORACLES and are resolved (once, cached) by
# resolve_oracles() when a caller actually needs oracle SQL.


def q_frame_dups(spark, sf_dir):
    """Cross-video frame near-dup detection — the composed multimodal
    pipeline on trial end-to-end: rawv demux + every-k frame sampling
    (mapInPandas row-explode, Python side) feeds the banded Hamming
    equi-join (JVM side) on per-frame phash.  The videos draw frames
    from a shared pool with pixel perturbations
    (datagen.videos_with_shared_frames), so sampled frames repeat
    ACROSS videos; the oracle replays the construction driver-side and
    re-derives banding in SQL — a wrong demux offset, frame index or
    phash would shift pairs and break the value hash, so this upgrades
    the previously rows-only frame-sampling surface to value-checked."""
    from .operators.dedup import hash_dup_pairs
    from .operators.multimodal import encode_rawv, sample_frames
    from .sources.datagen import videos_with_shared_frames
    vids = [(vid, encode_rawv(frames), "rawv")
            for vid, frames in videos_with_shared_frames(77)]
    df = spark.createDataFrame(
        vids, "video_id string, bytes binary, fmt string")
    frames = sample_frames(df, every_k=2).select(
        F.concat_ws("#", "video_id", F.col("frame_idx").cast("string"))
        .alias("frame_key"), "phash")
    return hash_dup_pairs(frames, "frame_key", "phash", max_hamming=4)


def _frame_dups_sql() -> str:
    """Oracle for q_frame_dups: every-2nd frame's phash replayed from
    the deterministic video builder, through the shared banding SQL."""
    from .imaging import phash64
    from .sources.datagen import videos_with_shared_frames
    rows = []
    for vid, frames in videos_with_shared_frames(77):
        for idx in range(0, frames.shape[0], 2):
            rows.append((f"{vid}#{idx}", phash64(frames[idx])))
    return _banded_hamming_sql(rows)


Q_FRAME_DUPS_SQL = _frame_dups_sql()


def q_audio_dups(spark, sf_dir):
    """Near-duplicate AUDIO detection, value-checked end-to-end: real
    RIFF/WAVE PCM16 decode (audioops.py — pure struct+numpy, no stub)
    + per-clip energy-delta fingerprint (mapInPandas) feeding the same
    banded Hamming equi-join as text SimHash and image phash.  Clips
    are deterministic sine mixtures with planted near-dups (-40 dB
    noise overlays, datagen.audio_for_id); every 7th clip is encoded
    STEREO (duplicated channel — the mono mix must fingerprint
    identically), and two mp3 rows prove the declared-stub drop path.
    The oracle replays decode+fingerprint driver-side and re-derives
    the banding in SQL."""
    from .operators.multimodal import audio_dup_pairs
    from .audioops import encode_wav
    from .sources.datagen import audio_for_id
    import numpy as np
    rows = []
    for i in range(60):
        s, sr = audio_for_id(88, i, 0.25)
        if i % 7 == 0:
            payload = encode_wav(np.stack([s, s], axis=1), sr)
        else:
            payload = encode_wav(s, sr)
        rows.append((f"aud_{i:04d}", payload, "wav"))
    rows += [("aud_stub_0", b"\x00" * 32, "mp3"),
             ("aud_stub_1", b"\x00" * 32, "mp3")]
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, fmt string")
    return audio_dup_pairs(df, max_hamming=4)


def _audio_dups_sql() -> str:
    """Oracle for q_audio_dups: decode+fingerprint replayed driver-side
    (wav roundtrip is bit-exact, and the stereo mono-mix equals the
    mono source), through the shared banding SQL."""
    from .audioops import fingerprint64
    from .sources.datagen import audio_for_id
    return _banded_hamming_sql(
        [(f"aud_{i:04d}", fingerprint64(audio_for_id(88, i, 0.25)[0]))
         for i in range(60)])


Q_AUDIO_DUPS_SQL = _audio_dups_sql()


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (corpus-shaping): per-language
    keep-rates decided by an md5 hash gate on doc_id — replayable
    across engines/reruns/layouts, zero shuffles (pure filter).  The
    oracle re-derives the identical gate in DuckDB: fixed-width
    lowercase hex compares identically as string in both engines."""
    from .operators.sampling import sample_stratified
    d = _t(spark, sf_dir, "documents")
    return sample_stratified(
        d.select("doc_id", "lang"), id_col="doc_id", strata_col="lang",
        rates={"en": 0.8, "de": 0.5}, default_rate=0.25, salt="r4")


Q_STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':r4'), 1, 8) <
  CASE lang WHEN 'de' THEN '80000000'
            WHEN 'en' THEN 'cccccccc'
            ELSE '40000000' END
"""


def q_pack_shards(spark, sf_dir):
    """Token-budget shard packing: documents laid out per-language in
    doc_id order; a document's shard is the budget-cut its START offset
    falls in (contiguous-token-stream semantics).  One window shuffle
    on the pack group; oracle is the identical SQL window."""
    from .operators.sampling import pack_shards
    d = _t(spark, sf_dir, "documents")
    return pack_shards(d.select("doc_id", "lang", "n_chars"),
                       id_col="doc_id", weight_col="n_chars",
                       budget=4096, group_col="lang")


Q_PACK_SHARDS_SQL = """
WITH c AS (
  SELECT doc_id, lang, n_chars,
    CAST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_chars AS BIGINT) AS start_offset
  FROM documents)
SELECT doc_id, lang, n_chars, start_offset,
  CAST(FLOOR(start_offset / 4096.0) AS BIGINT) AS shard_id
FROM c
"""


def q_quantile_gate(spark, sf_dir):
    """Per-group quantile calibration: each document gated against ITS
    language's exact interpolating median of n_chars (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, already parity-proven by
    q_percentiles).  One tiny aggregation broadcast back — the corpus
    itself is not reshuffled."""
    from .operators.sampling import quantile_gate
    d = _t(spark, sf_dir, "documents")
    return quantile_gate(d.select("doc_id", "lang", "n_chars"),
                         score_col="n_chars", by_col="lang", q=0.5)


Q_QUANTILE_GATE_SQL = """
WITH th AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS threshold
  FROM documents GROUP BY lang)
SELECT d.lang, d.doc_id, d.n_chars, th.threshold,
       d.n_chars >= th.threshold AS keep
FROM documents d JOIN th USING (lang)
"""


# ------------------------------------------------------------------ registry

QUERIES = {
    "q_cascade": q_cascade,
    "q_script_flags": q_script_flags,
    "q_lang_profile": q_lang_profile,
    "q_quality_tokens": q_quality_tokens,
    "q_gopher_quality": q_gopher_quality,
    "q_repetition": q_repetition,
    "q_clean_text": q_clean_text,
    "q_curate": q_curate,
    "q_curate_stream": q_curate_stream,
    "q_unaccent": q_unaccent,
    "q_abbrev_ru": q_abbrev_ru,
    "q_pip_squares": q_pip_squares,
    "q_pip_cover": q_pip_cover,
    "q_pip_hexcover": q_pip_hexcover,
    "q_knn_geo": q_knn_geo,
    "q_tile_assign": q_tile_assign,
    "q_cell_histogram": q_cell_histogram,
    "q_cell_density": q_cell_density,
    "q_exact_dedup": q_exact_dedup,
    "q_minhash": q_minhash,
    "q_levenshtein_pairs": q_levenshtein_pairs,
    "q_cosine_knn": q_cosine_knn,
    "q_agg_pricing": q_agg_pricing,
    "q_topk_orders": q_topk_orders,
    "q_dim_rollup": q_dim_rollup,
    "q_antijoin_resume": q_antijoin_resume,
    "q_window_events": q_window_events,
    "q_localize_documents": q_localize_documents,
    "q_localize_documents_fast": q_localize_documents_fast,
    "q_localize_mixed": q_localize_mixed,
    "q_simhash_pairs": q_simhash_pairs,
    "q_minhash_pairs": q_minhash_pairs,
    "q_ann_lsh": q_ann_lsh,
    "q_abbrev_de": q_abbrev_de,
    "q_abbrev_en": q_abbrev_en,
    "q_abbrev_fr": q_abbrev_fr,
    "q_country_name": q_country_name,
    "q_placename_bilingual": q_placename_bilingual,
    "q_combined_quirks": q_combined_quirks,
    "q_snapshot_compact": q_snapshot_compact,
    "q_localize_latin": q_localize_latin,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_embedding_dups": q_embedding_dups,
    "q_session_events": q_session_events,
    "q_ann_ivf": q_ann_ivf,
    "q_ann_ivf_persist": q_ann_ivf_persist,
    "q_image_features": q_image_features,
    "q_payload_audit": q_payload_audit,
    "q_write_tiled": q_write_tiled,
    "q_cell_embedding_profile": q_cell_embedding_profile,
    "q_image_resize": q_image_resize,
    "q_frame_sample": q_frame_sample,
    "q_asof_join": q_asof_join,
    "q_interval_join": q_interval_join,
    "q_merge_intervals": q_merge_intervals,
    "q_radius_join": q_radius_join,
    "q_polygon_cover": q_polygon_cover,
    "q_abbrev_uk": q_abbrev_uk,
    "q_abbrev_all": q_abbrev_all,
    "q_salted_agg": q_salted_agg,
    "q_streetname_bilingual": q_streetname_bilingual,
    "q_sql_registered": q_sql_registered,
    "q_cell_rollup": q_cell_rollup,
    "q_hexcell_histogram": q_hexcell_histogram,
    "q_hexcell_rollup": q_hexcell_rollup,
    "q_hex_ring_join": q_hex_ring_join,
    "q_percentiles": q_percentiles,
    "q_cube_revenue": q_cube_revenue,
    "q_running_window": q_running_window,
    "q_translit_cyrillic": q_translit_cyrillic,
    "q_image_dups": q_image_dups,
    "q_frame_dups": q_frame_dups,
    "q_audio_dups": q_audio_dups,
    "q_dup_components": q_dup_components,
    "q_curate_neardup": q_curate_neardup,
    "q_curate_stream_neardup": q_curate_stream_neardup,
    "q_stratified_sample": q_stratified_sample,
    "q_pack_shards": q_pack_shards,
    "q_quantile_gate": q_quantile_gate,
    "q_micro_kernels": q_micro_kernels,
}

ORACLES = {
    "q_dup_components": Q_DUP_COMPONENTS_SQL,
    "q_curate_neardup": Q_CURATE_NEARDUP_SQL,
    "q_curate_stream_neardup": Q_CURATE_NEARDUP_SQL,  # stream ≡ batch
    "q_stratified_sample": Q_STRATIFIED_SAMPLE_SQL,
    "q_pack_shards": Q_PACK_SHARDS_SQL,
    "q_quantile_gate": Q_QUANTILE_GATE_SQL,
    "q_ann_lsh": Q_ANN_LSH_SQL,
    "q_ann_ivf": Q_ANN_IVF_SQL,
    "q_ann_ivf_persist": Q_ANN_IVF_SQL,  # search ≡ ivf_topk by design
    "q_image_dups": Q_IMAGE_DUPS_SQL,
    "q_frame_dups": Q_FRAME_DUPS_SQL,
    "q_audio_dups": Q_AUDIO_DUPS_SQL,
    # callables = lazily-built replay-literal oracles (see the note at
    # the builders): resolve_oracles() turns them into SQL on demand
    "q_image_features": _image_features_sql,
    "q_payload_audit": _payload_audit_sql,
    "q_image_resize": _image_resize_sql,
    "q_frame_sample": _frame_sample_sql,
    "q_cell_embedding_profile": _cell_profile_sql,
    "q_cascade": Q_CASCADE_SQL,
    "q_script_flags": Q_SCRIPT_FLAGS_SQL,
    "q_lang_profile": Q_LANG_PROFILE_SQL,
    "q_quality_tokens": Q_QUALITY_TOKENS_SQL,
    "q_gopher_quality": Q_GOPHER_QUALITY_SQL,
    "q_repetition": Q_REPETITION_SQL,
    "q_clean_text": Q_CLEAN_TEXT_SQL,
    "q_curate": Q_CURATE_SQL,
    "q_curate_stream": Q_CURATE_SQL,
    "q_unaccent": Q_UNACCENT_SQL,
    "q_abbrev_ru": Q_ABBREV_RU_SQL,
    "q_pip_squares": Q_PIP_SQUARES_SQL,
    "q_pip_cover": Q_PIP_SQUARES_SQL,   # same semantics, different physical plan
    "q_pip_hexcover": Q_PIP_SQUARES_SQL,  # third plan: hex cover equi-join
    "q_knn_geo": Q_KNN_GEO_SQL,
    "q_tile_assign": Q_TILE_ASSIGN_SQL,
    "q_cell_histogram": Q_CELL_HISTOGRAM_SQL,
    "q_cell_density": Q_CELL_DENSITY_SQL,
    "q_exact_dedup": Q_EXACT_DEDUP_SQL,
    "q_minhash": Q_MINHASH_SQL,
    "q_levenshtein_pairs": Q_LEVENSHTEIN_SQL,
    "q_cosine_knn": Q_COSINE_KNN_SQL,
    "q_agg_pricing": Q_AGG_PRICING_SQL,
    "q_topk_orders": Q_TOPK_ORDERS_SQL,
    "q_dim_rollup": Q_DIM_ROLLUP_SQL,
    "q_antijoin_resume": Q_ANTIJOIN_SQL,
    "q_window_events": Q_WINDOW_EVENTS_SQL,
    "q_abbrev_de": Q_ABBREV_DE_SQL,
    "q_abbrev_en": Q_ABBREV_EN_SQL,
    "q_abbrev_fr": Q_ABBREV_FR_SQL,
    "q_country_name": Q_COUNTRY_NAME_SQL,
    "q_placename_bilingual": Q_PLACENAME_BILINGUAL_SQL,
    "q_combined_quirks": Q_COMBINED_QUIRKS_SQL,
    "q_snapshot_compact": Q_SNAPSHOT_COMPACT_SQL,
    "q_localize_latin": Q_LOCALIZE_LATIN_SQL,
    "q_ngram_jaccard": Q_NGRAM_JACCARD_SQL,
    "q_embedding_dups": Q_EMBEDDING_DUPS_SQL,
    "q_session_events": Q_SESSION_EVENTS_SQL,
    "q_asof_join": Q_ASOF_JOIN_SQL,
    "q_interval_join": Q_INTERVAL_JOIN_SQL,
    "q_merge_intervals": Q_MERGE_INTERVALS_SQL,
    "q_radius_join": Q_RADIUS_JOIN_SQL,
    "q_polygon_cover": Q_POLYGON_COVER_SQL,
    "q_abbrev_uk": Q_ABBREV_UK_SQL,
    "q_abbrev_all": Q_ABBREV_ALL_SQL,
    "q_salted_agg": Q_SALTED_AGG_SQL,
    "q_streetname_bilingual": Q_STREETNAME_BILINGUAL_SQL,
    "q_sql_registered": Q_SQL_REGISTERED_SQL,
    "q_cell_rollup": Q_CELL_ROLLUP_SQL,
    "q_hexcell_histogram": Q_HEXCELL_HISTOGRAM_SQL,
    "q_hexcell_rollup": _hex_rollup_sql,
    "q_hex_ring_join": Q_HEX_RING_JOIN_SQL,
    "q_minhash_pairs": Q_MINHASH_PAIRS_SQL,
    "q_simhash_pairs": Q_SIMHASH_PAIRS_SQL,
    "q_localize_mixed": Q_LOCALIZE_MIXED_SQL,
    "q_localize_documents": Q_LOCALIZE_DOCUMENTS_SQL,
    "q_localize_documents_fast": Q_LOCALIZE_DOCUMENTS_SQL,
    "q_write_tiled": Q_WRITE_TILED_SQL,
    "q_percentiles": Q_PERCENTILES_SQL,
    "q_cube_revenue": Q_CUBE_REVENUE_SQL,
    "q_running_window": Q_RUNNING_WINDOW_SQL,
    "q_translit_cyrillic": Q_TRANSLIT_CYRILLIC_SQL,
    "q_micro_kernels": _micro_kernels_sql,
}


@functools.lru_cache(maxsize=None)
def _resolve_oracle(name: str) -> str:
    v = ORACLES[name]
    return v() if callable(v) else v


def resolve_oracles() -> dict[str, str]:
    """ORACLES with every lazily-built (callable) entry resolved to its
    SQL string — cached, so repeated callers (the per-query gate tests)
    pay the replay-literal generation cost once per process instead of
    at module import."""
    return {k: _resolve_oracle(k) for k in ORACLES}


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"):
    """entry() target: documents-derived image+caption table through the
    full localization + cell/tile pipeline — stable 4-column schema
    (image_id, caption_l10n, cell_id, tile_id) for the driver smoke;
    staging shared with the oracled q_localize_documents."""
    from .engine.localize import localize
    staged = _staged_documents(spark, sf_dir)
    return localize(staged, "de").select("image_id", "caption_l10n",
                                         "cell_id", "tile_id")
