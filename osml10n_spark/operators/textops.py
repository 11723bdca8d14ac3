"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, fingerprinting.

All pure JVM expressions (regexp_count/length/md5 — codegen native, no
Python), so every one of them is DuckDB-oracle expressible.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernels.scripts import RE_CJK, RE_CYRILLIC, RE_NON_LATIN, RE_THAI
from .dedup import normalize_text

__all__ = ["add_script_flags", "lang_id", "quality_score", "token_count",
           "fingerprint"]


def add_script_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (df.withColumn("is_latin", ~c.rlike(RE_NON_LATIN))
              .withColumn("has_cjk", c.rlike(RE_CJK))
              .withColumn("has_cyrillic", c.rlike(RE_CYRILLIC))
              .withColumn("has_thai", c.rlike(RE_THAI)))


def lang_id(col):
    """Heuristic language class from script content + latin stopword
    hits — a cheap n-gram-free classifier good enough for routing."""
    c = col
    de_hits = F.regexp_count(F.lower(c), F.lit(r"\b(der|die|das|und|straße|platz)\b"))
    fr_hits = F.regexp_count(F.lower(c), F.lit(r"\b(le|la|les|rue|avenue|de la)\b"))
    en_hits = F.regexp_count(F.lower(c), F.lit(r"\b(the|street|road|of|and)\b"))
    return (F.when(c.rlike(RE_CJK), F.lit("cjk"))
            .when(c.rlike(RE_THAI), F.lit("th"))
            .when(c.rlike(RE_CYRILLIC), F.lit("cyrillic"))
            .when(c.rlike(RE_NON_LATIN), F.lit("other"))
            .when((de_hits > fr_hits) & (de_hits > en_hits), F.lit("de"))
            .when(fr_hits > en_hits, F.lit("fr"))
            .when(en_hits > 0, F.lit("en"))
            .otherwise(F.lit("latin")))


def token_count(col):
    """Whitespace tokens + a BPE-ish subword estimate (4 chars/token)."""
    norm = normalize_text(col)
    ws = F.when(F.length(norm) == 0, 0) \
        .otherwise(F.size(F.split(norm, " ")))
    bpe_ish = F.ceil(F.length(norm) / F.lit(4.0)).cast("long")
    return F.struct(ws.cast("long").alias("words"), bpe_ish.alias("subwords"))


def quality_score(col):
    """[0,1] quality heuristic: length band, alpha ratio, punct ratio,
    digit ratio — the standard pretraining-corpus filters."""
    c = col
    ln = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^\p{L}]", "")).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")).cast("double")
    digit = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    len_score = F.least(ln / F.lit(200.0), F.lit(1.0))
    alpha_ratio = F.when(ln > 0, alpha / ln).otherwise(F.lit(0.0))
    punct_pen = F.when(ln > 0, F.least(punct / ln * 4.0, F.lit(1.0))) \
        .otherwise(F.lit(0.0))
    digit_pen = F.when(ln > 0, F.least(digit / ln * 2.0, F.lit(1.0))) \
        .otherwise(F.lit(0.0))
    raw = (F.lit(0.3) * len_score + F.lit(0.5) * alpha_ratio
           + F.lit(0.2) * (F.lit(1.0) - punct_pen) * (F.lit(1.0) - digit_pen))
    # floor-based truncation (not round): bit-identical across engines
    return F.floor(raw * F.lit(1000000.0)) / F.lit(1000000.0)


def fingerprint(col):
    """Deterministic 16-hex document fingerprint of normalized text
    (md5 prefix — portable to the DuckDB oracle)."""
    return F.substring(F.md5(normalize_text(col)), 1, 16)
