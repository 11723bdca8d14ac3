"""Arrow-batched pandas UDF wrappers over the pure kernels, plus SQL
registration mirroring the reference API surface (SURVEY.md §2.10).

Design rules:
- every UDF is vectorized over Arrow batches (no per-row Python UDFs in
  any hot path — BASELINE.json input_hint);
- heavy shared state (the boundary index / prepared covers) is built
  lazily ONCE per executor Python worker via module-level memoization —
  the executor-side analogue of the daemon's startup prepared-geometry
  cache (geo-transcript-srv.py:204-208);
- cheap predicates (script classes, target-tag probes) should be done
  JVM-side with the regexes in kernels.scripts; these UDFs are the slow
  path the JVM expressions route around.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, LongType, StringType)
from pyspark.sql.functions import pandas_udf

from .kernels import abbrev as _abbrev
from .kernels import names as _names
from .kernels import translit as _translit
from .kernels.scripts import contains_cjk, contains_thai, is_latin
from .kernels.unaccent import unaccent as _unaccent

__all__ = [
    "udf_unaccent", "udf_street_abbrev", "udf_localized_name",
    "udf_placename", "udf_streetname", "udf_country_lookup", "udf_cell_id",
    "udf_tile_id", "udf_zorder_key", "register_all",
]

# ------------------------------------------------------------------
# per-executor prepared state
_STATE: dict = {}


def _prepared():
    if "prep" not in _STATE:
        from .spatial.boundaries import load_boundaries
        from .spatial.prepared import PreparedLookup
        dirname = os.environ.get("OSML10N_BOUNDARIES",
                                 "/root/reference/osml10n/boundaries")
        idx = load_boundaries(dirname)
        _STATE["prep"] = PreparedLookup(idx, res=9)
    return _STATE["prep"]


class _BatchTranscriptor:
    """Transcriptor whose geo path resolves countries through the
    per-executor PreparedLookup (cover equi-probe + boundary refine)."""

    def geo_transcript(self, rec_id, name, place):
        if name == "":
            return ""
        try:
            if place is None:
                cc = ""
            else:
                if callable(place):
                    place = list(place())
                try:
                    lon = (place[0] + place[2]) / 2.0
                    lat = (place[1] + place[3]) / 2.0
                except (TypeError, IndexError, KeyError):
                    lon, lat = 0.0, 0.0
                cc = _translit.gate_cc(
                    name, lambda: str(_prepared().lookup([lon], [lat])[0]))
            return _translit.transcript(rec_id, cc, name)
        except Exception:
            return ""

    def country_transcript(self, rec_id, name, cc=None):
        if name == "":
            return ""
        return _translit.transcript(rec_id, cc or "", name)


_BT = _BatchTranscriptor()


# ------------------------------------------------------------------
# scalar string kernels
@pandas_udf(StringType())
def udf_unaccent(s: pd.Series) -> pd.Series:
    return s.map(lambda v: _unaccent(v) if v is not None else None)


@pandas_udf(StringType())
def udf_street_abbrev(name: pd.Series, lang: pd.Series) -> pd.Series:
    return pd.Series([
        _abbrev.street_abbrev(n, lg) if n is not None else None
        for n, lg in zip(name, lang)])


@pandas_udf(BooleanType())
def udf_is_latin(s: pd.Series) -> pd.Series:
    return s.map(lambda v: is_latin(v) if v is not None else None)


@pandas_udf(StringType())
def udf_transliterate(name: pd.Series, cc: pd.Series) -> pd.Series:
    return pd.Series([
        _translit.transcript("", c if c is not None else "", n)
        if n is not None else None
        for n, c in zip(name, cc)])


# ------------------------------------------------------------------
# cascade UDFs: tags arrives as a MapType column (dict per element)
def _row_place(lon, lat):
    if lon is None or lat is None:
        return None
    return [lon, lat, lon, lat]           # degenerate bbox → centroid = point


@pandas_udf(StringType())
def udf_localized_name(rid: pd.Series, tags: pd.Series, target: pd.Series,
                       lon: pd.Series, lat: pd.Series) -> pd.Series:
    out = []
    for r, t, tg, lo, la in zip(rid, tags, target, lon, lat):
        if t is None:
            out.append("")
            continue
        out.append(_names.get_localized_name_from_tags(
            r or "", dict(t), tg, _row_place(lo, la), _BT))
    return pd.Series(out)


@pandas_udf(StringType())
def udf_placename(rid: pd.Series, tags: pd.Series, target: pd.Series,
                  last: pd.Series, sep: pd.Series,
                  lon: pd.Series, lat: pd.Series) -> pd.Series:
    out = []
    for r, t, tg, ll, sp, lo, la in zip(rid, tags, target, last, sep, lon, lat):
        if t is None:
            out.append("")
            continue
        out.append(_names.get_placename_from_tags(
            r or "", dict(t), bool(ll), sp, tg, _row_place(lo, la), _BT))
    return pd.Series(out)


@pandas_udf(StringType())
def udf_streetname(rid: pd.Series, tags: pd.Series, target: pd.Series,
                   last: pd.Series, sep: pd.Series,
                   lon: pd.Series, lat: pd.Series) -> pd.Series:
    out = []
    for r, t, tg, ll, sp, lo, la in zip(rid, tags, target, last, sep, lon, lat):
        if t is None:
            out.append("")
            continue
        out.append(_names.get_streetname_from_tags(
            r or "", dict(t), bool(ll), sp, tg, _row_place(lo, la), _BT))
    return pd.Series(out)


@pandas_udf(ArrayType(StringType()))
def udf_country_name(tags: pd.Series, target: pd.Series,
                     append: pd.Series) -> pd.Series:
    """C5 get_country_name: official-language name array with
    byte-Levenshtein dedup (get_country_name.lua:44-84)."""
    out = []
    for t, tg, ap in zip(tags, target, append):
        if t is None or t.get("ISO3166-1:alpha2") is None:
            out.append([])
            continue
        out.append(_names.get_country_name(dict(t), tg or "en", bool(ap)))
    return pd.Series(out)


# ------------------------------------------------------------------
# spatial UDFs (vectorized numpy inside)
@pandas_udf(StringType())
def udf_country_lookup(lon: pd.Series, lat: pd.Series) -> pd.Series:
    res = _prepared().lookup(lon.to_numpy(dtype=np.float64),
                             lat.to_numpy(dtype=np.float64))
    return pd.Series(res, dtype=object)


@pandas_udf(StringType())
def udf_country_gated(name: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
    """The daemon XY gate, batch-wise: PiP only for CJK rows, Thai
    charset short-circuits, everything else '' — the filter-before-join
    optimization (geo-transcript-srv.py:268-275)."""
    vals = name.tolist()
    out = np.full(len(vals), "", dtype=object)
    cjk_rows = [i for i, v in enumerate(vals) if v is not None and contains_cjk(v)]
    cjk_set = set(cjk_rows)
    if cjk_rows:
        sel = np.asarray(cjk_rows)
        res = _prepared().lookup(lon.to_numpy(dtype=np.float64)[sel],
                                 lat.to_numpy(dtype=np.float64)[sel])
        out[sel] = res
    for i, v in enumerate(vals):
        if i not in cjk_set and v is not None and contains_thai(v):
            out[i] = "th"
    return pd.Series(out, dtype=object)


def _make_cell_udf(res: int):
    from .spatial.cellindex import cell_from_lonlat

    @pandas_udf(LongType())
    def _u(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(cell_from_lonlat(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64), res))
    return _u


def udf_cell_id(lon, lat, res: int = 9):
    return _make_cell_udf(res)(lon, lat)


def udf_zorder_key(lon, lat, z: int = 16):
    from .spatial.cellindex import zorder_key

    @pandas_udf(LongType())
    def _u(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(zorder_key(lo.to_numpy(dtype=np.float64),
                                    la.to_numpy(dtype=np.float64), z))
    return _u(lon, lat)


def udf_tile_id(lon, lat, z: int = 8, maxz: int = 16):
    from .spatial.cellindex import tile_from_lonlat

    @pandas_udf(LongType())
    def _u(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(tile_from_lonlat(lo.to_numpy(dtype=np.float64),
                                          la.to_numpy(dtype=np.float64), z, maxz))
    return _u(lon, lat)


# ------------------------------------------------------------------
def register_all(spark) -> None:
    """Expose the reference-shaped API to spark.sql (SURVEY.md §2.10)."""
    spark.udf.register("osml10n_unaccent", udf_unaccent)
    spark.udf.register("osml10n_street_abbrev", udf_street_abbrev)
    spark.udf.register("osml10n_is_latin", udf_is_latin)
    spark.udf.register("osml10n_translit", udf_transliterate)
    spark.udf.register("osml10n_cc", udf_country_lookup)
    spark.udf.register("osml10n_country_name", udf_country_name)
    spark.udf.register("osml10n_localized_name", udf_localized_name)
    spark.udf.register("osml10n_placename", udf_placename)
    spark.udf.register("osml10n_streetname", udf_streetname)
