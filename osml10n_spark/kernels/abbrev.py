"""Street-name abbreviation kernels (parity with street_abbrev.lua).

Semantics are replicated at the BYTE level (the reference operates on
UTF-8 byte strings with Lua patterns under the C locale):

- position guards use byte offsets (``string.find`` returns 1-based byte
  positions; we compare 0-based offsets accordingly);
- the Lua frontier pattern ``%f[%A]`` after a word means "followed by a
  non-ASCII-letter byte or end of string" → ``(?![A-Za-z])`` on bytes;
- ``%f[%a]`` before a word → ``(?<![A-Za-z])`` on bytes;
- ``[eè]`` is a *byte* set (e, 0xC3, 0xA8) so ``1ère`` does NOT match the
  French ordinal patterns — we keep that quirk;
- "replace first matching rule then stop" ladders (en suffix list,
  compass list, fr anchored list) break after the first rule that
  changed the string.

Reference: lua_osml10/osml10n/street_abbrev.lua
  de :7-55, en :59-138, fr :141-171, ru :174-185, uk :188-199,
  dispatch :202-207, compositions :209-231.
Golden corpus: lua_osml10/tests/{de,en,fr}_tests.csv.
"""
from __future__ import annotations

import re

__all__ = [
    "street_abbrev",
    "street_abbrev_latin",
    "street_abbrev_non_latin",
    "street_abbrev_all",
]

# Lua %s under the C locale (ASCII whitespace only).
_WS = rb"[ \t\n\v\f\r]"
# %f[%A]: next byte is not an ASCII letter (or end of string).
_EOW = rb"(?![A-Za-z])"
# %f[%a]: previous byte is not an ASCII letter (or start of string).
_BOW = rb"(?<![A-Za-z])"


def _p(pat: bytes) -> re.Pattern:
    return re.compile(pat)


def _u(s: str) -> bytes:
    return s.encode("utf-8")


# ---------------------------------------------------------------- German
_DE_STRASSE = [
    (_p(_u("Straße") + _WS), b"Str. "),
    (_p(_u("Straße") + rb"\Z"), b"Str."),
    (_p(_u("straße") + _WS), b"str. "),
    (_p(_u("straße") + rb"\Z"), b"str."),
]
_DE_ASSE = [
    (_p(b"Strasse" + _WS), b"Str. "),
    (_p(rb"Strasse\Z"), b"Str."),
    (_p(b"strasse" + _WS), b"str. "),
    (_p(rb"strasse\Z"), b"str."),
    (_p(b"Gasse" + _WS), b"G. "),
    (_p(rb"Gasse\Z"), b"G."),
    (_p(b"gasse" + _WS), b"g. "),
    (_p(rb"gasse\Z"), b"g."),
]
_DE_PLATZ = [
    (_p(b"Platz" + _WS), b"Pl. "),
    (_p(rb"Platz\Z"), b"Pl."),
    (_p(b"platz" + _WS), b"pl. "),
    (_p(rb"platz\Z"), b"pl."),
]
_DE_TITLES = [
    (b"Professor", [(_p(b"Professor" + _WS), b"Prof. "), (_p(b"Professor-"), b"Prof.-")]),
    (b"Doktor", [(_p(b"Doktor" + _WS), b"Dr. "), (_p(b"Doktor-"), b"Dr.-")]),
    (_u("Bürgermeister"), [(_p(_u("Bürgermeister") + _WS), b"Bgm. "),
                           (_p(_u("Bürgermeister") + b"-"), b"Bgm.-")]),
    (b"Sankt", [(_p(b"Sankt" + _WS), b"St. "), (_p(b"Sankt-"), b"St.-")]),
]


def _abbrev_de(b: bytes) -> bytes:
    # guard: 'traße' found at byte pos > 2 (1-based) → 0-based >= 2
    if b.find(_u("traße")) >= 2:
        for pat, rep in _DE_STRASSE:
            b = pat.sub(rep, b)
    if b.find(b"asse") >= 2:
        for pat, rep in _DE_ASSE:
            b = pat.sub(rep, b)
    if b.find(b"latz") >= 2:
        for pat, rep in _DE_PLATZ:
            b = pat.sub(rep, b)
    for needle, subs in _DE_TITLES:
        if b.find(needle) >= 0:
            for pat, rep in subs:
                b = pat.sub(rep, b)
    return b


# --------------------------------------------------------------- English
_EN_AVE_EXCL1 = _p(rb"\A1[e\xc3\xa8]?re Avenue" + _EOW)
_EN_AVE_EXCL2 = _p(rb"\A[0-9]+e Avenue" + _EOW)
_EN_AVENUE = _p(b"Avenue" + _EOW)
_EN_BOULEVARD = _p(b"Boulevard" + _EOW)
_EN_PARKWAY = _p(b"Parkway" + _EOW)
_EN_SUFFIX_LADDER = [
    (_p(b"Street" + _EOW), b"St."),
    (_p(b"Road" + _EOW), b"Rd."),
    (_p(b"Drive" + _EOW), b"Dr."),
    (_p(b"Lane" + _EOW), b"Ln."),
    (_p(b"Place" + _EOW), b"Pl."),
    (_p(b"Square" + _EOW), b"Sq."),
    (_p(b"Crescent" + _EOW), b"Cres."),
    (_p(b"Court" + _EOW), b"Ct."),
    (_p(b"Expressway" + _EOW), b"Expy."),
    (_p(b"Freeway" + _EOW), b"Fwy."),
    (_p(b"Trail" + _EOW), b"Trl."),
    (_p(b"Circle" + _EOW), b"Cir."),
    (_p(b"Way" + _EOW), b"Wy."),
    (_p(b"Terrace" + _EOW), b"Ter."),
    (_p(b"Highway" + _EOW), b"Hwy."),
    (_p(b"Passage" + _EOW), b"Pass."),
    (_p(b"Route" + _EOW), b"Rte."),
]
_EN_TITLES = [
    (_p(_BOW + b"Doctor" + _EOW), b"Dr."),
    (_p(_BOW + b"Junior" + _EOW), b"Jr."),
    (_p(_BOW + b"Saint" + _EOW), b"St."),
    (_p(_BOW + b"Mount" + _EOW), b"Mt."),
]
_EN_COMPASS_LADDER = [
    (_p(b"North" + _EOW), b"N"),
    (_p(b"South" + _EOW), b"S"),
    (_p(b"West" + _EOW), b"W"),
    (_p(b"East" + _EOW), b"E"),
    (_p(b"Northwest" + _EOW), b"NW"),
    (_p(b"Northeast" + _EOW), b"NE"),
    (_p(b"Southwest" + _EOW), b"SW"),
    (_p(b"Southeast" + _EOW), b"SE"),
]


def _abbrev_en(b: bytes) -> bytes:
    # Avenue: guard pos>1 (1-based) → 0-based >= 1, plus french-ordinal
    # and string-initial exclusions (street_abbrev.lua:61-72).
    if b.find(b"Avenue") >= 1:
        if (_EN_AVE_EXCL1.match(b) is None and _EN_AVE_EXCL2.match(b) is None
                and not b.startswith(b"Avenue")):
            b = _EN_AVENUE.sub(b"Ave.", b)
    if b.find(b"Boulevard") >= 1:
        b = _EN_BOULEVARD.sub(b"Blvd.", b)
    if b.find(b"Parkway") >= 1:
        b = _EN_PARKWAY.sub(b"Pkwy.", b)
    for pat, rep in _EN_SUFFIX_LADDER:          # first matching rule only
        a = pat.sub(rep, b)
        if a != b:
            b = a
            break
    for pat, rep in _EN_TITLES:                  # all rules
        b = pat.sub(rep, b)
    for pat, rep in _EN_COMPASS_LADDER:          # first matching rule only
        a = pat.sub(rep, b)
        if a != b:
            b = a
            break
    return b


# ---------------------------------------------------------------- French
_FR_ORD1 = _p(rb"\A1[e\xc3\xa8]?r?e Avenue" + _EOW)
_FR_ORDN = _p(rb"\A([0-9]+)e Avenue" + _EOW)
_FR_LADDER = [
    (_p(rb"\AAvenue" + _EOW), b"Av."),
    (_p(rb"\ABoulevard" + _EOW), b"Bd"),
    (_p(rb"\AChemin" + _EOW), b"Ch."),
    (_p(rb"\AEsplanade" + _EOW), b"Espl."),
    (_p(rb"\AImpasse" + _EOW), b"Imp."),
    (_p(rb"\APassage" + _EOW), b"Pass."),
    (_p(rb"\APromenade" + _EOW), b"Prom."),
    (_p(rb"\ARoute" + _EOW), b"Rte"),
    (_p(rb"\ARuelle" + _EOW), b"Rle"),
    (_p(rb"\ASentier" + _EOW), b"Sent."),
]


def _abbrev_fr(b: bytes) -> bytes:
    if b.find(b"Avenue") >= 1:
        b = _FR_ORD1.sub(b"1re Av.", b)
        b = _FR_ORDN.sub(rb"\1e Av.", b)
    for pat, rep in _FR_LADDER:                  # first matching rule only
        a = pat.sub(rep, b)
        if a != b:
            b = a
            break
    return b


# -------------------------------------------------------- Russian/Ukrainian
_RU_SUBS = [(_u(a), _u(r)) for a, r in [
    ("переулок", "пер."), ("тупик", "туп."), ("улица", "ул."),
    ("бульвар", "бул."), ("площадь", "пл."), ("проспект", "просп."),
    ("спуск", "сп."), ("набережная", "наб."),
]]
_UK_SUBS = [(_u(a), _u(r)) for a, r in [
    ("провулок", "пров."), ("тупик", "туп."), ("вулиця", "вул."),
    ("бульвар", "бул."), ("площа", "пл."), ("проспект", "просп."),
    ("спуск", "сп."), ("набережна", "наб."),
]]


def _abbrev_ru(b: bytes) -> bytes:
    for a, r in _RU_SUBS:
        b = b.replace(a, r)
    return b


def _abbrev_uk(b: bytes) -> bytes:
    for a, r in _UK_SUBS:
        b = b.replace(a, r)
    return b


_FUNCS = {"de": _abbrev_de, "en": _abbrev_en, "fr": _abbrev_fr,
          "ru": _abbrev_ru, "uk": _abbrev_uk}


def street_abbrev(longname: str, langcode: str | None) -> str:
    """Abbreviate for a specific language; unknown language = identity."""
    fn = _FUNCS.get(langcode)
    if fn is None:
        return longname
    return fn(longname.encode("utf-8")).decode("utf-8")


def street_abbrev_latin(longname: str) -> str:
    """en ∘ de ∘ fr composition (street_abbrev.lua:209-217)."""
    b = longname.encode("utf-8")
    return _abbrev_fr(_abbrev_de(_abbrev_en(b))).decode("utf-8")


def street_abbrev_non_latin(longname: str) -> str:
    """ru ∘ uk composition (street_abbrev.lua:219-224)."""
    b = longname.encode("utf-8")
    return _abbrev_uk(_abbrev_ru(b)).decode("utf-8")


def street_abbrev_all(longname: str) -> str:
    """latin then non-latin (street_abbrev.lua:226-231)."""
    b = longname.encode("utf-8")
    b = _abbrev_fr(_abbrev_de(_abbrev_en(b)))
    return _abbrev_uk(_abbrev_ru(b)).decode("utf-8")
